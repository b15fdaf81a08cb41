// generated wavefront Forward shader
struct Dims { lx: u32, ly: u32, d: u32, pad: u32 };
@group(0) @binding(0) var<uniform> dims: Dims;
@group(0) @binding(1) var<storage, read> logTrans: array<f32>; // [nIn][nOut][S][S]
@group(0) @binding(2) var<storage, read> xs: array<u32>;
@group(0) @binding(3) var<storage, read> ys: array<u32>;
@group(0) @binding(4) var<storage, read_write> cells: array<f32>; // [(lx+1)*(ly+1)*S]

const S: u32 = 1u;
const N_IN: u32 = 3u;
const N_OUT: u32 = 3u;
const NEG_INF: f32 = -3.0e38;

fn lse(a: f32, b: f32) -> f32 {
  if (a <= NEG_INF * 0.5) { return b; }
  if (b <= NEG_INF * 0.5) { return a; }
  let mx = max(a, b);
  return mx + log(1.0 + exp(-abs(a - b)));
}

fn lt(i: u32, o: u32, s: u32, d: u32) -> f32 {
  return logTrans[((i * N_OUT + o) * S + s) * S + d];
}

fn cellIdx(ix: u32, iy: u32, s: u32) -> u32 {
  return (iy * (dims.lx + 1u) + ix) * S + s;
}

@compute @workgroup_size(64)
fn forwardDiagonal(@builtin(global_invocation_id) gid: vec3<u32>) {
  let k = gid.x;            // index along the anti-diagonal
  let d = dims.d;           // current diagonal
  let ix = k;
  if (ix > dims.lx || ix > d) { return; }
  let iy = d - ix;
  if (iy > dims.ly) { return; }
  let xt = select(0u, xs[ix - 1u] , ix > 0u);
  let yt = select(0u, ys[iy - 1u] , iy > 0u);
  for (var s2: u32 = 0u; s2 < S; s2 = s2 + 1u) {
    var acc = NEG_INF;
    if (ix == 0u && iy == 0u && s2 == 0u) { acc = 0.0; }
    for (var s: u32 = 0u; s < S; s = s + 1u) {
      if (ix > 0u && iy > 0u) {
        acc = lse(acc, cells[cellIdx(ix - 1u, iy - 1u, s)] + lt(xt, yt, s, s2));
      }
      if (ix > 0u) {
        acc = lse(acc, cells[cellIdx(ix - 1u, iy, s)] + lt(xt, 0u, s, s2));
      }
      if (iy > 0u) {
        acc = lse(acc, cells[cellIdx(ix, iy - 1u, s)] + lt(0u, yt, s, s2));
      }
    }
    // silent transitions resolved in ascending state order within the cell
    for (var s: u32 = 0u; s < s2; s = s + 1u) {
      acc = lse(acc, cells[cellIdx(ix, iy, s)] + lt(0u, 0u, s, s2));
    }
    cells[cellIdx(ix, iy, s2)] = acc;
  }
}
