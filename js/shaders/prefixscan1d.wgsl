// Hillis-Steele inclusive prefix "product" of per-position (S, S)
// transfer matrices in the log semiring — the 1D O(log L) depth path
// (the WebGPU analog of lax.associative_scan in
// machineboss_tpu/ops/dp1d.forward_1d_assoc).
//
// One dispatch per scan level; thread t computes matrix t of the next
// level: out[t] = in[t - stride] (x) in[t] when t >= stride, else a copy.
// Each workgroup handles one (dst-row, matrix) pair; threads loop dst
// columns.
//
// Reference capability: ref js/webgpu/shaders/prefix-scan.wgsl.

struct Params {
  s : u32,       // states S
  l : u32,       // number of matrices (positions)
  stride : u32,  // current Hillis-Steele stride
  mode : u32,    // 0 = logsumexp, 1 = maxplus
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> src : array<f32>;
@group(0) @binding(2) var<storage, read_write> dst : array<f32>;

const NEG_INF : f32 = -3.0e38;

fn lse(a : f32, b : f32) -> f32 {
  if (a <= NEG_INF) { return b; }
  if (b <= NEG_INF) { return a; }
  let m = max(a, b);
  return m + log(exp(a - m) + exp(b - m));
}

fn combine(a : f32, b : f32) -> f32 {
  if (params.mode == 1u) { return max(a, b); }
  return lse(a, b);
}

@compute @workgroup_size(64)
fn main(@builtin(global_invocation_id) gid : vec3<u32>) {
  let S = params.s;
  let row = gid.x % S;            // source row of the product
  let p = gid.x / S;              // matrix index
  if (p >= params.l) { return; }
  let base = p * S * S;
  if (p < params.stride) {
    for (var c = 0u; c < S; c = c + 1u) {
      dst[base + row * S + c] = src[base + row * S + c];
    }
    return;
  }
  let prevBase = (p - params.stride) * S * S;
  for (var c = 0u; c < S; c = c + 1u) {
    var acc : f32 = NEG_INF;
    for (var k = 0u; k < S; k = k + 1u) {
      acc = combine(acc, src[prevBase + row * S + k] + src[base + k * S + c]);
    }
    dst[base + row * S + c] = acc;
  }
}
