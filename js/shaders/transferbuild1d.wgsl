// Build per-position 1D transfer matrices on GPU, feeding the
// Hillis-Steele prefix scan (prefixscan1d.wgsl).
//
// M_p = step(tok_p) (x) closure  in the log semiring: the emitting step
// for position p's token with the silent closure folded on the right —
// the same fold js/gpu/dp1d-gpu.mjs previously did on the host
// (transferMatrices) and the 1D lowering contract of
// machineboss_tpu/ops/lowering.emit_matrices_1d.
//
// One thread per (p, s, d) output element; the inner contraction runs
// over the S intermediate states.
//
// Reference capability: ref js/webgpu/shaders/transfer-build.wgsl.

struct Params {
  s : u32,       // states S
  nIn : u32,     // input tokens incl. epsilon
  nOut : u32,    // output tokens incl. epsilon
  l : u32,       // positions
  isInput : u32, // 1 = tokens are inputs, 0 = outputs
  mode : u32,    // 0 = logsumexp, 1 = maxplus
  revT : u32,    // 1 = REVERSED + TRANSPOSED matrices: scan slot p holds
                 // M_{L-1-p}^T, so the forward prefix scan of these
                 // yields the suffix products the Backward pass needs
                 // (gpu/dp1d-gpu.mjs backward1DGPU)
  pad1 : u32,
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> logTrans : array<f32>;
@group(0) @binding(2) var<storage, read> closure : array<f32>;
@group(0) @binding(3) var<storage, read> toks : array<u32>;
@group(0) @binding(4) var<storage, read_write> mats : array<f32>;

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

fn stepAt(tok : u32, src : u32, dst : u32) -> f32 {
  let s = params.s;
  if (params.isInput == 1u) {
    return logTrans[((tok * params.nOut + 0u) * s + src) * s + dst];
  }
  return logTrans[((0u * params.nOut + tok) * s + src) * s + dst];
}

@compute @workgroup_size(64)
fn main(@builtin(global_invocation_id) gid : vec3<u32>) {
  let S = params.s;
  let idx = gid.x;
  if (idx >= params.l * S * S) { return; }
  let p = idx / (S * S);
  let s = (idx / S) % S;
  let d = idx % S;
  let pSrc = select(p, params.l - 1u - p, params.revT == 1u);
  let tok = toks[pSrc];
  var acc : f32 = NEG_INF;
  if (params.revT == 1u) {
    // transposed entry: mats[p][s][d] = M_{pSrc}[d][s]
    for (var k = 0u; k < S; k = k + 1u) {
      acc = combine(acc, stepAt(tok, d, k) + closure[k * S + s]);
    }
  } else {
    for (var k = 0u; k < S; k = k + 1u) {
      acc = combine(acc, stepAt(tok, s, k) + closure[k * S + d]);
    }
  }
  mats[idx] = acc;
}
