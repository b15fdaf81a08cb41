// Readout of the scanned 1D prefix products on GPU.
//
// Given the inclusive prefix products P_1..P_L of the per-position
// transfer matrices (prefixscan1d.wgsl output), compute per position
// the closed-start-vector contraction
//
//   out[p, d] = (+)_s start[s] + P_{p+1}[s, d]
//
// so out[p, S-1] is the log-likelihood of the length-(p+1) prefix —
// the readback that js/gpu/dp1d-gpu.mjs previously finished on the
// host, now one dispatch with one thread per (p, d).
//
// Reference capability: ref js/webgpu/shaders/extract.wgsl.

struct Params {
  s : u32,     // states S
  l : u32,     // positions
  mode : u32,  // 0 = logsumexp, 1 = maxplus
  pad0 : u32,
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> prods : array<f32>;
@group(0) @binding(2) var<storage, read> start : array<f32>;
@group(0) @binding(3) var<storage, read_write> out : array<f32>;

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
  let idx = gid.x;
  if (idx >= params.l * S) { return; }
  let p = idx / S;
  let d = idx % S;
  var acc : f32 = NEG_INF;
  for (var s = 0u; s < S; s = s + 1u) {
    acc = combine(acc, start[s] + prods[(p * S + s) * S + d]);
  }
  out[idx] = acc;
}
