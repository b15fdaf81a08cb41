// Forward-Backward visiting-state posteriors, elementwise on GPU.
//
// posterior[idx] = exp(fwd[idx] + bwd[idx] - logLikelihood) for every
// (cell, state) element of the two lattices filled by
// wavefront2d.wgsl / wavefront2d-backward.wgsl — the split-at-visit
// semantics of js/cpu/dp2d.mjs posteriors2D (forward values are
// post-closure, backward values include the leading closure, so each
// path is counted exactly once per visited state).
//
// Reference capability: ref js/webgpu/shaders/posteriors.wgsl.

struct Params {
  n : u32,           // number of lattice elements
  logLike : f32,     // forward log-likelihood (normalizer)
  pad0 : u32,
  pad1 : u32,
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> fwd : array<f32>;
@group(0) @binding(2) var<storage, read> bwd : array<f32>;
@group(0) @binding(3) var<storage, read_write> post : array<f32>;

const NEG_INF : f32 = -3.0e38;

@compute @workgroup_size(64)
fn main(@builtin(global_invocation_id) gid : vec3<u32>) {
  let idx = gid.x;
  if (idx >= params.n) { return; }
  let f = fwd[idx];
  let b = bwd[idx];
  if (f <= NEG_INF / 2.0 || b <= NEG_INF / 2.0
      || params.logLike <= NEG_INF / 2.0) {
    post[idx] = 0.0;
    return;
  }
  post[idx] = exp(f + b - params.logLike);
}
