// Build per-position 1D transfer matrices from a PSWM PROFILE on GPU.
//
// Profile variant of transferbuild1d.wgsl: instead of a hard token per
// position, each position carries a log-probability row over the
// alphabet (column 0 = epsilon mass is excluded — profile positions
// always consume/emit), and the emitting step marginalizes over tokens
// BEFORE the closure fold:
//
//   step_p[s, k] = (+)_t ( profile[p, t] + trans[t][s, k] )
//   M_p          = step_p (x) closure
//
// matching js/cpu/dp1d.mjs fillLattice1DProfile's per-position emission
// marginalization and the PSWM lowering of ops/pswm.py.
//
// Reference capability: ref js/webgpu/shaders/transfer-build-profile.wgsl.

struct Params {
  s : u32,       // states S
  nIn : u32,     // input tokens incl. epsilon
  nOut : u32,    // output tokens incl. epsilon
  l : u32,       // positions
  isInput : u32, // 1 = profile over inputs, 0 = over outputs
  mode : u32,    // 0 = logsumexp, 1 = maxplus
  nTok : u32,    // profile row width (tokens incl. epsilon column)
  revT : u32,    // 1 = reversed + transposed (backward suffix scan;
                 // see transferbuild1d.wgsl)
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> logTrans : array<f32>;
@group(0) @binding(2) var<storage, read> closure : array<f32>;
@group(0) @binding(3) var<storage, read> profile : array<f32>;
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
  let sEff = select(s, d, params.revT == 1u);
  let dEff = select(d, s, params.revT == 1u);
  var acc : f32 = NEG_INF;
  for (var k = 0u; k < S; k = k + 1u) {
    // marginalize the emission over profile tokens (1-based; 0 = eps)
    var st : f32 = NEG_INF;
    for (var t = 1u; t < params.nTok; t = t + 1u) {
      let lp = profile[pSrc * params.nTok + t];
      if (lp > NEG_INF / 2.0) {
        st = combine(st, lp + stepAt(t, sEff, k));
      }
    }
    acc = combine(acc, st + closure[k * S + dEff]);
  }
  mats[idx] = acc;
}
