// Anti-diagonal wavefront 2D DP step (one dispatch per diagonal).
//
// One workgroup per lattice cell on diagonal d = i + o; thread s of the
// workgroup computes the class-accumulated pre-value for state s into
// workgroup memory, then after a barrier applies the silent closure
// column for state s. The lattice holds POST-CLOSURE values, matching
// the machineboss-tpu lowering contract (js/cpu/dp2d.mjs and the
// Pallas wavefront kernel). Reduction mode is selected by params.mode:
// 0 = logsumexp (Forward), 1 = max (Viterbi).
//
// Reference capability: ref js/webgpu/shaders/wavefront-forward.wgsl.

struct Params {
  s : u32,      // number of states S (= workgroup size)
  nIn : u32,    // input tokens incl. epsilon
  nOut : u32,   // output tokens incl. epsilon
  li : u32,     // input length
  lo : u32,     // output length
  d : u32,      // current anti-diagonal (1..li+lo)
  iLoBase : u32,// first i on this diagonal
  mode : u32,   // 0 = logsumexp, 1 = maxplus
};

@group(0) @binding(0) var<uniform> params : Params;
@group(0) @binding(1) var<storage, read> logTrans : array<f32>;
@group(0) @binding(2) var<storage, read> closure : array<f32>;
@group(0) @binding(3) var<storage, read> xToks : array<u32>;
@group(0) @binding(4) var<storage, read> yToks : array<u32>;
@group(0) @binding(5) var<storage, read_write> lattice : array<f32>;

const NEG_INF : f32 = -3.0e38;
const MAX_STATES : u32 = 256u;

var<workgroup> pre : array<f32, MAX_STATES>;

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

fn transAt(inTok : u32, outTok : u32, src : u32, dst : u32) -> f32 {
  let s = params.s;
  return logTrans[((inTok * params.nOut + outTok) * s + src) * s + dst];
}

fn cellBase(i : u32, o : u32) -> u32 {
  return (i * (params.lo + 1u) + o) * params.s;
}

@compute @workgroup_size(64)
fn main(@builtin(workgroup_id) wid : vec3<u32>,
        @builtin(local_invocation_id) lid : vec3<u32>) {
  let s = lid.x;
  let S = params.s;
  let i = params.iLoBase + wid.x;
  let o = params.d - i;
  if (i > params.li || o > params.lo) { return; }

  // phase 1: class-accumulated pre-closure value for state s
  var acc : f32 = NEG_INF;
  if (s < S) {
    if (o >= 1u) {
      let yTok = yToks[o - 1u];
      let src = cellBase(i, o - 1u);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, lattice[src + u] + transAt(0u, yTok, u, s));
      }
    }
    if (i >= 1u) {
      let xTok = xToks[i - 1u];
      let src = cellBase(i - 1u, o);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, lattice[src + u] + transAt(xTok, 0u, u, s));
      }
    }
    if (i >= 1u && o >= 1u) {
      let xTok = xToks[i - 1u];
      let yTok = yToks[o - 1u];
      let src = cellBase(i - 1u, o - 1u);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, lattice[src + u] + transAt(xTok, yTok, u, s));
      }
    }
    pre[s] = acc;
  }
  workgroupBarrier();

  // phase 2: silent-closure column for state s
  if (s < S) {
    var post : f32 = NEG_INF;
    for (var u = 0u; u < S; u = u + 1u) {
      post = combine(post, pre[u] + closure[u * S + s]);
    }
    lattice[cellBase(i, o) + s] = post;
  }
}
