// Anti-diagonal BACKWARD wavefront 2D DP step (one dispatch per diagonal,
// diagonals descending from Li+Lo to 0).
//
// Mirror image of wavefront2d.wgsl: one workgroup per cell (i, o) on
// diagonal d = i + o; thread s accumulates the pre-closure value
// pre[s] = (+)_d' trans[s -> d'] + lat[successor cell, d'] over the
// up/left/diag successor classes, then after a barrier applies the
// silent closure ROW for state s (cur[s] = (+)_m closure[s, m] + pre[m],
// the left-closure of the backward recurrence — js/cpu/dp2d.mjs
// fillBackward2D). The terminal cell (Li, Lo) seeds the end state.
//
// Reference capability: ref js/webgpu/shaders/wavefront-backward.wgsl.

struct Params {
  s : u32,      // number of states S (= workgroup size)
  nIn : u32,    // input tokens incl. epsilon
  nOut : u32,   // output tokens incl. epsilon
  li : u32,     // input length
  lo : u32,     // output length
  d : u32,      // current anti-diagonal (0..li+lo), descending
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

  // phase 1: successor-accumulated pre-closure value for state s
  var acc : f32 = NEG_INF;
  if (s < S) {
    if (i == params.li && o == params.lo && s == S - 1u) {
      acc = 0.0;  // stop at the end state
    }
    if (o < params.lo) {
      let yTok = yToks[o];
      let nxt = cellBase(i, o + 1u);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, transAt(0u, yTok, s, u) + lattice[nxt + u]);
      }
    }
    if (i < params.li) {
      let xTok = xToks[i];
      let nxt = cellBase(i + 1u, o);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, transAt(xTok, 0u, s, u) + lattice[nxt + u]);
      }
    }
    if (i < params.li && o < params.lo) {
      let xTok = xToks[i];
      let yTok = yToks[o];
      let nxt = cellBase(i + 1u, o + 1u);
      for (var u = 0u; u < S; u = u + 1u) {
        acc = combine(acc, transAt(xTok, yTok, s, u) + lattice[nxt + u]);
      }
    }
    pre[s] = acc;
  }
  workgroupBarrier();

  // phase 2: silent-closure ROW for state s (left closure)
  if (s < S) {
    var post : f32 = NEG_INF;
    for (var u = 0u; u < S; u = u + 1u) {
      post = combine(post, closure[s * S + u] + pre[u]);
    }
    lattice[cellBase(i, o) + s] = post;
  }
}
