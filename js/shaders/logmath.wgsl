// Shared log-semiring helpers, prepended to every machineboss shader by
// gpu/pipeline.mjs (plain WGSL has no includes; the reference ships the
// same shared block as js/webgpu/shaders/logmath.wgsl).
//
// Semiring contract matches the CPU runtime (js/internal/logmath.mjs):
// NEG_INF is a finite stand-in for log(0) so f32 arithmetic never
// produces NaN from inf - inf; values at or below NEG_INF/2 are treated
// as log-zero by consumers.

const NEG_INF : f32 = -3.0e38;

fn lse(a : f32, b : f32) -> f32 {
  if (a <= NEG_INF) { return b; }
  if (b <= NEG_INF) { return a; }
  let m = max(a, b);
  return m + log(exp(a - m) + exp(b - m));
}

fn maxplus(a : f32, b : f32) -> f32 {
  return max(a, b);
}

// mode: 0 = logsumexp (Forward/Backward), 1 = maxplus (Viterbi)
fn combineMode(mode : u32, a : f32, b : f32) -> f32 {
  if (mode == 1u) { return max(a, b); }
  return lse(a, b);
}
