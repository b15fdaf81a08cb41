/**
 * Log-semiring scalar math for the machineboss-tpu JS runtime.
 *
 * Mirrors the semantics of machineboss_tpu/ops/semiring.py (LOGSUMEXP /
 * MAXPLUS) for the browser/Node CPU path. Reference capability:
 * ref js/webgpu/internal/logmath.mjs.
 */

export const NEG_INF = -Infinity;

/** log(exp(a) + exp(b)), stable. */
export function logaddexp(a, b) {
  if (a === NEG_INF) return b;
  if (b === NEG_INF) return a;
  const m = a > b ? a : b;
  return m + Math.log1p(Math.exp(-(a > b ? a - b : b - a)));
}

/** Reduce a Float64Array (or slice of one) with logaddexp. */
export function logsum(arr, start = 0, end = -1) {
  const e = end < 0 ? arr.length : end;
  let m = NEG_INF;
  for (let i = start; i < e; i++) if (arr[i] > m) m = arr[i];
  if (m === NEG_INF || m === Infinity) return m;
  let s = 0.0;
  for (let i = start; i < e; i++) s += Math.exp(arr[i] - m);
  return m + Math.log(s);
}

/** Reduce with max. */
export function maxval(arr, start = 0, end = -1) {
  const e = end < 0 ? arr.length : end;
  let m = NEG_INF;
  for (let i = start; i < e; i++) if (arr[i] > m) m = arr[i];
  return m;
}

/**
 * Semiring handles: plus combines two path weights from alternative
 * paths, reduce folds an array. Matches ops/semiring.py's LOGSUMEXP and
 * MAXPLUS pair.
 */
export function makeSemiring(name) {
  if (name === 'maxplus' || name === 'viterbi') {
    return {
      name: 'maxplus',
      plus: (a, b) => (a > b ? a : b),
      reduce: maxval,
    };
  }
  if (name === 'logsumexp' || name === 'forward' || name === undefined) {
    return { name: 'logsumexp', plus: logaddexp, reduce: logsum };
  }
  throw new Error(`Unknown semiring "${name}"`);
}

/**
 * Log-semiring (S, S) matrix-vector product: out[d] = R_s(v[s] + m[s*S+d]).
 * m is row-major [src][dst].
 */
export function vecMat(v, m, S, reduce) {
  const out = new Float64Array(S).fill(NEG_INF);
  const tmp = new Float64Array(S);
  for (let d = 0; d < S; d++) {
    for (let s = 0; s < S; s++) tmp[s] = v[s] + m[s * S + d];
    out[d] = reduce(tmp);
  }
  return out;
}

/** Log-semiring matrix-vector on the other side: out[s] = R_d(m[s][d] + v[d]). */
export function matVec(m, v, S, reduce) {
  const out = new Float64Array(S).fill(NEG_INF);
  const tmp = new Float64Array(S);
  for (let s = 0; s < S; s++) {
    for (let d = 0; d < S; d++) tmp[d] = m[s * S + d] + v[d];
    out[s] = reduce(tmp);
  }
  return out;
}
