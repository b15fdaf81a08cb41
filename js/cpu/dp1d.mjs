/**
 * 1D DP on a prepared machine — CPU path.
 *
 * For generators (input = null: scan over output tokens) and recognizers
 * (output = null: scan over input tokens). Also PSWM "profile" variants
 * where each position carries a log-weight per alphabet symbol instead of
 * a hard token (the reference's PSWMSeq / forwardProfile capability,
 * ref js/webgpu/cpu/forward-1d-profile.mjs; TPU analog ops/pswm.py).
 *
 * Same post-closure cell contract as cpu/dp2d.mjs.
 */

import { NEG_INF, makeSemiring, vecMat, matVec } from '../internal/logmath.mjs';
import { transMatrix } from '../internal/prep.mjs';

function axis(machine, inputTokens, outputTokens) {
  if (inputTokens === null || inputTokens === undefined) {
    return { seq: outputTokens, isInput: false, nTok: machine.nOutputTokens };
  }
  if (outputTokens === null || outputTokens === undefined) {
    return { seq: inputTokens, isInput: true, nTok: machine.nInputTokens };
  }
  throw new Error('1D DP needs exactly one of inputTokens/outputTokens to be null');
}

function stepMatrix(machine, isInput, tok) {
  return isInput ? transMatrix(machine, tok, 0) : transMatrix(machine, 0, tok);
}

function pickClosure(machine, semiring) {
  return semiring.name === 'maxplus' ? machine.closureMax : machine.closure;
}

/** Full post-closure 1D lattice: Float64Array((L+1)*S). */
export function fillLattice1D(machine, inputTokens, outputTokens, semiringType) {
  const semiring = makeSemiring(semiringType);
  const { reduce } = semiring;
  const S = machine.nStates;
  const closure = pickClosure(machine, semiring);
  const { seq, isInput } = axis(machine, inputTokens, outputTokens);
  const L = seq.length;
  const lat = new Float64Array((L + 1) * S).fill(NEG_INF);
  for (let s = 0; s < S; s++) lat[s] = closure[s];
  const tmp = new Float64Array(S);
  for (let p = 1; p <= L; p++) {
    const m = stepMatrix(machine, isInput, seq[p - 1]);
    const src = (p - 1) * S;
    const pre = new Float64Array(S).fill(NEG_INF);
    for (let d = 0; d < S; d++) {
      for (let s = 0; s < S; s++) tmp[s] = lat[src + s] + m[s * S + d];
      pre[d] = reduce(tmp);
    }
    const cur = vecMat(pre, closure, S, reduce);
    for (let s = 0; s < S; s++) lat[p * S + s] = cur[s];
  }
  return lat;
}

export function forward1D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const lat = fillLattice1D(machine, inputTokens, outputTokens, 'logsumexp');
  return lat[lat.length - S + (S - 1)];
}

/** Backward 1D lattice (incl. leading silent closure; b[0][0] = LL). */
export function fillBackward1D(machine, inputTokens, outputTokens, semiringType) {
  const semiring = makeSemiring(semiringType);
  const { reduce } = semiring;
  const S = machine.nStates;
  const closure = pickClosure(machine, semiring);
  const { seq, isInput } = axis(machine, inputTokens, outputTokens);
  const L = seq.length;
  const lat = new Float64Array((L + 1) * S).fill(NEG_INF);
  const tmp = new Float64Array(S);
  for (let p = L; p >= 0; p--) {
    const post = new Float64Array(S).fill(NEG_INF);
    if (p === L) {
      post[S - 1] = 0.0;
    } else {
      const m = stepMatrix(machine, isInput, seq[p]);
      const nxt = (p + 1) * S;
      for (let s = 0; s < S; s++) {
        for (let d = 0; d < S; d++) tmp[d] = m[s * S + d] + lat[nxt + d];
        post[s] = reduce(tmp);
      }
    }
    const cur = matVec(closure, post, S, reduce);
    for (let s = 0; s < S; s++) lat[p * S + s] = cur[s];
  }
  return lat;
}

export function backward1D(machine, inputTokens, outputTokens) {
  const lat = fillBackward1D(machine, inputTokens, outputTokens, 'logsumexp');
  return lat[0];
}

/** Visiting-state posteriors over the (L+1) x S lattice. */
export function posteriors1D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const fwd = fillLattice1D(machine, inputTokens, outputTokens, 'logsumexp');
  const bwd = fillBackward1D(machine, inputTokens, outputTokens, 'logsumexp');
  const logLikelihood = fwd[fwd.length - S + (S - 1)];
  const posteriors = new Float64Array(fwd.length);
  if (logLikelihood === NEG_INF) return { logLikelihood, posteriors };
  for (let idx = 0; idx < fwd.length; idx++) {
    const lp = fwd[idx] + bwd[idx] - logLikelihood;
    posteriors[idx] = lp === NEG_INF ? 0.0 : Math.exp(lp);
  }
  return { logLikelihood, posteriors };
}

const TRACE_TOL = 1e-9;

function closeEnough(a, b) {
  if (a === NEG_INF || b === NEG_INF) return a === b;
  const diff = Math.abs(a - b);
  return diff <= TRACE_TOL + TRACE_TOL * Math.max(Math.abs(a), Math.abs(b));
}

/** Viterbi score + path for a 1D sequence. */
export function viterbi1D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const { seq, isInput } = axis(machine, inputTokens, outputTokens);
  const L = seq.length;
  const lat = fillLattice1D(machine, inputTokens, outputTokens, 'maxplus');
  const score = lat[L * S + (S - 1)];
  if (score === NEG_INF) return { score, path: [] };
  const closure = machine.closureMax;
  const silent = machine.silent;
  const steps = [];
  let p = L;
  let s = S - 1;
  let guard = (L + 1) * (S + 1) * 4 + 16;
  while (guard-- > 0) {
    const val = lat[p * S + s];
    if (p === 0) {
      if (s === 0) break;
      let moved = false;
      for (let t = 0; t < S && !moved; t++) {
        if (t === s || silent[t * S + s] === NEG_INF) continue;
        if (closeEnough(closure[t] + silent[t * S + s], val)) {
          steps.push({ from: t, to: s, inTok: 0, outTok: 0 });
          s = t;
          moved = true;
        }
      }
      if (!moved) throw new Error(`viterbi1D: start traceback stuck at ${s}`);
      continue;
    }
    let matched = false;
    const m = stepMatrix(machine, isInput, seq[p - 1]);
    const src = (p - 1) * S;
    for (let u = 0; u < S && !matched; u++) {
      if (m[u * S + s] === NEG_INF) continue;
      if (closeEnough(lat[src + u] + m[u * S + s], val)) {
        steps.push({
          from: u, to: s,
          inTok: isInput ? seq[p - 1] : 0,
          outTok: isInput ? 0 : seq[p - 1],
        });
        p -= 1;
        s = u;
        matched = true;
      }
    }
    if (!matched) {
      for (let t = 0; t < S && !matched; t++) {
        if (silent[t * S + s] === NEG_INF) continue;
        if (closeEnough(lat[p * S + t] + silent[t * S + s], val)) {
          steps.push({ from: t, to: s, inTok: 0, outTok: 0 });
          s = t;
          matched = true;
        }
      }
    }
    if (!matched) throw new Error(`viterbi1D: traceback stuck at p=${p} state ${s}`);
  }
  if (guard <= 0) throw new Error('viterbi1D: traceback did not terminate');
  steps.reverse();
  return { score, path: steps };
}

/**
 * Per-position profile step matrix: mixes the token transition matrices
 * by the profile's log-weights. logsumexp mixes path weights; maxplus
 * takes the best symbol (the semiring-consistent mixture, matching
 * ops/pswm.py's semiring-aware token mixtures).
 */
function profileStepMatrix(machine, isInput, profile, p, nAlpha, semiring) {
  const S = machine.nStates;
  const { reduce } = semiring;
  const mats = new Array(nAlpha);
  for (let k = 0; k < nAlpha; k++) mats[k] = stepMatrix(machine, isInput, k + 1);
  const out = new Float64Array(S * S).fill(NEG_INF);
  const tmp = new Float64Array(nAlpha);
  for (let s = 0; s < S; s++) {
    for (let d = 0; d < S; d++) {
      for (let k = 0; k < nAlpha; k++) {
        tmp[k] = profile[p * nAlpha + k] + mats[k][s * S + d];
      }
      out[s * S + d] = reduce(tmp);
    }
  }
  return out;
}

/** Forward over a (L x nAlpha) log-weight profile. */
export function fillLattice1DProfile(machine, profile, direction, L, semiringType) {
  const semiring = makeSemiring(semiringType);
  const { reduce } = semiring;
  const isInput = direction === 'input';
  const nAlpha = (isInput ? machine.nInputTokens : machine.nOutputTokens) - 1;
  const S = machine.nStates;
  const closure = pickClosure(machine, semiring);
  const lat = new Float64Array((L + 1) * S).fill(NEG_INF);
  for (let s = 0; s < S; s++) lat[s] = closure[s];
  const tmp = new Float64Array(S);
  for (let p = 1; p <= L; p++) {
    const m = profileStepMatrix(machine, isInput, profile, p - 1, nAlpha, semiring);
    const src = (p - 1) * S;
    const pre = new Float64Array(S).fill(NEG_INF);
    for (let d = 0; d < S; d++) {
      for (let s = 0; s < S; s++) tmp[s] = lat[src + s] + m[s * S + d];
      pre[d] = reduce(tmp);
    }
    const cur = vecMat(pre, closure, S, reduce);
    for (let s = 0; s < S; s++) lat[p * S + s] = cur[s];
  }
  return lat;
}

export function forward1DProfile(machine, profile, direction, L) {
  const S = machine.nStates;
  const lat = fillLattice1DProfile(machine, profile, direction, L, 'logsumexp');
  return lat[L * S + (S - 1)];
}

export function viterbi1DProfile(machine, profile, direction, L) {
  const S = machine.nStates;
  const lat = fillLattice1DProfile(machine, profile, direction, L, 'maxplus');
  return lat[L * S + (S - 1)];
}

/** Backward profile lattice + posteriors. */
export function backward1DProfile(machine, profile, direction, L) {
  const semiring = makeSemiring('logsumexp');
  const { reduce } = semiring;
  const isInput = direction === 'input';
  const nAlpha = (isInput ? machine.nInputTokens : machine.nOutputTokens) - 1;
  const S = machine.nStates;
  const closure = machine.closure;
  const lat = new Float64Array((L + 1) * S).fill(NEG_INF);
  const tmp = new Float64Array(S);
  for (let p = L; p >= 0; p--) {
    const post = new Float64Array(S).fill(NEG_INF);
    if (p === L) {
      post[S - 1] = 0.0;
    } else {
      const m = profileStepMatrix(machine, isInput, profile, p, nAlpha, semiring);
      const nxt = (p + 1) * S;
      for (let s = 0; s < S; s++) {
        for (let d = 0; d < S; d++) tmp[d] = m[s * S + d] + lat[nxt + d];
        post[s] = reduce(tmp);
      }
    }
    const cur = matVec(closure, post, S, reduce);
    for (let s = 0; s < S; s++) lat[p * S + s] = cur[s];
  }
  return lat;
}

export function posteriors1DProfile(machine, profile, direction, L) {
  const S = machine.nStates;
  const fwd = fillLattice1DProfile(machine, profile, direction, L, 'logsumexp');
  const bwd = backward1DProfile(machine, profile, direction, L);
  const logLikelihood = fwd[L * S + (S - 1)];
  const posteriors = new Float64Array(fwd.length);
  if (logLikelihood === NEG_INF) return { logLikelihood, posteriors };
  for (let idx = 0; idx < fwd.length; idx++) {
    const lp = fwd[idx] + bwd[idx] - logLikelihood;
    posteriors[idx] = lp === NEG_INF ? 0.0 : Math.exp(lp);
  }
  return { logLikelihood, posteriors };
}

/** Convert a probability profile to log-space (utility mirrored from the
 * reference API, ref js/webgpu/machineboss-gpu.mjs:246-252). */
export function logProfile(probs) {
  const out = new Float64Array(probs.length);
  for (let i = 0; i < probs.length; i++) {
    out[i] = probs[i] > 0 ? Math.log(probs[i]) : NEG_INF;
  }
  return out;
}
