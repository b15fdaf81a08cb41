/**
 * 2D (pairwise) DP on a prepared machine — CPU path.
 *
 * Forward, Backward, Viterbi (+ traceback) and posteriors over the
 * (Li+1) x (Lo+1) x S lattice. Cells hold POST-CLOSURE values: each step
 * accumulates the three emitting classes (up = output-only, left =
 * input-only, diag = input+output) and applies the precomputed silent
 * closure once — the same lowering contract as
 * machineboss_tpu/ops/lowering + ops/host_oracle.forward_2d_f64, so the
 * JS runtime is numerically interchangeable with the TPU engines.
 *
 * Reference capability: ref js/webgpu/cpu/forward-2d.mjs,
 * backward-2d.mjs, viterbi-2d.mjs, posteriors.mjs.
 */

import { NEG_INF, makeSemiring, vecMat, matVec } from '../internal/logmath.mjs';
import { transMatrix } from '../internal/prep.mjs';

function pickClosure(machine, semiring) {
  return semiring.name === 'maxplus' ? machine.closureMax : machine.closure;
}

/**
 * Fill the full post-closure lattice.
 * Returns Float64Array((Li+1)*(Lo+1)*S), index (i*(Lo+1)+o)*S + s.
 */
export function fillLattice2D(machine, inputTokens, outputTokens, semiringType) {
  const semiring = makeSemiring(semiringType);
  const { plus, reduce } = semiring;
  const S = machine.nStates;
  const closure = pickClosure(machine, semiring);
  const x = inputTokens;
  const y = outputTokens;
  const Li = x.length;
  const Lo = y.length;
  const W = Lo + 1;
  const lat = new Float64Array((Li + 1) * W * S).fill(NEG_INF);

  const pre = new Float64Array(S);
  const tmp = new Float64Array(S);
  for (let i = 0; i <= Li; i++) {
    for (let o = 0; o <= Lo; o++) {
      if (i === 0 && o === 0) {
        for (let s = 0; s < S; s++) lat[s] = closure[s];  // row 0 of closure
        continue;
      }
      pre.fill(NEG_INF);
      if (o >= 1) {
        const up = transMatrix(machine, 0, y[o - 1]);
        const src = (i * W + (o - 1)) * S;
        for (let d = 0; d < S; d++) {
          for (let s = 0; s < S; s++) tmp[s] = lat[src + s] + up[s * S + d];
          pre[d] = plus(pre[d], reduce(tmp));
        }
      }
      if (i >= 1) {
        const left = transMatrix(machine, x[i - 1], 0);
        const src = ((i - 1) * W + o) * S;
        for (let d = 0; d < S; d++) {
          for (let s = 0; s < S; s++) tmp[s] = lat[src + s] + left[s * S + d];
          pre[d] = plus(pre[d], reduce(tmp));
        }
      }
      if (i >= 1 && o >= 1) {
        const diag = transMatrix(machine, x[i - 1], y[o - 1]);
        const src = ((i - 1) * W + (o - 1)) * S;
        for (let d = 0; d < S; d++) {
          for (let s = 0; s < S; s++) tmp[s] = lat[src + s] + diag[s * S + d];
          pre[d] = plus(pre[d], reduce(tmp));
        }
      }
      const cur = vecMat(pre, closure, S, reduce);
      const dst = (i * W + o) * S;
      for (let s = 0; s < S; s++) lat[dst + s] = cur[s];
    }
  }
  return lat;
}

/** Forward log-likelihood of the pair. */
export function forward2D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const lat = fillLattice2D(machine, inputTokens, outputTokens, 'logsumexp');
  return lat[lat.length - S + (S - 1)];
}

/**
 * Backward lattice: b[(i*(Lo+1)+o)*S + s] = weight of all completions
 * from state s at (i, o) to the end state at (Li, Lo), INCLUDING leading
 * silent moves (so b(0,0)[0] equals the Forward log-likelihood).
 */
export function fillBackward2D(machine, inputTokens, outputTokens, semiringType) {
  const semiring = makeSemiring(semiringType);
  const { plus, reduce } = semiring;
  const S = machine.nStates;
  const closure = pickClosure(machine, semiring);
  const x = inputTokens;
  const y = outputTokens;
  const Li = x.length;
  const Lo = y.length;
  const W = Lo + 1;
  const lat = new Float64Array((Li + 1) * W * S).fill(NEG_INF);

  const post = new Float64Array(S);
  const tmp = new Float64Array(S);
  for (let i = Li; i >= 0; i--) {
    for (let o = Lo; o >= 0; o--) {
      post.fill(NEG_INF);
      if (i === Li && o === Lo) {
        post[S - 1] = 0.0;  // stop at the end state
      }
      if (o < Lo) {
        const up = transMatrix(machine, 0, y[o]);
        const nxt = (i * W + (o + 1)) * S;
        for (let s = 0; s < S; s++) {
          for (let d = 0; d < S; d++) tmp[d] = up[s * S + d] + lat[nxt + d];
          post[s] = plus(post[s], reduce(tmp));
        }
      }
      if (i < Li) {
        const left = transMatrix(machine, x[i], 0);
        const nxt = ((i + 1) * W + o) * S;
        for (let s = 0; s < S; s++) {
          for (let d = 0; d < S; d++) tmp[d] = left[s * S + d] + lat[nxt + d];
          post[s] = plus(post[s], reduce(tmp));
        }
      }
      if (i < Li && o < Lo) {
        const diag = transMatrix(machine, x[i], y[o]);
        const nxt = ((i + 1) * W + (o + 1)) * S;
        for (let s = 0; s < S; s++) {
          for (let d = 0; d < S; d++) tmp[d] = diag[s * S + d] + lat[nxt + d];
          post[s] = plus(post[s], reduce(tmp));
        }
      }
      const cur = matVec(closure, post, S, reduce);
      const dst = (i * W + o) * S;
      for (let s = 0; s < S; s++) lat[dst + s] = cur[s];
    }
  }
  return lat;
}

/** Backward log-likelihood (must equal forward2D). */
export function backward2D(machine, inputTokens, outputTokens) {
  const lat = fillBackward2D(machine, inputTokens, outputTokens, 'logsumexp');
  return lat[0];
}

/**
 * Forward-Backward posteriors.
 * posteriors[(i*(Lo+1)+o)*S + s] = P(the path visits state s at (i, o)).
 * The forward value is post-closure and the backward value includes the
 * leading silent closure, so every path is split exactly once at its
 * visit to s — visiting-state posteriors, as the reference computes
 * (ref js/webgpu/cpu/posteriors.mjs).
 */
export function posteriors2D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const fwd = fillLattice2D(machine, inputTokens, outputTokens, 'logsumexp');
  const bwd = fillBackward2D(machine, inputTokens, outputTokens, 'logsumexp');
  const logLikelihood = fwd[fwd.length - S + (S - 1)];
  const n = fwd.length;
  const posteriors = new Float64Array(n);
  if (logLikelihood === NEG_INF) {
    return { logLikelihood, posteriors };
  }
  for (let idx = 0; idx < n; idx++) {
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

/**
 * Viterbi score + best path.
 *
 * Traceback decomposes each post-closure cell value into (silent chain)
 * + (one emitting step) by value matching against the max-plus lattice —
 * the same decomposition the host traceback performs
 * (machineboss_tpu/algo/dp_host.DPMatrix.traceback). Returns
 * {score, path} with path entries {from, to, inTok, outTok} in forward
 * order (inTok/outTok are 1-based token indices, 0 = epsilon).
 */
export function viterbi2D(machine, inputTokens, outputTokens) {
  const S = machine.nStates;
  const x = inputTokens;
  const y = outputTokens;
  const Li = x.length;
  const Lo = y.length;
  const W = Lo + 1;
  const lat = fillLattice2D(machine, x, y, 'maxplus');
  const score = lat[((Li * W) + Lo) * S + (S - 1)];
  if (score === NEG_INF) {
    return { score, path: [] };
  }
  const closure = machine.closureMax;
  const silent = machine.silent;
  const steps = [];
  let i = Li;
  let o = Lo;
  let s = S - 1;
  let guard = (Li + 1) * (Lo + 1) * (S + 1) * 4 + 16;
  while (guard-- > 0) {
    const val = lat[(i * W + o) * S + s];
    if (i === 0 && o === 0) {
      // decompose the start cell: lat(0,0)[s] = closureMax[0][s]
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
      if (!moved) throw new Error(`viterbi2D: start-cell traceback stuck at state ${s}`);
      continue;
    }
    // try an emitting step landing directly on s (cell entered at s)
    let matched = false;
    if (!matched && o >= 1) {
      const up = transMatrix(machine, 0, y[o - 1]);
      const src = (i * W + (o - 1)) * S;
      for (let u = 0; u < S && !matched; u++) {
        if (up[u * S + s] === NEG_INF) continue;
        if (closeEnough(lat[src + u] + up[u * S + s], val)) {
          steps.push({ from: u, to: s, inTok: 0, outTok: y[o - 1] });
          o -= 1;
          s = u;
          matched = true;
        }
      }
    }
    if (!matched && i >= 1) {
      const left = transMatrix(machine, x[i - 1], 0);
      const src = ((i - 1) * W + o) * S;
      for (let u = 0; u < S && !matched; u++) {
        if (left[u * S + s] === NEG_INF) continue;
        if (closeEnough(lat[src + u] + left[u * S + s], val)) {
          steps.push({ from: u, to: s, inTok: x[i - 1], outTok: 0 });
          i -= 1;
          s = u;
          matched = true;
        }
      }
    }
    if (!matched && i >= 1 && o >= 1) {
      const diag = transMatrix(machine, x[i - 1], y[o - 1]);
      const src = ((i - 1) * W + (o - 1)) * S;
      for (let u = 0; u < S && !matched; u++) {
        if (diag[u * S + s] === NEG_INF) continue;
        if (closeEnough(lat[src + u] + diag[u * S + s], val)) {
          steps.push({ from: u, to: s, inTok: x[i - 1], outTok: y[o - 1] });
          i -= 1;
          o -= 1;
          s = u;
          matched = true;
        }
      }
    }
    if (!matched) {
      // must be a trailing silent move within this cell
      for (let t = 0; t < S && !matched; t++) {
        if (silent[t * S + s] === NEG_INF) continue;
        if (closeEnough(lat[(i * W + o) * S + t] + silent[t * S + s], val)) {
          steps.push({ from: t, to: s, inTok: 0, outTok: 0 });
          s = t;
          matched = true;
        }
      }
    }
    if (!matched) {
      throw new Error(`viterbi2D: traceback stuck at (${i},${o}) state ${s}`);
    }
  }
  if (guard <= 0) throw new Error('viterbi2D: traceback did not terminate');
  steps.reverse();
  return { score, path: steps };
}
