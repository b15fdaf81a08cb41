/**
 * Machine preparation for the machineboss-tpu JS runtime.
 *
 * Machine JSON + params -> dense log-transition tensor plus the
 * precomputed silent-closure matrices the DP modules consume. This is the
 * same lowering contract as machineboss_tpu/ops/lowering.LoweredMachine:
 * cells are "post-closure" values and every DP step applies
 *   cell = closure ⊗ (class-accumulated pre-cell)
 * so one closure matmul replaces the reference's per-cell fixpoint
 * iteration (ref js/webgpu/cpu/silent.mjs:57-77 iterates to convergence
 * inside every cell; precomputing the closure does that work once).
 *
 * Reference capability: ref js/webgpu/internal/machine-prep.mjs.
 */

import { NEG_INF, logaddexp } from './logmath.mjs';

/**
 * Evaluate a Machine Boss weight expression (the JSON form of
 * schema/expr.json) to a number. Mirrors
 * machineboss_tpu/core/weight.from_json + evaluate: numbers, booleans,
 * parameter names (looked up in params then machine defs), and operator
 * objects {"*":[a,b]}, {"+":[a,b]}, {"-":[a,b]}, {"/":[a,b]},
 * {"pow":[a,b]}, {"log":x}, {"exp":x}, {"not":x}, {"geomsum":x}.
 */
export function evaluateWeight(w, params, defs) {
  if (w === null || w === undefined) return 0.0;
  if (typeof w === 'boolean') return w ? 1.0 : 0.0;
  if (typeof w === 'number') return w;
  if (typeof w === 'string') {
    if (params !== null && params !== undefined && w in params) {
      const v = params[w];
      if (typeof v === 'number') return v;
      return evaluateWeight(v, params, defs);
    }
    if (defs !== null && defs !== undefined && w in defs) {
      return evaluateWeight(defs[w], params, defs);
    }
    throw new Error(`Parameter ${w} not defined`);
  }
  if (typeof w === 'object') {
    if ('*' in w) {
      const a = w['*'];
      return evaluateWeight(a[0], params, defs) * evaluateWeight(a[1], params, defs);
    }
    if ('+' in w) {
      const a = w['+'];
      return evaluateWeight(a[0], params, defs) + evaluateWeight(a[1], params, defs);
    }
    if ('-' in w) {
      const a = w['-'];
      return evaluateWeight(a[0], params, defs) - evaluateWeight(a[1], params, defs);
    }
    if ('/' in w) {
      const a = w['/'];
      return evaluateWeight(a[0], params, defs) / evaluateWeight(a[1], params, defs);
    }
    if ('pow' in w) {
      const a = w['pow'];
      return Math.pow(evaluateWeight(a[0], params, defs), evaluateWeight(a[1], params, defs));
    }
    if ('log' in w) return Math.log(evaluateWeight(w['log'], params, defs));
    if ('exp' in w) return Math.exp(evaluateWeight(w['exp'], params, defs));
    if ('not' in w) return 1.0 - evaluateWeight(w['not'], params, defs);
    if ('geomsum' in w) return 1.0 / (1.0 - evaluateWeight(w['geomsum'], params, defs));
    throw new Error('Unsupported weight expression (expected one of * + - / pow log exp not geomsum)');
  }
  throw new Error(`Unsupported weight expression type ${typeof w}`);
}

/** Sorted emission alphabet for one direction; index 0 is epsilon (''). */
export function buildAlphabet(states, direction) {
  const seen = new Set();
  const syms = [];
  for (const st of states) {
    const trans = st.trans || [];
    for (const t of trans) {
      const sym = t[direction];
      if (sym !== undefined && sym !== null && sym !== '' && !seen.has(sym)) {
        seen.add(sym);
        syms.push(sym);
      }
    }
  }
  syms.sort();
  const alphabet = [''];
  for (const s of syms) alphabet.push(s);
  return alphabet;
}

/**
 * Exact log-semiring silent closure: log of (I - N)^(-1) where
 * N = exp(silent), via Gauss-Jordan elimination in probability space —
 * the same (I-N)^{-1} silent-cycle sum as machineboss_tpu/core/eval.py
 * (ref src/eval.cpp:146-181 uses GSL LU inversion). Throws if the silent
 * subgraph diverges (singular I-N).
 */
export function silentClosureLog(silent, S) {
  const a = new Float64Array(S * S);  // I - N
  for (let i = 0; i < S; i++) {
    for (let j = 0; j < S; j++) {
      const n = silent[i * S + j] === NEG_INF ? 0.0 : Math.exp(silent[i * S + j]);
      a[i * S + j] = (i === j ? 1.0 : 0.0) - n;
    }
  }
  const inv = new Float64Array(S * S);
  for (let i = 0; i < S; i++) inv[i * S + i] = 1.0;
  for (let col = 0; col < S; col++) {
    let piv = col;
    for (let r = col + 1; r < S; r++) {
      if (Math.abs(a[r * S + col]) > Math.abs(a[piv * S + col])) piv = r;
    }
    const pv = a[piv * S + col];
    if (Math.abs(pv) < 1e-300) {
      throw new Error('Silent transition cycle sums diverge (I - N is singular)');
    }
    if (piv !== col) {
      for (let j = 0; j < S; j++) {
        let t = a[col * S + j]; a[col * S + j] = a[piv * S + j]; a[piv * S + j] = t;
        t = inv[col * S + j]; inv[col * S + j] = inv[piv * S + j]; inv[piv * S + j] = t;
      }
    }
    for (let j = 0; j < S; j++) { a[col * S + j] /= pv; inv[col * S + j] /= pv; }
    for (let r = 0; r < S; r++) {
      if (r === col) continue;
      const f = a[r * S + col];
      if (f === 0) continue;
      for (let j = 0; j < S; j++) {
        a[r * S + j] -= f * a[col * S + j];
        inv[r * S + j] -= f * inv[col * S + j];
      }
    }
  }
  const out = new Float64Array(S * S).fill(NEG_INF);
  for (let i = 0; i < S * S; i++) {
    // tiny negative values are elimination round-off, not real mass
    if (inv[i] > 1e-12) out[i] = Math.log(inv[i]);
  }
  return out;
}

/**
 * Max-plus silent closure (best silent path weight incl. empty path on
 * the diagonal) via Floyd-Warshall — exact for any silent graph whose
 * cycles have non-positive log-weight.
 */
export function silentClosureMax(silent, S) {
  const d = new Float64Array(S * S);
  for (let i = 0; i < S * S; i++) d[i] = silent[i];
  for (let k = 0; k < S; k++) {
    for (let i = 0; i < S; i++) {
      const dik = d[i * S + k];
      if (dik === NEG_INF) continue;
      for (let j = 0; j < S; j++) {
        const via = dik + d[k * S + j];
        if (via > d[i * S + j]) d[i * S + j] = via;
      }
    }
  }
  for (let i = 0; i < S; i++) {
    if (d[i * S + i] > 1e-12) {
      throw new Error('Positive-weight silent cycle: Viterbi diverges');
    }
    if (d[i * S + i] < 0.0) d[i * S + i] = 0.0;  // empty path
  }
  return d;
}

/**
 * Prepare a machine JSON + params for the DP modules.
 *
 * Returns {nStates, nInputTokens, nOutputTokens, inputAlphabet,
 * outputAlphabet, logTrans, silent, closure, closureMax}. logTrans is a
 * flat Float64Array indexed [(inTok*nOut + outTok)*S + src]*S + dst.
 */
export function prepareMachine(machineJSON, params = {}) {
  const states = machineJSON.state;
  if (!Array.isArray(states) || states.length === 0) {
    throw new Error('Machine JSON must have a non-empty "state" array');
  }
  const defs = machineJSON.defs || {};
  const S = states.length;
  const inputAlphabet = buildAlphabet(states, 'in');
  const outputAlphabet = buildAlphabet(states, 'out');
  const nIn = inputAlphabet.length;
  const nOut = outputAlphabet.length;

  const inIdx = {};
  for (let i = 0; i < nIn; i++) inIdx[inputAlphabet[i]] = i;
  const outIdx = {};
  for (let i = 0; i < nOut; i++) outIdx[outputAlphabet[i]] = i;

  const nameToIdx = {};
  for (let i = 0; i < S; i++) {
    const id = states[i].id;
    if (id !== undefined && id !== null) {
      const key = typeof id === 'string' ? id : JSON.stringify(id);
      nameToIdx[key] = i;
    }
  }

  const size = nIn * nOut * S * S;
  const logTrans = new Float64Array(size).fill(NEG_INF);
  for (let src = 0; src < S; src++) {
    const trans = states[src].trans || [];
    for (const t of trans) {
      let dst = t.to;
      if (typeof dst !== 'number') {
        const key = typeof dst === 'string' ? dst : JSON.stringify(dst);
        if (!(key in nameToIdx)) {
          throw new Error(`Transition to unknown state ${key}`);
        }
        dst = nameToIdx[key];
      }
      const ti = (t.in === undefined || t.in === null || t.in === '') ? 0 : inIdx[t.in];
      const to = (t.out === undefined || t.out === null || t.out === '') ? 0 : outIdx[t.out];
      const w = evaluateWeight(t.weight === undefined ? 1 : t.weight, params, defs);
      const lw = w > 0 ? Math.log(w) : NEG_INF;
      const idx = ((ti * nOut + to) * S + src) * S + dst;
      logTrans[idx] = logaddexp(logTrans[idx], lw);  // duplicate transitions sum
    }
  }

  const silent = new Float64Array(S * S);
  for (let i = 0; i < S * S; i++) silent[i] = logTrans[i];
  const closure = silentClosureLog(silent, S);
  const closureMax = silentClosureMax(silent, S);

  return {
    nStates: S,
    nInputTokens: nIn,
    nOutputTokens: nOut,
    inputAlphabet,
    outputAlphabet,
    logTrans,
    silent,
    closure,
    closureMax,
  };
}

/** 1-based token index of a symbol (throws on unknown). */
export function tokenIndex(alphabet, symbol) {
  for (let i = 1; i < alphabet.length; i++) {
    if (alphabet[i] === symbol) return i;
  }
  throw new Error(`Unknown symbol "${symbol}"`);
}

/** Tokenize a string or array of symbols to 1-based indices. */
export function tokenize(seq, alphabet) {
  const syms = typeof seq === 'string' ? seq.split('') : seq;
  const out = new Uint32Array(syms.length);
  for (let i = 0; i < syms.length; i++) out[i] = tokenIndex(alphabet, syms[i]);
  return out;
}

/** Class matrix lookup helpers (shared by the DP modules). */
export function transMatrix(machine, inTok, outTok) {
  const { nStates: S, nOutputTokens: nOut, logTrans } = machine;
  const base = (inTok * nOut + outTok) * S * S;
  return logTrans.subarray(base, base + S * S);
}
