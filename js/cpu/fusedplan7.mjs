/**
 * Fused profile-HMM (x) transducer DP — CPU path.
 *
 * Scores a read against (HMMER profile generator ∘ transducer) WITHOUT
 * materializing the composite machine, exploiting the Plan7 linear
 * chain: per output position the within-row sweep walks nodes k = 1..K
 * once, with the I_k insert loops, node-0 insert loop and N/C/J flank
 * loops closed EXACTLY by precomputed (I - loop)* transducer-space
 * closures. O(Lo * K * St^2) like the TPU engine
 * (machineboss_tpu/ops/fused_plan7.Plan7Fused), whose recurrence this
 * module mirrors 1:1 so the two are numerically interchangeable.
 *
 * Generator structure mirrors machineboss_tpu/core/hmmer.py's builders
 * (emission split M_k -> Mx_k etc.); reference capability:
 * ref js/webgpu/cpu/fused-plan7.mjs, shaders/fused-plan7-batch.wgsl.
 *
 * Modes: {mode: 'core', local} = B/M/I/D chain only;
 * {mode: 'plan7', multihit, length} = full Plan7 with N/C/J flanks.
 */

import { NEG_INF, logaddexp, logsum } from '../internal/logmath.mjs';
import { transMatrix, silentClosureLog, silentClosureMax, tokenIndex } from '../internal/prep.mjs';
import { calcMatchOccupancy } from '../internal/hmmer.mjs';

function logOf(p) {
  return p > 0 ? Math.log(p) : NEG_INF;
}

/** (St,St) log-semiring matmul (logsumexp reduce). */
function logMatMul(a, b, St, reduce) {
  const out = new Float64Array(St * St);
  const tmp = new Float64Array(St);
  for (let i = 0; i < St; i++) {
    for (let j = 0; j < St; j++) {
      for (let k = 0; k < St; k++) tmp[k] = a[i * St + k] + b[k * St + j];
      out[i * St + j] = reduce(tmp);
    }
  }
  return out;
}

/** Elementwise semiring sum of a weighted stack of matrices:
 * out = R_a (logw[a] + mats[a]). */
function mixMats(logw, mats, St, reduce) {
  const n = logw.length;
  const out = new Float64Array(St * St);
  const tmp = new Float64Array(n);
  for (let e = 0; e < St * St; e++) {
    for (let a = 0; a < n; a++) tmp[a] = logw[a] + mats[a][e];
    out[e] = reduce(tmp);
  }
  return out;
}

/** Add a log scalar to every entry. */
function scaleMat(m, logw, St) {
  const out = new Float64Array(St * St);
  for (let e = 0; e < St * St; e++) out[e] = m[e] + logw;
  return out;
}

/**
 * Precompute semiring-specific tensors for the fused DP.
 * sr: 'logsumexp' | 'maxplus'.
 */
function buildTensors(fused, sr) {
  const machine = fused.machine;
  const hmm = fused.hmm;
  const St = machine.nStates;
  const A = hmm.alph.length;
  const nOut = machine.nOutputTokens;
  const K = hmm.node.length;
  const isMax = sr === 'maxplus';
  const reduce = isMax
    ? (arr) => { let m = NEG_INF; for (let i = 0; i < arr.length; i++) if (arr[i] > m) m = arr[i]; return m; }
    : logsum;
  const star = isMax
    ? (m) => silentClosureMax(m, St)
    : (m) => silentClosureLog(m, St);
  const closure = isMax ? machine.closureMax : machine.closure;

  // transducer move matrices, silent closure folded on the right
  const toks = hmm.alph.map(sym => tokenIndex(machine.inputAlphabet, sym));
  const Tout = new Array(nOut);           // out-only, per output token y
  for (let y = 1; y < nOut; y++) {
    Tout[y] = logMatMul(transMatrix(machine, 0, y), closure, St, reduce);
  }
  const Tabs = new Array(A);              // absorb profile symbol a silently
  const Temit = new Array(A);             // absorb a AND emit y
  for (let a = 0; a < A; a++) {
    Tabs[a] = logMatMul(transMatrix(machine, toks[a], 0), closure, St, reduce);
    Temit[a] = new Array(nOut);
    for (let y = 1; y < nOut; y++) {
      Temit[a][y] = logMatMul(transMatrix(machine, toks[a], y), closure, St, reduce);
    }
  }

  // per-class emission mixtures (log emission weights per symbol)
  const logNull = hmm.nullEmit.map(logOf);
  const logIns0 = hmm.ins0Emit.map(logOf);
  const AbsM = new Array(K);
  const AbsI = new Array(K);
  const EmM = new Array(K);
  const EmI = new Array(K);
  for (let j = 0; j < K; j++) {
    const lm = hmm.node[j].matchEmit.map(logOf);
    const li = hmm.node[j].insEmit.map(logOf);
    AbsM[j] = mixMats(lm, Tabs, St, reduce);
    AbsI[j] = mixMats(li, Tabs, St, reduce);
    EmM[j] = new Array(nOut);
    EmI[j] = new Array(nOut);
    for (let y = 1; y < nOut; y++) {
      const stackM = new Array(A);
      const stackI = new Array(A);
      for (let a = 0; a < A; a++) { stackM[a] = Temit[a][y]; stackI[a] = Temit[a][y]; }
      EmM[j][y] = mixMats(lm, stackM, St, reduce);
      EmI[j][y] = mixMats(li, stackI, St, reduce);
    }
  }
  const AbsI0 = mixMats(logIns0, Tabs, St, reduce);
  const EmI0 = new Array(nOut);
  const AbsN = mixMats(logNull, Tabs, St, reduce);
  const EmN = new Array(nOut);
  for (let y = 1; y < nOut; y++) {
    const stack = new Array(A);
    for (let a = 0; a < A; a++) stack[a] = Temit[a][y];
    EmI0[y] = mixMats(logIns0, stack, St, reduce);
    EmN[y] = mixMats(logNull, stack, St, reduce);
  }

  // loop closures (row-independent)
  const StarI = new Array(K);
  for (let j = 0; j < K; j++) {
    StarI[j] = star(scaleMat(AbsI[j], logOf(hmm.node[j].iToI), St));
  }
  const StarI0 = star(scaleMat(AbsI0, logOf(hmm.i0ToI0), St));
  const loopScal = logOf(fused.length / (fused.length + 1));
  const StarFlank = star(scaleMat(AbsN, loopScal, St));

  return {
    reduce, closure, Tout, AbsM, AbsI, EmM, EmI, AbsI0, EmI0, AbsN, EmN,
    StarI, StarI0, StarFlank, loopScal,
    exitScal: logOf(1.0 / (fused.length + 1)),
  };
}

/**
 * Build the fused structure. machine = prepareMachine(...) of the
 * transducer; hmm = parseHmmer(...) of the profile.
 */
export function buildFusedPlan7(hmm, machine, options = {}) {
  const mode = options.mode || 'plan7';
  const K = hmm.node.length;
  if (K < 1) throw new Error('empty HMM');
  const fused = {
    hmm,
    machine,
    mode,
    local: mode === 'plan7' ? true : (options.local !== false),
    multihit: !!options.multihit,
    length: options.length || 400.0,
    nHit: options.nHit || 3,
    _cache: {},
  };
  // local-entry weights occ[k]/z for k = 1..K-1 (core/hmmer.py:201-207);
  // entry[K] stays NEG_INF (no local entry at the last node)
  const occ = calcMatchOccupancy(hmm);
  let z = 0.0;
  for (let k = 1; k < K; k++) z += occ[k] * (K - k + 1);
  fused.entry = new Float64Array(K + 1).fill(NEG_INF);
  for (let k = 1; k < K; k++) fused.entry[k] = logOf(occ[k] / z);
  return fused;
}

function tensorsFor(fused, sr) {
  if (!fused._cache[sr]) fused._cache[sr] = buildTensors(fused, sr);
  return fused._cache[sr];
}

function newVec(St) { return new Float64Array(St).fill(NEG_INF); }

/** acc = acc (+) (v + logw)  elementwise. */
function accScaled(acc, v, logw, plus) {
  if (logw === NEG_INF) return;
  for (let i = 0; i < acc.length; i++) acc[i] = plus(acc[i], v[i] + logw);
}

/** acc = acc (+) (v ⊗ M). */
function accMat(acc, v, m, St, plus, reduce) {
  const tmp = new Float64Array(St);
  for (let d = 0; d < St; d++) {
    for (let s = 0; s < St; s++) tmp[s] = v[s] + m[s * St + d];
    acc[d] = plus(acc[d], reduce(tmp));
  }
}

/**
 * One row solve. base maps state keys to St-vectors of contributions
 * arriving from the previous row (or the start). Returns the row's
 * vectors in TWO families per state, which canonicalize the interleaving
 * of independent moves (the epsilon-sequencing problem that
 * Machine.compose solves with the waiting-machine construction,
 * ref src/machine.cpp:794-908):
 *   sync[g] — mass whose latest move involved the transducer (a row
 *             arrival or an absorbed emission); the ONLY family
 *             transducer out-only moves may extend (generator-silent
 *             moves are canonically deferred past out-moves);
 *   all[g]  — sync plus trailing generator-silent chains; read by
 *             synchronized emission moves and the final readout.
 * Multihit re-entry (E -> J -> B) is resolved by nHit fixed-point
 * sweeps, exactly like Plan7Fused's row solver.
 */
function solveRow(fused, T, base, sr) {
  const St = fused.machine.nStates;
  const K = fused.hmm.node.length;
  const hmm = fused.hmm;
  const plus = sr === 'maxplus' ? (a, b) => (a > b ? a : b) : logaddexp;
  const reduce = T.reduce;
  const plan7 = fused.mode === 'plan7';
  const local = fused.local;
  const nSweeps = (plan7 && fused.multihit) ? fused.nHit : 1;

  let vJxPrev = newVec(St);
  let out = null;
  for (let sweep = 0; sweep < nSweeps; sweep++) {
    // aM etc. = "all" family; sMx etc. = "sync" family where it differs
    const aM = new Array(K), sMx = new Array(K), aMx = new Array(K);
    const aI = new Array(K), sIx = new Array(K), aIx = new Array(K);
    const aD = new Array(K);
    // --- flanking prefix (plan7): S -> N loop -> B
    let aB = base.B.slice();
    let aS = null, aN = null, aNx = null, sNx = null;
    if (plan7) {
      aS = base.S.slice();                       // S: arrivals only
      // A[Nx] loop solve: ext = base.Nx (+) A[S] (+) base.N ⊗ AbsN
      const extNx = base.Nx.slice();
      accScaled(extNx, aS, 0.0, plus);           // S -> Nx (gen-silent)
      accMat(extNx, base.N, T.AbsN, St, plus, reduce);
      aNx = newVec(St);
      accMat(aNx, extNx, T.StarFlank, St, plus, reduce);
      aN = base.N.slice();
      accScaled(aN, aNx, T.loopScal, plus);
      // sync[Nx] = base.Nx (+) A[N] ⊗ AbsN (absorb is a td move)
      sNx = base.Nx.slice();
      accMat(sNx, aN, T.AbsN, St, plus, reduce);
      accScaled(aB, aNx, T.exitScal, plus);      // Nx -> B (gen-silent)
      if (fused.multihit) accScaled(aB, vJxPrev, T.exitScal, plus);
    }
    // --- node-0 insert (global core only)
    let aI0 = newVec(St);
    let sIx0 = newVec(St);
    let aIx0 = newVec(St);
    if (!plan7 && !local) {
      const extI0 = base.I0.slice();
      accScaled(extI0, aB, logOf(hmm.bToI0), plus);
      const ext = extI0.slice();
      accScaled(ext, base.Ix0, logOf(hmm.i0ToI0), plus);
      accMat(aI0, ext, T.StarI0, St, plus, reduce);
      sIx0 = base.Ix0.slice();
      accMat(sIx0, aI0, T.AbsI0, St, plus, reduce);
      aIx0 = sIx0;                               // no silent into Ix0
    }
    // --- core chain
    const aE = base.E.slice();
    for (let j = 0; j < K; j++) {
      const k = j + 1;
      const node = hmm.node[j];
      // M_k (all incoming is gen-silent: entry + k-1 chain)
      const m = base.M[j].slice();
      if (plan7 || local) {
        accScaled(m, aB, fused.entry[k], plus);
      } else if (k === 1) {
        accScaled(m, aB, logOf(hmm.bToM1), plus);
        accScaled(m, aIx0, logOf(hmm.i0ToM1), plus);
      }
      if (k > 1) {
        const pn = hmm.node[j - 1];
        accScaled(m, aMx[j - 1], logOf(pn.mToM), plus);
        accScaled(m, aIx[j - 1], logOf(pn.iToM), plus);
        accScaled(m, aD[j - 1], logOf(pn.dToM), plus);
      }
      aM[j] = m;
      // Mx_k: absorb from A[M_k] is synced; no gen-silent into Mx
      const mx = base.Mx[j].slice();
      accMat(mx, m, T.AbsM[j], St, plus, reduce);
      sMx[j] = mx;
      aMx[j] = mx;
      // D_k (all incoming gen-silent)
      const d = base.D[j].slice();
      if (k === 1) {
        if (!plan7 && !local) accScaled(d, aB, logOf(hmm.bToD1), plus);
      } else {
        const pn = hmm.node[j - 1];
        accScaled(d, aMx[j - 1], logOf(pn.mToD), plus);
        accScaled(d, aD[j - 1], logOf(pn.dToD), plus);
      }
      aD[j] = d;
      // I_k loop (solved in the all-family; absorb into Ix is synced)
      const extI = base.I[j].slice();
      accScaled(extI, mx, logOf(node.mToI), plus);
      const ext = extI.slice();
      accScaled(ext, base.Ix[j], logOf(node.iToI), plus);
      const vi = newVec(St);
      accMat(vi, ext, T.StarI[j], St, plus, reduce);
      aI[j] = vi;
      const vix = base.Ix[j].slice();
      accMat(vix, vi, T.AbsI[j], St, plus, reduce);
      sIx[j] = vix;
      aIx[j] = vix;
      // E accumulation (all gen-silent exits)
      if (plan7 || local) {
        accScaled(aE, m, 0.0, plus);            // unit M_k -> E exit
        accScaled(aE, d, 0.0, plus);            // unit D_k -> E exit
      }
      if (k === K) {
        if (!(plan7 || local)) {
          accScaled(aE, mx, logOf(node.mToM), plus);
          accScaled(aE, d, logOf(node.dToM), plus);
        }
        accScaled(aE, vix, logOf(node.iToM), plus);
      }
    }
    // --- flanking suffix: E -> C loop -> T (and E -> J loop, multihit)
    let aC = null, aCx = null, sCx = null, aJ = null, sJx = null;
    let vJx = newVec(St), aT = null;
    if (plan7) {
      const eToC = fused.multihit ? Math.log(0.5) : 0.0;
      const extCx = base.Cx.slice();
      accScaled(extCx, aE, eToC, plus);          // E -> Cx (gen-silent)
      accMat(extCx, base.C, T.AbsN, St, plus, reduce);
      aCx = newVec(St);
      accMat(aCx, extCx, T.StarFlank, St, plus, reduce);
      aC = base.C.slice();
      accScaled(aC, aCx, T.loopScal, plus);
      sCx = base.Cx.slice();
      accMat(sCx, aC, T.AbsN, St, plus, reduce);
      aT = base.T.slice();
      accScaled(aT, aCx, T.exitScal, plus);
      if (fused.multihit) {
        const extJx = base.Jx.slice();
        accScaled(extJx, aE, Math.log(0.5), plus);
        accMat(extJx, base.J, T.AbsN, St, plus, reduce);
        accMat(vJx, extJx, T.StarFlank, St, plus, reduce);
        aJ = base.J.slice();
        accScaled(aJ, vJx, T.loopScal, plus);
        sJx = base.Jx.slice();
        accMat(sJx, aJ, T.AbsN, St, plus, reduce);
      }
    }
    out = {
      aS, aN, aNx, sNx, aB, aI0, sIx0, aIx0,
      aM, sMx, aMx, aI, sIx, aIx, aD, aE,
      aC, aCx, sCx, aJ, sJx, vJx, aT,
      base,
    };
    vJxPrev = vJx;
  }
  return out;
}

function emptyBase(fused, St) {
  const K = fused.hmm.node.length;
  const mk = () => newVec(St);
  const base = {
    B: mk(), E: mk(), I0: mk(), Ix0: mk(),
    M: new Array(K), Mx: new Array(K), I: new Array(K),
    Ix: new Array(K), D: new Array(K),
    S: mk(), N: mk(), Nx: mk(), C: mk(), Cx: mk(), J: mk(), Jx: mk(),
    T: mk(),
  };
  for (let j = 0; j < K; j++) {
    base.M[j] = mk(); base.Mx[j] = mk(); base.I[j] = mk();
    base.Ix[j] = mk(); base.D[j] = mk();
  }
  return base;
}

/**
 * Advance: build the next row's base from this row's solved vectors.
 * Transducer out-only moves (Tout) read the SYNC family — generator
 * silent moves may not immediately precede an out-move (canonical
 * interleaving, see solveRow). Synchronized emission moves (Em*) read
 * the ALL family (trailing generator-silent chains attach to them).
 */
function advanceRow(fused, T, row, y, sr) {
  const St = fused.machine.nStates;
  const K = fused.hmm.node.length;
  const plus = sr === 'maxplus' ? (a, b) => (a > b ? a : b) : logaddexp;
  const reduce = T.reduce;
  const base = row.base;
  const next = emptyBase(fused, St);
  const out = T.Tout[y];
  const plan7 = fused.mode === 'plan7';
  const keep = (dstVec, srcVec) => {
    if (srcVec) accMat(dstVec, srcVec, out, St, plus, reduce);
  };
  keep(next.B, base.B);                  // sync[B] = base.B
  keep(next.E, base.E);
  for (let j = 0; j < K; j++) {
    keep(next.M[j], base.M[j]);
    keep(next.Mx[j], row.sMx[j]);
    keep(next.I[j], base.I[j]);
    keep(next.Ix[j], row.sIx[j]);
    keep(next.D[j], base.D[j]);
    // profile emission consumed with output y (reads the all-family)
    accMat(next.Mx[j], row.aM[j], T.EmM[j][y], St, plus, reduce);
    accMat(next.Ix[j], row.aI[j], T.EmI[j][y], St, plus, reduce);
  }
  if (!plan7 && !fused.local) {
    keep(next.I0, base.I0);
    keep(next.Ix0, row.sIx0);
    accMat(next.Ix0, row.aI0, T.EmI0[y], St, plus, reduce);
  }
  if (plan7) {
    keep(next.S, base.S);
    keep(next.N, base.N);
    keep(next.Nx, row.sNx);
    keep(next.C, base.C);
    keep(next.Cx, row.sCx);
    keep(next.T, base.T);
    accMat(next.Nx, row.aN, T.EmN[y], St, plus, reduce);
    accMat(next.Cx, row.aC, T.EmN[y], St, plus, reduce);
    if (fused.multihit) {
      keep(next.J, base.J);
      keep(next.Jx, row.sJx);
      accMat(next.Jx, row.aJ, T.EmN[y], St, plus, reduce);
    }
  }
  return next;
}

function runFused(fused, outputTokens, sr) {
  const T = tensorsFor(fused, sr);
  const St = fused.machine.nStates;
  const plan7 = fused.mode === 'plan7';
  let base = emptyBase(fused, St);
  // start: generator start state with the transducer's closed start vector
  const startVec = new Float64Array(St);
  for (let s = 0; s < St; s++) startVec[s] = T.closure[s];  // row 0 of closure
  if (plan7) base.S = startVec; else base.B = startVec;
  let row = solveRow(fused, T, base, sr);
  for (let o = 0; o < outputTokens.length; o++) {
    base = advanceRow(fused, T, row, outputTokens[o], sr);
    row = solveRow(fused, T, base, sr);
  }
  const readout = plan7 ? row.aT : row.aE;   // trailing silent allowed
  return readout[St - 1];
}

/** Forward log-likelihood of one tokenized read (1-based out tokens). */
export function fusedPlan7Forward(fused, outputTokens) {
  return runFused(fused, outputTokens, 'logsumexp');
}

/** Viterbi (max-plus) score of one tokenized read. */
export function fusedPlan7Viterbi(fused, outputTokens) {
  return runFused(fused, outputTokens, 'maxplus');
}

/**
 * Pack the fused tensors + scalars into flat f32 arrays matching the
 * WGSL layout of shaders/fusedplan7-common.wgsl (offClosure..offEmI /
 * sEntry..sFlat). Used by gpu/fusedplan7-gpu.mjs; the epsilon column
 * (y = 0) of per-output-token blocks is log-zero.
 */
export function packFusedTensors(fused, sr) {
  const T = tensorsFor(fused, sr);
  const St = fused.machine.nStates;
  const K = fused.hmm.node.length;
  const nOut = fused.machine.nOutputTokens;
  const sq = St * St;
  const nBlocks = 5 + 3 * nOut + 3 * K + 2 * K * nOut;
  const tens = new Float32Array(nBlocks * sq).fill(-3.0e38);
  const put = (blk, mat) => {
    if (!mat) return;
    for (let i = 0; i < sq; i++) {
      const v = mat[i];
      tens[blk * sq + i] = (v === NEG_INF || v < -1.0e38) ? -3.0e38 : v;
    }
  };
  put(0, T.closure);
  put(1, T.AbsN);
  put(2, T.StarFlank);
  put(3, T.AbsI0);
  put(4, T.StarI0);
  for (let y = 1; y < nOut; y++) {
    put(5 + y, T.EmN[y]);
    put(5 + nOut + y, T.EmI0[y]);
    put(5 + 2 * nOut + y, T.Tout[y]);
  }
  for (let j = 0; j < K; j++) {
    put(5 + 3 * nOut + j, T.AbsM[j]);
    put(5 + 3 * nOut + K + j, T.AbsI[j]);
    put(5 + 3 * nOut + 2 * K + j, T.StarI[j]);
    for (let y = 1; y < nOut; y++) {
      put(5 + 3 * nOut + 3 * K + j * nOut + y, T.EmM[j][y]);
      put(5 + 3 * nOut + 3 * K + (K + j) * nOut + y, T.EmI[j][y]);
    }
  }
  const hmm = fused.hmm;
  const scal = new Float32Array(K + 1 + 7 * K + 7).fill(-3.0e38);
  const clamp = (v) => (v === NEG_INF || v < -1.0e38) ? -3.0e38 : v;
  for (let k = 0; k <= K; k++) scal[k] = clamp(fused.entry[k]);
  const rows = ['mToM', 'mToI', 'mToD', 'iToM', 'iToI', 'dToM', 'dToD'];
  for (let r = 0; r < 7; r++) {
    for (let j = 0; j < K; j++) {
      scal[K + 1 + r * K + j] = clamp(logOf(hmm.node[j][rows[r]]));
    }
  }
  const flats = [logOf(hmm.bToM1), logOf(hmm.bToI0), logOf(hmm.bToD1),
                 logOf(hmm.i0ToM1), logOf(hmm.i0ToI0),
                 T.loopScal, T.exitScal];
  for (let i = 0; i < 7; i++) scal[K + 1 + 7 * K + i] = clamp(flats[i]);
  return { tens, scal };
}
