// Fused Plan7 (profile HMM (x) transducer) row solver — shared core.
//
// Direct WGSL port of the executable CPU contract
// (js/cpu/fusedplan7.mjs: solveRow / advanceRow / runFused): scores a
// read against a HMMER profile through a noisy transducer WITHOUT
// materializing the composed state space. Each read runs sequentially
// (rows over output tokens; within a row, the node chain k = 1..K with
// sync/all family canonicalization and nHit multihit sweeps); the entry
// shaders (fusedplan7-single.wgsl, fusedplan7-batch.wgsl) choose the
// dispatch shape. gpu/fusedplan7-gpu.mjs prepends logmath.wgsl and this
// file to each entry (plain WGSL has no includes — the reference splits
// the same way, ref js/webgpu/shaders/fused-plan7-common.wgsl).
//
// Buffers (bound by both entries):
//   params   St, K, nOut, flags (plan7/local/multihit/mode), nHit,
//            maxLen, nReads, workPerRead
//   tens     packed (St, St) tensors: closure, AbsN, StarFlank, AbsI0,
//            StarI0, EmN[nOut], EmI0[nOut], Tout[nOut], AbsM[K],
//            AbsI[K], StarI[K], EmM[K][nOut], EmI[K][nOut]
//   scal     packed scalars: entry[K+1], mToM..dToD (7 x K),
//            bToM1, bToI0, bToD1, i0ToM1, i0ToI0, loopScal, exitScal
//   toks     read tokens (nReads x maxLen, 1-based) + lens (nReads)
//   work     per-read scratch, workPerRead f32 each
//   out      per-read log-likelihood

struct FusedParams {
  st : u32,       // transducer states
  k : u32,        // profile nodes
  nOut : u32,     // output tokens incl. epsilon
  flags : u32,    // bit0 plan7, bit1 local, bit2 multihit, bit3 maxplus
  nHit : u32,
  maxLen : u32,
  nReads : u32,
  workPerRead : u32,
};

@group(0) @binding(0) var<uniform> P : FusedParams;
@group(0) @binding(1) var<storage, read> tens : array<f32>;
@group(0) @binding(2) var<storage, read> scal : array<f32>;
@group(0) @binding(3) var<storage, read> toks : array<u32>;
@group(0) @binding(4) var<storage, read> lens : array<u32>;
@group(0) @binding(5) var<storage, read_write> work : array<f32>;
@group(0) @binding(6) var<storage, read_write> outLL : array<f32>;

fn fcombine(a : f32, b : f32) -> f32 {
  if ((P.flags & 8u) != 0u) { return max(a, b); }
  return lse(a, b);
}

// ---- packed tensor offsets (all (St, St) blocks)
fn sq() -> u32 { return P.st * P.st; }
fn offClosure() -> u32 { return 0u; }
fn offAbsN() -> u32 { return sq(); }
fn offStarFlank() -> u32 { return 2u * sq(); }
fn offAbsI0() -> u32 { return 3u * sq(); }
fn offStarI0() -> u32 { return 4u * sq(); }
fn offEmN(y : u32) -> u32 { return (5u + y) * sq(); }
fn offEmI0(y : u32) -> u32 { return (5u + P.nOut + y) * sq(); }
fn offTout(y : u32) -> u32 { return (5u + 2u * P.nOut + y) * sq(); }
fn offAbsM(j : u32) -> u32 { return (5u + 3u * P.nOut + j) * sq(); }
fn offAbsI(j : u32) -> u32 { return (5u + 3u * P.nOut + P.k + j) * sq(); }
fn offStarI(j : u32) -> u32 {
  return (5u + 3u * P.nOut + 2u * P.k + j) * sq();
}
fn offEmM(j : u32, y : u32) -> u32 {
  return (5u + 3u * P.nOut + 3u * P.k + j * P.nOut + y) * sq();
}
fn offEmI(j : u32, y : u32) -> u32 {
  return (5u + 3u * P.nOut + 3u * P.k + (P.k + j) * P.nOut + y) * sq();
}

// ---- packed scalar offsets
fn sEntry(k : u32) -> f32 { return scal[k]; }
fn sNode(row : u32, j : u32) -> f32 {        // row: 0 mToM .. 6 dToD
  return scal[P.k + 1u + row * P.k + j];
}
fn sFlat(i : u32) -> f32 {                   // 0 bToM1 .. 6 exitScal
  return scal[P.k + 1u + 7u * P.k + i];
}

// ---- per-read scratch vector slots (St floats each).
// layout: base[nBase] | next[nBase] | row[nRow] | tmp[2]
fn nBase() -> u32 { return 5u * P.k + 12u; }
fn nRow() -> u32 { return 5u * P.k + 17u; }
// base keys 0..11: B E I0 Ix0 S N Nx C Cx J Jx T; then M Mx I Ix D per j
fn baseSlot(read : u32, key : u32) -> u32 {
  return read * P.workPerRead + key * P.st;
}
fn nextSlot(read : u32, key : u32) -> u32 {
  return read * P.workPerRead + (nBase() + key) * P.st;
}
fn baseNode(key5 : u32, j : u32) -> u32 {    // key5: 0 M 1 Mx 2 I 3 Ix 4 D
  return 12u + key5 * P.k + j;
}
// row keys: 0 aB 1 aE 2 aS 3 aN 4 aNx 5 sNx 6 aI0 7 sIx0 8 aC 9 aCx
//          10 sCx 11 aJ 12 sJx 13 vJx 14 aT 15 vJxPrev 16 ext; then
//          aM sMx aI sIx aD per j
fn rowSlot(read : u32, key : u32) -> u32 {
  return read * P.workPerRead + (2u * nBase() + key) * P.st;
}
fn rowNode(key5 : u32, j : u32) -> u32 {
  return 17u + key5 * P.k + j;
}
fn tmpSlot(read : u32, which : u32) -> u32 {
  return read * P.workPerRead + (2u * nBase() + nRow() + which) * P.st;
}

fn vFill(off : u32, v : f32) {
  for (var s = 0u; s < P.st; s = s + 1u) { work[off + s] = v; }
}

fn vCopy(dst : u32, src : u32) {
  for (var s = 0u; s < P.st; s = s + 1u) { work[dst + s] = work[src + s]; }
}

// dst = dst (+) (src + logw)
fn accScaled(dst : u32, src : u32, logw : f32) {
  if (logw <= NEG_INF / 2.0) { return; }
  for (var s = 0u; s < P.st; s = s + 1u) {
    work[dst + s] = fcombine(work[dst + s], work[src + s] + logw);
  }
}

// dst = dst (+) (src (x) tens[matOff])
fn accMat(dst : u32, src : u32, matOff : u32) {
  for (var d = 0u; d < P.st; d = d + 1u) {
    var acc : f32 = NEG_INF;
    for (var s = 0u; s < P.st; s = s + 1u) {
      acc = fcombine(acc, work[src + s] + tens[matOff + s * P.st + d]);
    }
    work[dst + d] = fcombine(work[dst + d], acc);
  }
}

// one row solve + (optionally) advance with token y; y == 0 means the
// final row (no advance). Ports solveRow + advanceRow verbatim.
fn solveRow(read : u32) {
  let plan7 = (P.flags & 1u) != 0u;
  let localm = (P.flags & 2u) != 0u;
  let multihit = (P.flags & 4u) != 0u;
  var sweeps : u32 = 1u;
  if (plan7 && multihit) { sweeps = P.nHit; }
  vFill(rowSlot(read, 15u), NEG_INF);                 // vJxPrev
  for (var sweep = 0u; sweep < sweeps; sweep = sweep + 1u) {
    // flanking prefix: S -> N loop -> B
    vCopy(rowSlot(read, 0u), baseSlot(read, 0u));     // aB = base.B
    if (plan7) {
      vCopy(rowSlot(read, 2u), baseSlot(read, 4u));   // aS = base.S
      let ext = tmpSlot(read, 0u);
      vCopy(ext, baseSlot(read, 6u));                 // base.Nx
      accScaled(ext, rowSlot(read, 2u), 0.0);         // S -> Nx
      accMat(ext, baseSlot(read, 5u), offAbsN());     // base.N absorbed
      vFill(rowSlot(read, 4u), NEG_INF);              // aNx
      accMat(rowSlot(read, 4u), ext, offStarFlank());
      vCopy(rowSlot(read, 3u), baseSlot(read, 5u));   // aN = base.N
      accScaled(rowSlot(read, 3u), rowSlot(read, 4u), sFlat(5u));
      vCopy(rowSlot(read, 5u), baseSlot(read, 6u));   // sNx = base.Nx
      accMat(rowSlot(read, 5u), rowSlot(read, 3u), offAbsN());
      accScaled(rowSlot(read, 0u), rowSlot(read, 4u), sFlat(6u));
      if (multihit) {
        accScaled(rowSlot(read, 0u), rowSlot(read, 15u), sFlat(6u));
      }
    }
    // node-0 insert (global core only)
    vFill(rowSlot(read, 6u), NEG_INF);                // aI0
    vFill(rowSlot(read, 7u), NEG_INF);                // sIx0
    if (!plan7 && !localm) {
      let ext = tmpSlot(read, 0u);
      vCopy(ext, baseSlot(read, 2u));                 // base.I0
      accScaled(ext, rowSlot(read, 0u), sFlat(1u));   // B -> I0
      accScaled(ext, baseSlot(read, 3u), sFlat(4u));  // Ix0 loop arrival
      accMat(rowSlot(read, 6u), ext, offStarI0());
      vCopy(rowSlot(read, 7u), baseSlot(read, 3u));
      accMat(rowSlot(read, 7u), rowSlot(read, 6u), offAbsI0());
    }
    // core chain
    vCopy(rowSlot(read, 1u), baseSlot(read, 1u));     // aE = base.E
    for (var j = 0u; j < P.k; j = j + 1u) {
      let aM = rowSlot(read, rowNode(0u, j));
      vCopy(aM, baseSlot(read, baseNode(0u, j)));
      if (plan7 || localm) {
        accScaled(aM, rowSlot(read, 0u), sEntry(j + 1u));
      } else if (j == 0u) {
        accScaled(aM, rowSlot(read, 0u), sFlat(0u));
        accScaled(aM, rowSlot(read, 7u), sFlat(3u));
      }
      if (j > 0u) {
        accScaled(aM, rowSlot(read, rowNode(1u, j - 1u)),
                  sNode(0u, j - 1u));
        accScaled(aM, rowSlot(read, rowNode(3u, j - 1u)),
                  sNode(3u, j - 1u));
        accScaled(aM, rowSlot(read, rowNode(4u, j - 1u)),
                  sNode(5u, j - 1u));
      }
      let sMx = rowSlot(read, rowNode(1u, j));
      vCopy(sMx, baseSlot(read, baseNode(1u, j)));
      accMat(sMx, aM, offAbsM(j));
      let aD = rowSlot(read, rowNode(4u, j));
      vCopy(aD, baseSlot(read, baseNode(4u, j)));
      if (j == 0u) {
        if (!plan7 && !localm) {
          accScaled(aD, rowSlot(read, 0u), sFlat(2u));
        }
      } else {
        accScaled(aD, rowSlot(read, rowNode(1u, j - 1u)),
                  sNode(2u, j - 1u));
        accScaled(aD, rowSlot(read, rowNode(4u, j - 1u)),
                  sNode(6u, j - 1u));
      }
      let ext = tmpSlot(read, 0u);
      vCopy(ext, baseSlot(read, baseNode(2u, j)));    // base.I
      accScaled(ext, sMx, sNode(1u, j));              // m -> i
      accScaled(ext, baseSlot(read, baseNode(3u, j)), sNode(4u, j));
      let aI = rowSlot(read, rowNode(2u, j));
      vFill(aI, NEG_INF);
      accMat(aI, ext, offStarI(j));
      let sIx = rowSlot(read, rowNode(3u, j));
      vCopy(sIx, baseSlot(read, baseNode(3u, j)));
      accMat(sIx, aI, offAbsI(j));
      if (plan7 || localm) {
        accScaled(rowSlot(read, 1u), aM, 0.0);
        accScaled(rowSlot(read, 1u), aD, 0.0);
      }
      if (j == P.k - 1u) {
        if (!(plan7 || localm)) {
          accScaled(rowSlot(read, 1u), sMx, sNode(0u, j));
          accScaled(rowSlot(read, 1u), aD, sNode(5u, j));
        }
        accScaled(rowSlot(read, 1u), sIx, sNode(3u, j));
      }
    }
    // flanking suffix: E -> C loop -> T (and E -> J loop, multihit)
    vFill(rowSlot(read, 13u), NEG_INF);               // vJx
    if (plan7) {
      var eToC : f32 = 0.0;
      if (multihit) { eToC = log(0.5); }
      let ext = tmpSlot(read, 0u);
      vCopy(ext, baseSlot(read, 8u));                 // base.Cx
      accScaled(ext, rowSlot(read, 1u), eToC);
      accMat(ext, baseSlot(read, 7u + 0u), offAbsN());// base.C absorbed
      vFill(rowSlot(read, 9u), NEG_INF);              // aCx
      accMat(rowSlot(read, 9u), ext, offStarFlank());
      vCopy(rowSlot(read, 8u), baseSlot(read, 7u));   // aC = base.C
      accScaled(rowSlot(read, 8u), rowSlot(read, 9u), sFlat(5u));
      vCopy(rowSlot(read, 10u), baseSlot(read, 8u));  // sCx = base.Cx
      accMat(rowSlot(read, 10u), rowSlot(read, 8u), offAbsN());
      vCopy(rowSlot(read, 14u), baseSlot(read, 11u)); // aT = base.T
      accScaled(rowSlot(read, 14u), rowSlot(read, 9u), sFlat(6u));
      if (multihit) {
        let extJ = tmpSlot(read, 1u);
        vCopy(extJ, baseSlot(read, 10u));             // base.Jx
        accScaled(extJ, rowSlot(read, 1u), log(0.5));
        accMat(extJ, baseSlot(read, 9u), offAbsN());  // base.J absorbed
        accMat(rowSlot(read, 13u), extJ, offStarFlank());
        vCopy(rowSlot(read, 11u), baseSlot(read, 9u));
        accScaled(rowSlot(read, 11u), rowSlot(read, 13u), sFlat(5u));
        vCopy(rowSlot(read, 12u), baseSlot(read, 10u));
        accMat(rowSlot(read, 12u), rowSlot(read, 11u), offAbsN());
      }
    }
    vCopy(rowSlot(read, 15u), rowSlot(read, 13u));    // vJxPrev = vJx
  }
}

// next-base construction for output token y (advanceRow): transducer
// out-only moves read the SYNC family; paired emissions read ALL.
fn advanceRow(read : u32, y : u32) {
  let plan7 = (P.flags & 1u) != 0u;
  let localm = (P.flags & 2u) != 0u;
  let multihit = (P.flags & 4u) != 0u;
  for (var key = 0u; key < nBase(); key = key + 1u) {
    vFill(nextSlot(read, key), NEG_INF);
  }
  let out = offTout(y);
  accMat(nextSlot(read, 0u), baseSlot(read, 0u), out);     // B
  accMat(nextSlot(read, 1u), baseSlot(read, 1u), out);     // E
  for (var j = 0u; j < P.k; j = j + 1u) {
    accMat(nextSlot(read, baseNode(0u, j)),
           baseSlot(read, baseNode(0u, j)), out);
    accMat(nextSlot(read, baseNode(1u, j)),
           rowSlot(read, rowNode(1u, j)), out);
    accMat(nextSlot(read, baseNode(2u, j)),
           baseSlot(read, baseNode(2u, j)), out);
    accMat(nextSlot(read, baseNode(3u, j)),
           rowSlot(read, rowNode(3u, j)), out);
    accMat(nextSlot(read, baseNode(4u, j)),
           baseSlot(read, baseNode(4u, j)), out);
    accMat(nextSlot(read, baseNode(1u, j)),
           rowSlot(read, rowNode(0u, j)), offEmM(j, y));
    accMat(nextSlot(read, baseNode(3u, j)),
           rowSlot(read, rowNode(2u, j)), offEmI(j, y));
  }
  if (!plan7 && !localm) {
    accMat(nextSlot(read, 2u), baseSlot(read, 2u), out);   // I0
    accMat(nextSlot(read, 3u), rowSlot(read, 7u), out);    // Ix0 sync
    accMat(nextSlot(read, 3u), rowSlot(read, 6u), offEmI0(y));
  }
  if (plan7) {
    accMat(nextSlot(read, 4u), baseSlot(read, 4u), out);   // S
    accMat(nextSlot(read, 5u), baseSlot(read, 5u), out);   // N
    accMat(nextSlot(read, 6u), rowSlot(read, 5u), out);    // Nx sync
    accMat(nextSlot(read, 7u), baseSlot(read, 7u), out);   // C
    accMat(nextSlot(read, 8u), rowSlot(read, 10u), out);   // Cx sync
    accMat(nextSlot(read, 11u), baseSlot(read, 11u), out); // T
    accMat(nextSlot(read, 6u), rowSlot(read, 3u), offEmN(y));
    accMat(nextSlot(read, 8u), rowSlot(read, 8u), offEmN(y));
    if (multihit) {
      accMat(nextSlot(read, 9u), baseSlot(read, 9u), out);
      accMat(nextSlot(read, 10u), rowSlot(read, 12u), out);
      accMat(nextSlot(read, 10u), rowSlot(read, 11u), offEmN(y));
    }
  }
  // next becomes base
  for (var key = 0u; key < nBase(); key = key + 1u) {
    vCopy(baseSlot(read, key), nextSlot(read, key));
  }
}

fn runRead(read : u32) {
  let plan7 = (P.flags & 1u) != 0u;
  // init base: closed transducer start vector into S (plan7) or B (core)
  for (var key = 0u; key < nBase(); key = key + 1u) {
    vFill(baseSlot(read, key), NEG_INF);
  }
  var startKey : u32 = 0u;
  if (plan7) { startKey = 4u; }
  for (var s = 0u; s < P.st; s = s + 1u) {
    work[baseSlot(read, startKey) + s] = tens[offClosure() + s];
  }
  solveRow(read);
  let len = lens[read];
  for (var o = 0u; o < len; o = o + 1u) {
    let y = toks[read * P.maxLen + o];
    advanceRow(read, y);
    solveRow(read);
  }
  var readKey : u32 = 1u;                     // aE
  if (plan7) { readKey = 14u; }               // aT
  outLL[read] = work[rowSlot(read, readKey) + P.st - 1u];
}
