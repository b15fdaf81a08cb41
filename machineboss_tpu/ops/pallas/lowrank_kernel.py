"""Closure-folded, liveness-pruned, min-rank-factored Pallas wavefront.

The flagship prot2dna workload (ref Makefile:228-232; BASELINE.json metric
"Forward, prot2dna composed") is a structured 132-state machine whose
per-cell DP cost in the generic/factored kernels is dominated by three
sources of waste this kernel removes:

1. **Closure matmul** — the silent-closure (S, S) product applied per cell
   is folded into each class tensor on the host (A_class @ C); the
   per-destination factorization ranks are provably preserved (rank of
   M @ C <= rank of M, C invertible), so the fold is free.
2. **State liveness pruning** — after closure folding, states that can
   never hold probability mass (no symbol-incoming and not silently
   reachable from start) or never feed the readout are removed by a
   host-side fixpoint. prot2dna: 132 -> 100 alive states, which drops the
   MXU contraction dimension from a 131->256 lane pad to a single 128
   tile (2x fewer real MACs by itself). The pruned DP is exactly
   equivalent (pruned states carry zero or feed nothing).
3. **Min-rank factorization side** — each class tensor
   A[t, s, d] (token, src, dst) admits two exact low-rank forms:
     dest:  A[t, s, d] = sum_r T_r[s, d] * E_r[t, d]   (scale after dot)
     src:   A[t, s, d] = sum_r T_r[s, d] * E_r[t, s]   (scale before dot)
   found by per-column SVD (pallas/factorize.py). The side with the
   smaller rank wins per class: prot2dna's output-emitting class is
   rank 2 source-side (vs 4 dest-side), its input-consuming class rank 1
   dest-side (vs 20 source-side). Reference anchor for the sparsity
   exploited: ref src/eval.h:66-73 per-state incoming blocking.

Token-scale vectors sc = E^T onehot are the remaining per-cell cost.
Classes whose token is static per lane (the input-consuming class: a
cell's x token never changes across diagonals) get sc precomputed OUTSIDE
the kernel once per batch; dynamic classes (output/diag) build sc
in-kernel from the streamed one-hots with T broadcast-FMAs (T = alphabet
size, tiny) or a split mm2 dot.

Slab layout, scaled-probability carry, two-diagonals-per-grid-step and
rescale cadence are identical to wavefront_kernel._merged_kernel.
Optional sequence chaining (uniform lengths, ~1.3x occupancy on the
65x193 prot2dna lattice) reuses the _chained_kernel bookkeeping: per-lane
(f, k) int32 scratch, in-kernel one-hot builds, staggered readout rows.
"""

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .factorize import factorize_token_tensor

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class _ClassSpec:
    name: str     # 'up' | 'left' | 'diag'
    side: str     # 'src' | 'dest'
    rank: int
    n_tok: int
    static_sc: bool  # sc precomputed outside the kernel (plain mode only)


def prepare_lowrank(a_diag, a_left, a_up, closure, chained=False):
    """Host prep: fold closure, prune states, factor each class min-rank.

    Returns (plan, mats) where plan is a dict with Sa/idx/classes/c0 and
    mats the list of (M (f32), E (f32)) device matrices per class, in
    class order (up, left, diag skipping absent classes)."""
    def pz(a):
        a64 = np.asarray(a, np.float64)
        return np.where(a64 > -1e29, np.exp(np.minimum(a64, 700.0)), 0.0)

    dz, lz, uz, cz = pz(a_diag), pz(a_left), pz(a_up), pz(closure)
    Ti, To = dz.shape[0], dz.shape[1]
    S = cz.shape[0]
    # fold closure into every class (dest side): A~ = A @ C
    uzc = np.einsum("tsd,de->tse", uz, cz) if uz.size else uz
    lzc = np.einsum("tsd,de->tse", lz, cz) if lz.size else lz
    dzc = (np.einsum("xysd,de->xyse", dz, cz).reshape(Ti * To, S, S)
           if dz.size else dz.reshape(Ti * To, S, S))
    c0 = cz[0].copy()                          # init row C[0, :]

    # liveness fixpoint over the folded system; readout state forced alive
    alive = np.ones(S, bool)
    changed = True
    while changed:
        changed = False
        for s in range(S):
            if not alive[s]:
                continue
            has_in = (c0[s] > 0
                      or (uzc.size and uzc[:, alive, s].sum() > 0)
                      or (lzc.size and lzc[:, alive, s].sum() > 0)
                      or (dzc.size and dzc[:, alive, s].sum() > 0))
            feeds = (s == S - 1
                     or (uzc.size and uzc[:, s, alive].sum() > 0)
                     or (lzc.size and lzc[:, s, alive].sum() > 0)
                     or (dzc.size and dzc[:, s, alive].sum() > 0))
            if not (has_in and feeds):
                alive[s] = False
                changed = True
    idx = np.where(alive)[0]
    Sa = len(idx)
    sel = np.ix_(idx, idx)

    classes = []
    mats = []
    for name, tensor, n_tok in (("up", uzc, To), ("left", lzc, Ti),
                                ("diag", dzc, Ti * To)):
        if not tensor.size or not tensor.any():
            continue
        a = tensor[:, idx, :][:, :, idx]       # (T, Sa, Sa) pruned
        td, ed, rd = factorize_token_tensor(a)
        ts, es, rs = factorize_token_tensor(np.transpose(a, (0, 2, 1)))
        if rs < rd:
            side, R = "src", rs
            # A[t,s,d] = sum_r ts[r,d,s] * es[r,t,s]
            # M[d, (r,s)] = ts[r,d,s]; E[(r,s), t] = es[r,t,s]
            M = np.ascontiguousarray(
                np.transpose(ts, (1, 0, 2)).reshape(Sa, R * Sa))
            E = np.ascontiguousarray(
                np.transpose(es, (0, 2, 1)).reshape(R * Sa, n_tok))
        else:
            side, R = "dest", rd
            # A[t,s,d] = sum_r td[r,s,d] * ed[r,t,d]
            # M[(r,d), s] = td[r,s,d]; E[(r,d), t] = ed[r,t,d]
            M = np.ascontiguousarray(
                np.transpose(td, (0, 2, 1)).reshape(R * Sa, Sa))
            E = np.ascontiguousarray(
                np.transpose(ed, (0, 2, 1)).reshape(R * Sa, n_tok))
        # static sc: token never changes for a lane across diagonals.
        # Only the input-consuming (left) class in plain mode qualifies.
        static_sc = (name == "left") and not chained
        classes.append(_ClassSpec(name, side, R, n_tok, static_sc))
        mats.append((M.astype(np.float32), E.astype(np.float32)))

    plan = {"Sa": Sa, "idx": idx, "classes": tuple(classes),
            "c0": np.ascontiguousarray(c0[idx].reshape(Sa, 1))
            .astype(np.float32), "sel": sel}
    return plan, mats


def lowrank_cost_ratio(a_diag, a_left, a_up, closure):
    """Estimated padded-MAC cost of the lowrank kernel relative to the
    merged wide-dot kernel (both per lane per diagonal). Used by dispatch
    to auto-route structured machines (profile HMMs, GeneWise
    compositions, PSWs) to the lowrank kernel; full-rank random machines
    come out >= 1 and stay on merged. Returns (ratio, plan)."""
    def pad(x, m):
        return ((x + m - 1) // m) * m

    Ti, To = a_diag.shape[0], a_diag.shape[1]
    S = closure.shape[0]
    plan, _ = prepare_lowrank(a_diag, a_left, a_up, closure)
    Sa = plan["Sa"]
    lr = 0
    for cs in plan["classes"]:
        if cs.side == "src":
            lr += 3 * pad(Sa, 8) * pad(cs.rank * Sa, 128)
        else:
            lr += 3 * pad(cs.rank * Sa, 8) * pad(Sa, 128)
        if not cs.static_sc and cs.n_tok > 8:
            lr += 2 * pad(cs.rank * Sa, 8) * pad(cs.n_tok, 128)
    # merged unified: one wide dot (n_blk*S rows) against the stacked
    # [up S][diag Ti*S][left Ti*S] columns (class-present terms only)
    has_up = bool(np.any(np.asarray(a_up) > -1e29)) if a_up.size else False
    has_left = bool(np.any(np.asarray(a_left) > -1e29)) \
        if a_left.size else False
    has_diag = bool(np.any(np.asarray(a_diag) > -1e29)) \
        if a_diag.size else False
    unify = has_left and (has_up or has_diag)
    n_blk = To + 1 if unify else max(To, 1)
    cols = (S if has_up else 0) + (Ti * S if has_diag else 0) \
        + (Ti * S if (has_left and unify) else 0)
    merged = 3 * pad(n_blk * S, 8) * pad(max(cols, 1), 128)
    if has_left and not unify:
        merged += 3 * pad(S, 8) * pad(Ti * S, 128)
    return (lr / merged if merged else 1.0), plan


def _lowrank_kernel(spec, *args):
    """spec: dict of static config. Plain and chained modes share the
    per-chunk class-term core; mode differences are Python-level."""
    Ti, To, S = spec["Ti"], spec["To"], spec["S"]
    B, W, Li, Lo = spec["B"], spec["W"], spec["Li"], spec["Lo"]
    n_chunks, split = spec["n_chunks"], spec["split"]
    precision, rescale_every = spec["precision"], spec["rescale_every"]
    classes = spec["classes"]
    chained = spec["chained"]
    n_chain, sigma = spec["n_chain"], spec["sigma"]
    sc_fma = spec["sc_fma"]

    it_refs = iter(args)
    cmats = []
    for cs in classes:
        cmats.append((next(it_refs), next(it_refs),   # M_hi, M_lo
                      next(it_refs), next(it_refs)))  # E_hi, E_lo
    c0_ref = next(it_refs)
    scx_ref = next(it_refs) if spec["has_static_sc"] else None
    if chained:
        tok_ref = next(it_refs)
        icell_ref = next(it_refs)
    else:
        xoh_ref = next(it_refs) if spec["need_xoh"] else None
        ydiag_ref = next(it_refs) if spec["need_ydiag"] else None
        icell_ref = next(it_refs)
        dfin_ref = next(it_refs)
    res_ref = next(it_refs)
    slabA, slabB, mA, mB = (next(it_refs), next(it_refs),
                            next(it_refs), next(it_refs))
    if chained:
        floc, kidx = next(it_refs), next(it_refs)

    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]
    dn = (((1,), (0,)), ((), ()))

    def mm3(hi_ref, lo_ref, x):
        if not split:
            return jax.lax.dot_general(hi_ref[:], x, dn,
                                       precision=precision,
                                       preferred_element_type=jnp.float32)
        xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
        xlo = x - xhi
        dd = jax.lax.dot_general
        return (dd(hi_ref[:], xhi, dn, preferred_element_type=jnp.float32)
                + dd(hi_ref[:], xlo, dn, preferred_element_type=jnp.float32)
                + dd(lo_ref[:], xhi, dn,
                     preferred_element_type=jnp.float32))

    def build_sc(cs, e_hi_ref, e_lo_ref, oh):
        """sc (R*S, chunk) = E @ onehot. One-hot operands are exact, so a
        2-dot hi/lo split suffices; for tiny alphabets T broadcast-FMAs
        on the VPU beat the padded-contraction dot."""
        if sc_fma and cs.n_tok <= 8:
            e_full = e_hi_ref[:] + e_lo_ref[:]        # (R*S, T) register
            acc = e_full[:, 0:1] * oh[0:1, :]
            for t in range(1, cs.n_tok):
                acc += e_full[:, t:t + 1] * oh[t:t + 1, :]
            return acc
        dd = jax.lax.dot_general
        if not split:
            return dd(e_hi_ref[:], oh, dn, precision=precision,
                      preferred_element_type=jnp.float32)
        return (dd(e_hi_ref[:], oh, dn, preferred_element_type=jnp.float32)
                + dd(e_lo_ref[:], oh, dn,
                     preferred_element_type=jnp.float32))

    def readout(p_ref):
        return p_ref[S - 1:S, :]

    def init():
        valid0 = i_cells == 0
        init_mask = valid0.astype(jnp.float32)
        slabB[:] = c0_ref[:] * init_mask
        mB[:] = jnp.where(valid0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        if chained:
            floc[:] = -i_cells
            kidx[:] = jnp.zeros_like(kidx)
            res_ref[:] = jnp.full_like(res_ref, NEG_INF)
        else:
            endp = readout(slabB)
            val0 = jnp.where(endp > 0,
                             jnp.log(jnp.maximum(endp, 1e-37)),
                             jnp.full_like(mB, NEG_INF))
            res_ref[:] = jnp.where((dfin_ref[:] == 0) & valid0, val0,
                                   jnp.full_like(mB, NEG_INF))

    def body(d, xoh_full, yoh_full, init_now, valid,
             p1_ref, m1_ref, p2_ref, m2_ref):
        """xoh_full (Ti, cells) / yoh_full (To, cells) one-hot rows for
        this diagonal (None when no class needs them)."""
        boundary = i_cells > 0

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            m1s = m2s = None
            cands = []
            for cs in classes:
                if cs.name == "up":
                    cands.append(m1c)
                elif cs.name == "left" and m1s is None:
                    m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                    cands.append(m1s)
                elif cs.name == "diag":
                    m2s = jnp.where(bnd, rollc(m2_ref[:, lo_c:hi_c]),
                                    NEG_INF)
                    cands.append(m2s)
            if not cands:          # degenerate: no symbol transitions
                mu_parts.append(jnp.full((1, chunk), NEG_INF, jnp.float32))
                p2_ref[:, lo_c:hi_c] = jnp.zeros((S, chunk), jnp.float32)
                continue
            mu_c = cands[0]
            for extra in cands[1:]:
                mu_c = jnp.maximum(mu_c, extra)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            cur = None
            for cs, (m_hi, m_lo, e_hi, e_lo) in zip(classes, cmats):
                if cs.name == "up":
                    mprev = m1c
                    p_op = p1_ref[:, lo_c:hi_c]
                elif cs.name == "left":
                    mprev = m1s
                    p_op = jnp.where(bnd, rollc(p1_ref[:, lo_c:hi_c]), 0.0)
                else:
                    mprev = m2s
                    p_op = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                w = jnp.exp(mprev - mu_safe) * (mprev > NEG_INF / 2)

                if cs.static_sc:
                    sc = scx_ref[:, lo_c:hi_c]
                else:
                    if cs.name == "up":
                        oh = yoh_full[:, lo_c:hi_c]
                    elif cs.name == "left":
                        oh = xoh_full[:, lo_c:hi_c]
                    else:
                        xc = xoh_full[:, lo_c:hi_c]
                        yc = yoh_full[:, lo_c:hi_c]
                        rows = [xc[ti:ti + 1, :] * yc for ti in range(Ti)]
                        oh = jnp.concatenate(rows, axis=0)
                    sc = build_sc(cs, e_hi, e_lo, oh)

                if cs.side == "src":
                    scw = sc * w
                    z = jnp.concatenate(
                        [p_op * scw[r * S:(r + 1) * S, :]
                         for r in range(cs.rank)], axis=0) \
                        if cs.rank > 1 else p_op * scw
                    term = mm3(m_hi, m_lo, z)
                else:
                    out = mm3(m_hi, m_lo, p_op * w)
                    term = out[0:S, :] * sc[0:S, :]
                    for r in range(1, cs.rank):
                        term += (out[r * S:(r + 1) * S, :]
                                 * sc[r * S:(r + 1) * S, :])
                cur = term if cur is None else cur + term
            if cur is None:
                cur = jnp.zeros((S, chunk), jnp.float32)
            p2_ref[:, lo_c:hi_c] = cur
        mu = jnp.concatenate(mu_parts, axis=1)

        m_new = jnp.where(valid, mu, NEG_INF)
        m2_ref[:] = m_new

        # fire on TWO consecutive diagonals so BOTH parities get
        # rescaled: diagonal-class mass lives entirely on one parity
        # (cells (j, j) sit at d = start + 2j), and a chain starting on
        # an odd diagonal would otherwise NEVER be renormalized — its
        # probabilities decay until exp underflows f32 at |path log|
        # ~87.9 nats (measured: a ragged chained window starting at
        # d=113 returned -inf exactly when the f64 oracle crossed -87.9)
        @pl.when(d % rescale_every <= 1)
        def _rescale():
            curv = p2_ref[:]
            mx = jnp.max(curv, axis=0, keepdims=True)
            has = (mx > 0) & valid
            p2_ref[:] = jnp.where(has, curv / jnp.maximum(mx, 1e-37), 0.0)
            m2_ref[:] = jnp.where(has,
                                  m_new + jnp.log(jnp.maximum(mx, 1e-37)),
                                  NEG_INF)

        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        fin = (dfin_ref[:] == d) & valid
        res_ref[:] = jnp.where(fin, val, res_ref[:])

    def dispatch(d, even_first):
        """Build per-diagonal one-hots and masks, then run body."""
        p1_ref, m1_ref, p2_ref, m2_ref = (
            (slabA, mA, slabB, mB) if even_first else (slabB, mB, slabA, mA))
        if chained:
            # advance per-lane chain coordinate (see _chained_kernel)
            f_new = floc[:] + 1
            wrapped = f_new == sigma
            f_new = jnp.where(wrapped, 0, f_new)
            k_new = kidx[:] + wrapped.astype(jnp.int32)
            floc[:] = f_new
            kidx[:] = k_new
            real = k_new < n_chain
            valid = (f_new >= 0) & (f_new <= Lo) & (i_cells <= Li) & real
            init_now = (f_new == 0) & (i_cells == 0) & real
            tk = tok_ref[0, 0 if even_first else 1]
            xtok = tk[0:1, :].astype(jnp.float32)
            ytok = tk[1:2, :].astype(jnp.float32)
            xoh_full = (xtok == jax.lax.broadcasted_iota(
                jnp.int32, (Ti, cells), 0).astype(jnp.float32)) \
                .astype(jnp.float32) if spec["need_xoh"] else None
            yoh_full = (ytok == jax.lax.broadcasted_iota(
                jnp.int32, (To, cells), 0).astype(jnp.float32)) \
                .astype(jnp.float32) if spec["need_ydiag"] else None
            _body_chained(d, xoh_full, yoh_full, init_now, valid, f_new,
                          p1_ref, m1_ref, p2_ref, m2_ref)
        else:
            valid = ((i_cells <= d) & (i_cells >= d - Lo)
                     & (i_cells <= Li))
            xoh_full = xoh_ref[:] if spec["need_xoh"] else None
            yoh_full = (ydiag_ref[0, 0 if even_first else 1]
                        if spec["need_ydiag"] else None)
            body(d, xoh_full, yoh_full, None, valid,
                 p1_ref, m1_ref, p2_ref, m2_ref)

    def _body_chained(d, xoh_full, yoh_full, init_now, valid, f_new,
                      p1_ref, m1_ref, p2_ref, m2_ref):
        # same core as body(), plus chain-start reseeding and the
        # staggered per-chain readout capture
        boundary = i_cells > 0

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            m1s = m2s = None
            cands = []
            for cs in classes:
                if cs.name == "up":
                    cands.append(m1c)
                elif cs.name == "left" and m1s is None:
                    m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                    cands.append(m1s)
                elif cs.name == "diag":
                    m2s = jnp.where(bnd, rollc(m2_ref[:, lo_c:hi_c]),
                                    NEG_INF)
                    cands.append(m2s)
            if not cands:
                mu_parts.append(jnp.full((1, chunk), NEG_INF, jnp.float32))
                p2_ref[:, lo_c:hi_c] = jnp.zeros((S, chunk), jnp.float32)
                continue
            mu_c = cands[0]
            for extra in cands[1:]:
                mu_c = jnp.maximum(mu_c, extra)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            cur = None
            for cs, (m_hi, m_lo, e_hi, e_lo) in zip(classes, cmats):
                if cs.name == "up":
                    mprev = m1c
                    p_op = p1_ref[:, lo_c:hi_c]
                elif cs.name == "left":
                    mprev = m1s
                    p_op = jnp.where(bnd, rollc(p1_ref[:, lo_c:hi_c]), 0.0)
                else:
                    mprev = m2s
                    p_op = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                w = jnp.exp(mprev - mu_safe) * (mprev > NEG_INF / 2)

                if cs.name == "up":
                    oh = yoh_full[:, lo_c:hi_c]
                elif cs.name == "left":
                    oh = xoh_full[:, lo_c:hi_c]
                else:
                    xc = xoh_full[:, lo_c:hi_c]
                    yc = yoh_full[:, lo_c:hi_c]
                    rows = [xc[ti:ti + 1, :] * yc for ti in range(Ti)]
                    oh = jnp.concatenate(rows, axis=0)
                sc = build_sc(cs, e_hi, e_lo, oh)

                if cs.side == "src":
                    scw = sc * w
                    z = jnp.concatenate(
                        [p_op * scw[r * S:(r + 1) * S, :]
                         for r in range(cs.rank)], axis=0) \
                        if cs.rank > 1 else p_op * scw
                    term = mm3(m_hi, m_lo, z)
                else:
                    out = mm3(m_hi, m_lo, p_op * w)
                    term = out[0:S, :] * sc[0:S, :]
                    for r in range(1, cs.rank):
                        term += (out[r * S:(r + 1) * S, :]
                                 * sc[r * S:(r + 1) * S, :])
                cur = term if cur is None else cur + term
            if cur is None:
                cur = jnp.zeros((S, chunk), jnp.float32)
            cur = jnp.where(init_now[:, lo_c:hi_c], c0_ref[:], cur)
            p2_ref[:, lo_c:hi_c] = cur
        mu = jnp.concatenate(mu_parts, axis=1)
        mu = jnp.where(init_now, 0.0, mu)

        m_new = jnp.where(valid, mu, NEG_INF)
        m2_ref[:] = m_new

        # fire on TWO consecutive diagonals so BOTH parities get
        # rescaled: diagonal-class mass lives entirely on one parity
        # (cells (j, j) sit at d = start + 2j), and a chain starting on
        # an odd diagonal would otherwise NEVER be renormalized — its
        # probabilities decay until exp underflows f32 at |path log|
        # ~87.9 nats (measured: a ragged chained window starting at
        # d=113 returned -inf exactly when the f64 oracle crossed -87.9)
        @pl.when(d % rescale_every <= 1)
        def _rescale():
            curv = p2_ref[:]
            mx = jnp.max(curv, axis=0, keepdims=True)
            has = (mx > 0) & valid
            p2_ref[:] = jnp.where(has, curv / jnp.maximum(mx, 1e-37), 0.0)
            m2_ref[:] = jnp.where(has,
                                  m_new + jnp.log(jnp.maximum(mx, 1e-37)),
                                  NEG_INF)

        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        fin_lane = (i_cells == Li) & (f_new == Lo)
        for k in range(n_chain):
            @pl.when(d == sigma * k + Li + Lo)
            def _cap(k=k):
                res_ref[k:k + 1, :] = jnp.where(fin_lane, val,
                                                res_ref[k:k + 1, :])

    d_even = 2 * s_id
    d_odd = d_even + 1
    n_abs = (sigma * (n_chain - 1) + Li + Lo + 1) if chained \
        else (Li + Lo + 1)

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        dispatch(d_even, True)

    @pl.when(d_odd <= n_abs - 1)
    def _odd_step():
        dispatch(d_odd, False)


def make_lowrank_forward(a_diag, a_left, a_up, closure, B, Li, Lo,
                         precision=jax.lax.Precision.HIGHEST,
                         n_chunks=None, interpret=False, split=True,
                         rescale_every=4, chain=None, sc_fma=True):
    """Build the low-rank wavefront Forward for fixed tensors/shapes.

    Returns fn(in_toks (B,Li), out_toks (B,Lo), in_lens, out_lens) -> (B,)
    log-likelihoods. chain=N packs N staggered equal-length sequences per
    lane window (uniform lengths required; length args ignored)."""
    import math as _math
    Ti, To = a_diag.shape[0], a_diag.shape[1]
    chained = bool(chain) and chain > 1
    n_chain = chain if chained else 1
    if chained:
        assert B % n_chain == 0, "chained: B must be a multiple of chain"
        assert Li >= 1 and Lo >= 1
        B_total, B = B, B // n_chain

    plan, host_mats = prepare_lowrank(a_diag, a_left, a_up, closure,
                                      chained=chained)
    S = plan["Sa"]
    classes = plan["classes"]
    need_xoh = any((cs.name == "left" and not cs.static_sc)
                   or cs.name == "diag" for cs in classes)
    need_ydiag = any(cs.name in ("up", "diag") for cs in classes)
    has_static_sc = any(cs.static_sc for cs in classes)

    W = _round_up(Li + 1, 16)
    cells = B * W
    chunk_base = W * 128 // _math.gcd(W, 128)
    max_chunks = cells // chunk_base
    if max_chunks < 1:
        W = _round_up(Li + 1, 128)
        cells = B * W
        chunk_base = W * 128 // _math.gcd(W, 128)
        max_chunks = cells // chunk_base
    if n_chunks is None:
        biggest_rows = max([cs.rank * S for cs in classes] + [S])
        target = max(1, (biggest_rows * 4 * cells) // (2 << 20))
        n_chunks = 1
        for cand in range(max_chunks, 0, -1):
            if max_chunks % cand == 0 and cand <= target:
                n_chunks = cand
                break
        n_chunks = max(n_chunks, 1)
    chunk0 = cells // n_chunks
    assert chunk0 * n_chunks == cells and chunk0 % 128 == 0 \
        and chunk0 % W == 0, "cells must split into aligned chunks"

    def hi_lo(m):
        hi = np.asarray(jnp.asarray(m, jnp.float32).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        return hi, (m - hi).astype(np.float32)

    dev_mats = []
    e_f32 = []       # per class full-precision E (for static sc precompute)
    for (M, E) in host_mats:
        m_hi, m_lo = hi_lo(M)
        e_hi, e_lo = hi_lo(E)
        if not split:
            m_hi = M
        dev_mats.extend([jnp.array(m_hi), jnp.array(m_lo),
                         jnp.array(e_hi), jnp.array(e_lo)])
        e_f32.append(jnp.array(E))

    c0_dev = jnp.array(plan["c0"])
    i_cell = np.tile(np.arange(W, dtype=np.int32), B)[None, :]
    n_diags = Li + Lo + 1
    sigma = (Lo + 2) if chained else 0
    n_abs = sigma * (n_chain - 1) + Li + Lo + 1 if chained else n_diags
    n_steps = (n_abs + 1) // 2

    spec = {"Ti": Ti, "To": To, "S": S, "B": B, "W": W, "Li": Li, "Lo": Lo,
            "n_chunks": n_chunks, "split": split, "precision": precision,
            "rescale_every": rescale_every, "classes": classes,
            "chained": chained, "n_chain": n_chain, "sigma": sigma,
            "sc_fma": sc_fma, "need_xoh": need_xoh,
            "need_ydiag": need_ydiag, "has_static_sc": has_static_sc}

    kernel = functools.partial(_lowrank_kernel, spec)
    n_mat_refs = len(dev_mats) + 1 + (1 if has_static_sc else 0)

    if chained:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mat_refs + [
            pl.BlockSpec((1, 2, 2, cells), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # token stream
            pl.BlockSpec(memory_space=pltpu.VMEM),     # icell
        ]
        out_shape = jax.ShapeDtypeStruct((n_chain, cells), jnp.float32)
        scratch = [
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.int32),
            pltpu.VMEM((1, cells), jnp.int32),
        ]
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mat_refs
        if need_xoh:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if need_ydiag:
            in_specs.append(pl.BlockSpec((1, 2, To, cells),
                                         lambda s: (s, 0, 0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),   # icell
                     pl.BlockSpec(memory_space=pltpu.VMEM)]   # dfin
        out_shape = jax.ShapeDtypeStruct((1, cells), jnp.float32)
        scratch = [
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
        ]

    call = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    def _prep_plain(in_toks, out_toks, in_lens, out_lens):
        i_idx = jnp.arange(W)
        Li_c = max(Li, 1)
        x_gather = jnp.where(
            (i_idx[None, :] >= 1) & (i_idx[None, :] <= Li),
            in_toks[:, jnp.clip(i_idx - 1, 0, Li_c - 1)] if Li else -1, -1)
        xoh = jax.nn.one_hot(x_gather, Ti, axis=-1, dtype=jnp.float32)
        xoh_t = jnp.transpose(xoh, (2, 0, 1)).reshape(Ti, cells)

        d_idx = jnp.arange(n_diags)
        o_minus_1 = d_idx[:, None] - 1 - i_idx[None, :]
        Lo_c = max(Lo, 1)
        y_gather = jnp.where(
            (o_minus_1[None] >= 0) & (o_minus_1[None] <= Lo - 1),
            (out_toks[:, jnp.clip(o_minus_1, 0, Lo_c - 1)] if Lo
             else -1), -1)
        yoh = jax.nn.one_hot(y_gather, To, axis=-1, dtype=jnp.float32)
        ydiag = jnp.transpose(yoh, (1, 3, 0, 2)).reshape(n_diags, To, cells)

        dfin_cells = jnp.full((1, cells), jnp.int32(-1))
        cell_ids = jnp.arange(B) * W + in_lens.astype(jnp.int32)
        dfin_cells = dfin_cells.at[0, cell_ids].set(
            (in_lens + out_lens).astype(jnp.int32))
        return xoh_t, ydiag, dfin_cells, cell_ids

    if chained:
        @jax.jit
        def forward_chained(in_toks, out_toks, in_lens, out_lens):
            del in_lens, out_lens
            in3 = in_toks.reshape(n_chain, B, Li).astype(jnp.int32)
            out3 = out_toks.reshape(n_chain, B, Lo).astype(jnp.int32)
            T_pad = 2 * n_steps
            t_idx = jnp.arange(T_pad)[:, None]
            i_idx = jnp.arange(W)[None, :]
            tmi = t_idx - i_idx
            k_arr = jnp.floor_divide(tmi, sigma)
            f_arr = tmi - sigma * k_arr
            kc = jnp.clip(k_arr, 0, n_chain - 1)
            okk = (k_arr >= 0) & (k_arr < n_chain)
            ic = jnp.broadcast_to(jnp.clip(i_idx - 1, 0, Li - 1),
                                  (T_pad, W))
            xg = in3[kc, :, ic]
            x_ok = okk & (i_idx >= 1) & (i_idx <= Li)
            xtok = jnp.where(x_ok[:, :, None], xg, -1)
            oc = jnp.clip(f_arr - 1, 0, Lo - 1)
            yg = out3[kc, :, oc]
            y_ok = okk & (f_arr >= 1) & (f_arr <= Lo)
            ytok = jnp.where(y_ok[:, :, None], yg, -1)
            xs = jnp.transpose(xtok, (0, 2, 1)).reshape(T_pad, cells)
            ys = jnp.transpose(ytok, (0, 2, 1)).reshape(T_pad, cells)
            tok = jnp.stack([xs, ys], axis=1) \
                .reshape(n_steps, 2, 2, cells)
            res = call(*dev_mats, c0_dev, tok, jnp.array(i_cell))
            lanes = jnp.arange(B) * W + Li
            return res[:, lanes].reshape(B_total)

        return forward_chained

    @jax.jit
    def forward_plain(in_toks, out_toks, in_lens, out_lens):
        xoh_t, ydiag, dfin_cells, cell_ids = _prep_plain(
            in_toks, out_toks, in_lens, out_lens)
        pad_rows = 2 * n_steps - n_diags
        ydiag2 = jnp.concatenate(
            [ydiag, jnp.zeros((pad_rows, To, cells), jnp.float32)],
            axis=0).reshape(n_steps, 2, To, cells)
        operands = list(dev_mats) + [c0_dev]
        if has_static_sc:
            # static per-cell token scale for the input-consuming class:
            # sc_x = E @ xoh, computed once per batch in full f32
            ci = [i for i, cs in enumerate(classes) if cs.static_sc][0]
            sc_x = jnp.dot(e_f32[ci], xoh_t,
                           precision=jax.lax.Precision.HIGHEST)
            operands.append(sc_x)
        if need_xoh:
            operands.append(xoh_t)
        if need_ydiag:
            operands.append(ydiag2)
        operands += [jnp.array(i_cell), dfin_cells]
        res_cells = call(*operands)
        return res_cells[0, cell_ids]

    return forward_plain
