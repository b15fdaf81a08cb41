"""Pallas TPU wavefront kernel: HBM-free anti-diagonal 2D Forward.

The jnp wavefront engines round-trip every diagonal slab and every
token-selected matmul intermediate through HBM (~100 MB/step), which caps
throughput far below the MXU's. This kernel keeps the two live diagonal
slabs in VMEM scratch that persists across the sequential grid (one grid
step per anti-diagonal), so per-step HBM traffic is zero.

Layout and numerics:
  - slabs are TRANSPOSED (S, cells) with cells = B * W_pad, W_pad
    lane-aligned, so state vectors live on sublanes and cells on lanes —
    no tile padding waste for S=64, and neighbor shifts are lane rolls
  - scaled-probability carry: slab holds p in [0,1] with per-cell log
    scale m (1, cells); all matmuls run in probability space on the MXU,
    exp/log touch only the scale vectors
  - token-conditioned matrices are concatenated row-wise (diag Ti*To*S x S)
    and applied as one wide matmul per neighbor class, with one-hot masks
    selecting each cell's block — full systolic utilization at a
    small-alphabet redundancy factor
  - per-step validity masks zero cells outside the lattice; each
    sequence's readout cell is captured into a (1, cells) result vector
    when its final diagonal is processed
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _merged_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, precision, split,
                   rescale_every, sink, classes,
                   # refs:
                   m_ud_ref, m_left_ref, m_ud_lo_ref, m_left_lo_ref,
                   c0_ref, w_ref, xoh_ref, ydiag_ref, icell_ref, dfin_ref,
                   res_ref,
                   slabA, slabB, mA, mB):
    """Merged-matmul body: the closure matrix is pre-folded into every
    neighbor matrix (cur = C@(up+left+diag) = (C@U)p + (C@L)p_l + (C@D)p_d),
    and the up + diag products share one wide dot:

        out (To*S, chunk) = M_ud (To*S, S + Ti*S) @ [p_up*w_up ; xstack]

    with xstack[(ti,s)] = p_diag*w_diag*xoh[ti]. Both terms select the
    output block by the cell's output token (one pass). The left term has
    no output-token dependence, so it is input-masked instead:

        sl (S, chunk) = M_left (S, Ti*S) @ lstack,
        lstack[(ti,s)] = p_left*w_left*xoh[ti]

    This removes the separate closure matmul and runs the former
    64-deep contractions (up, closure) inside full-depth dots.

    TWO diagonals are processed per grid step (even then odd), halving the
    fixed per-step scheduling cost — measured ~80us/step at B=128-256,
    i.e. ~30-40%% of wall clock at one diagonal per step.

    With `sink=True` the slab holds only ACTIVE states: trailing silent
    sink states (e.g. the End state) are trimmed on the host so S can hit
    an MXU tile multiple (65 -> 64 turns the up+diag dot from 384x384 into
    256x384 padded tiles). The readout value of the trimmed End state is
    recovered as w^T p_active with w = inv(C_aa) @ C[active, End]
    (host-precomputed closure algebra), valid because End has no outgoing
    transitions and only silent incoming ones.

    `classes` = (has_up, has_left, has_diag): compile-time presence of
    each transition class (host-checked tensor sums). Absent classes are
    specialized away — their neighbor rolls, exp weights, stacked z rows
    and matmul columns are never emitted. A fully dense in+out transducer
    (the reference benchmark grid machine) is diag-only: the wide dot
    shrinks from (To*S, S+Ti*S) to (To*S, Ti*S) and the whole left matmul
    disappears (~1.5x fewer MXU FLOPs, plus the w_up/w_left exp/roll VPU
    passes).

    When the left class coexists with up/diag ("unified" mode), the left
    term is folded into the SAME wide dot instead of a second matmul: the
    output gains a (To+1)-th block that carries ONLY the left term (for
    cells with no output token, o = 0), the left columns are replicated
    into every output block, and the per-cell selection uses the extended
    one-hot [yoh, 1-sum(yoh)]. One dot per chunk for every class mix —
    and it sidesteps a Mosaic miscompile observed when the separate left
    matmul coexisted with the wide dot (all-classes machines at L>=200
    returned -1e30 for every pair on the 2026-08 TPU runtime)."""
    has_up, has_left, has_diag = classes
    unify = has_left and (has_up or has_diag)
    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]

    def readout(p_ref):
        if sink:
            return jnp.sum(p_ref[:] * w_ref[:], axis=0, keepdims=True)
        return p_ref[S - 1:S, :]

    def init():
        valid0 = i_cells == 0
        init_mask = valid0.astype(jnp.float32)
        row0 = c0_ref[:]                         # (S, 1) closure^T col 0
        slabB[:] = row0 * init_mask
        mB[:] = jnp.where(valid0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        endp = readout(slabB)
        val0 = jnp.where(endp > 0,
                         jnp.log(jnp.maximum(endp, 1e-37)),
                         jnp.full_like(mB, NEG_INF))
        res_ref[:] = jnp.where((dfin_ref[:] == 0) & valid0, val0,
                               jnp.full_like(mB, NEG_INF))

    def body(d, yoh, p1_ref, m1_ref, p2_ref, m2_ref):
        valid = (i_cells <= d) & (i_cells >= d - Lo) & (i_cells <= Li)
        boundary = i_cells > 0
        dn = (((1,), (0,)), ((), ()))

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        def mm(mat_ref, lo_ref, x):
            if not split:
                return jax.lax.dot_general(
                    mat_ref[:], x, dn, precision=precision,
                    preferred_element_type=jnp.float32)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            xlo = x - xhi
            dd = jax.lax.dot_general
            return (dd(mat_ref[:], xhi, dn,
                       preferred_element_type=jnp.float32)
                    + dd(mat_ref[:], xlo, dn,
                         preferred_element_type=jnp.float32)
                    + dd(lo_ref[:], xhi, dn,
                         preferred_element_type=jnp.float32))

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            mu_terms = []
            if has_up:
                mu_terms.append(m1c)
            if has_left:
                m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                mu_terms.append(m1s)
            if has_diag:
                m2s = jnp.where(bnd, rollc(m2_ref[:, lo_c:hi_c]), NEG_INF)
                mu_terms.append(m2s)
            mu_c = functools.reduce(jnp.maximum, mu_terms)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            p1c = p1_ref[:, lo_c:hi_c]

            xoh_c = xoh_ref[:, lo_c:hi_c]
            yoh_c = yoh[:, lo_c:hi_c]

            # fold the scalar weights into the (Ti, chunk) one-hot rows so
            # the per-block multiplies are the only full (S, chunk) passes
            z_parts = []
            if has_up:
                w_up = jnp.exp(m1c - mu_safe) * (m1c > NEG_INF / 2)
                z_parts.append(p1c * w_up)
            if has_diag:
                w_diag = jnp.exp(m2s - mu_safe) * (m2s > NEG_INF / 2)
                p2s = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                xw_diag = xoh_c * w_diag
                z_parts += [p2s * xw_diag[t:t + 1, :] for t in range(Ti)]
            if has_left and unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = xoh_c * w_left
                z_parts += [p1s * xw_left[t:t + 1, :] for t in range(Ti)]

            cur = None
            if z_parts:
                z = jnp.concatenate(z_parts, axis=0) if len(z_parts) > 1 \
                    else z_parts[0]              # (S + 2*Ti*S, chunk) max
                out_ud = mm(m_ud_ref, m_ud_lo_ref, z)
                cur = out_ud[0 * S:1 * S, :] * yoh_c[0:1, :]
                for t in range(1, To):
                    cur += out_ud[t * S:(t + 1) * S, :] * yoh_c[t:t + 1, :]
                if unify:
                    # block To = left-only output for no-y-token cells
                    ynone = 1.0 - jnp.sum(yoh_c, axis=0, keepdims=True)
                    cur += out_ud[To * S:(To + 1) * S, :] * ynone
            if has_left and not unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = xoh_c * w_left
                l_parts = [p1s * xw_left[t:t + 1, :] for t in range(Ti)]
                lz = jnp.concatenate(l_parts, axis=0)   # (Ti*S, chunk)
                sl = mm(m_left_ref, m_left_lo_ref, lz)
                cur = sl if cur is None else cur + sl
            p2_ref[:, lo_c:hi_c] = cur
        mu = jnp.concatenate(mu_parts, axis=1)

        # the carried invariant is value = p * exp(m); p is allowed to
        # drift below 1 between rescales (bounded decay over
        # rescale_every steps keeps it in f32/bf16 normal range), so the
        # 3 full-slab normalization passes run only every k-th diagonal
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

        fin = (dfin_ref[:] == d) & valid
        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        res_ref[:] = jnp.where(fin, val, res_ref[:])

    d_even = 2 * s_id
    d_odd = d_even + 1
    n_diags = Li + Lo + 1

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        # even diagonals live in slabB (read slabA of d-1, write slabB)
        body(d_even, ydiag_ref[0, 0], slabA, mA, slabB, mB)

    @pl.when(d_odd <= n_diags - 1)
    def _odd_step():
        body(d_odd, ydiag_ref[0, 1], slabB, mB, slabA, mA)


def _chained_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, precision, split,
                    rescale_every, sink, classes, n_chain, sigma,
                    # refs:
                    m_ud_ref, m_left_ref, m_ud_lo_ref, m_left_lo_ref,
                    c0_ref, w_ref, tok_ref, icell_ref,
                    res_ref,
                    slabA, slabB, mA, mB, floc, kidx):
    """Sequence-CHAINED merged kernel: near-full lane occupancy.

    A square lattice's anti-diagonal ramps 1..Li+1..1, so the rectangular
    (B, W) slab averages ~50% valid cells over the Li+Lo+1 steps. This
    variant chains `n_chain` equal-length sequences per W-lane window,
    staggered by sigma = Lo + 2 diagonals: chain k+1's wavefront grows
    into exactly the lanes chain k's shrinking wavefront frees (lane i is
    owned by chain k for absolute diagonals d in [sigma*k + i,
    sigma*k + i + Lo]; the +2 margin keeps chain k+1's writes one full
    diagonal clear of chain k's diag-neighbor reads). Amortized cost
    drops from Li+Lo+2 to sigma steps per sequence (~2x for Li == Lo).

    Per-lane bookkeeping is incremental int32 scratch: f = the lane's
    chain-local output coordinate o (f in [0, Lo] while active, wraps to
    0 at sigma starting the next chain), and kidx = the lane's current
    chain index. Tokens change per lane over time, so per-diagonal x/y
    token rows are streamed as int32 and one-hot masks are built
    in-kernel by iota compare. Readout: chain k's final cells all land
    on absolute diagonal sigma*k + Li + Lo, captured into res row k.

    Requires uniform sequence lengths (Li, Lo) across the batch.
    `classes` = (has_up, has_left, has_diag) compile-time specialization,
    with the same unified left-folding as _merged_kernel."""
    has_up, has_left, has_diag = classes
    unify = has_left and (has_up or has_diag)
    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]

    def readout(p_ref):
        if sink:
            return jnp.sum(p_ref[:] * w_ref[:], axis=0, keepdims=True)
        return p_ref[S - 1:S, :]

    def init():
        valid0 = i_cells == 0
        init_mask = valid0.astype(jnp.float32)
        row0 = c0_ref[:]                         # (S, 1) closure^T col 0
        slabB[:] = row0 * init_mask
        mB[:] = jnp.where(valid0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        floc[:] = -i_cells                       # f of diagonal 0, chain 0
        kidx[:] = jnp.zeros_like(kidx)
        res_ref[:] = jnp.full_like(res_ref, NEG_INF)

    def body(d, xtok, ytok, p1_ref, m1_ref, p2_ref, m2_ref):
        # advance per-lane chain-local coordinate: f = o of this lane's
        # cell on the current diagonal (its i is the lane index)
        f_new = floc[:] + 1
        wrapped = f_new == sigma
        f_new = jnp.where(wrapped, 0, f_new)
        k_new = kidx[:] + wrapped.astype(jnp.int32)
        floc[:] = f_new
        kidx[:] = k_new
        real = k_new < n_chain
        valid = (f_new >= 0) & (f_new <= Lo) & (i_cells <= Li) & real
        init_now = (f_new == 0) & (i_cells == 0) & real
        boundary = i_cells > 0
        xtok_f = xtok.astype(jnp.float32)
        ytok_f = ytok.astype(jnp.float32)
        dn = (((1,), (0,)), ((), ()))

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        def mm(mat_ref, lo_ref, x):
            if not split:
                return jax.lax.dot_general(
                    mat_ref[:], x, dn, precision=precision,
                    preferred_element_type=jnp.float32)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            xlo = x - xhi
            dd = jax.lax.dot_general
            return (dd(mat_ref[:], xhi, dn,
                       preferred_element_type=jnp.float32)
                    + dd(mat_ref[:], xlo, dn,
                         preferred_element_type=jnp.float32)
                    + dd(lo_ref[:], xhi, dn,
                         preferred_element_type=jnp.float32))

        # in-kernel one-hot masks from the streamed token rows, built over
        # the FULL row before chunking: Mosaic rejects sublane broadcasts
        # of lane-offset slices ("Invalid input layout" on
        # vector.broadcast), so the (1, cells) -> (T, cells) broadcasts
        # must happen at lane offset 0 and be sliced afterwards
        xm_full = xtok_f == jax.lax.broadcasted_iota(
            jnp.int32, (Ti, cells), 0).astype(jnp.float32)
        ym_full = ytok_f == jax.lax.broadcasted_iota(
            jnp.int32, (To, cells), 0).astype(jnp.float32)

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            mu_terms = []
            if has_up:
                mu_terms.append(m1c)
            if has_left:
                m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                mu_terms.append(m1s)
            if has_diag:
                m2s = jnp.where(bnd, rollc(m2_ref[:, lo_c:hi_c]), NEG_INF)
                mu_terms.append(m2s)
            mu_c = functools.reduce(jnp.maximum, mu_terms)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            p1c = p1_ref[:, lo_c:hi_c]

            xm = xm_full[:, lo_c:hi_c]
            ym = ym_full[:, lo_c:hi_c]

            z_parts = []
            if has_up:
                w_up = jnp.exp(m1c - mu_safe) * (m1c > NEG_INF / 2)
                z_parts.append(p1c * w_up)
            if has_diag:
                w_diag = jnp.exp(m2s - mu_safe) * (m2s > NEG_INF / 2)
                p2s = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                xw_diag = jnp.where(xm, w_diag, 0.0)
                z_parts += [p2s * xw_diag[t:t + 1, :] for t in range(Ti)]
            if has_left and unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = jnp.where(xm, w_left, 0.0)
                z_parts += [p1s * xw_left[t:t + 1, :] for t in range(Ti)]

            cur = None
            if z_parts:
                z = jnp.concatenate(z_parts, axis=0) if len(z_parts) > 1 \
                    else z_parts[0]              # (S + 2*Ti*S, chunk) max
                out_ud = mm(m_ud_ref, m_ud_lo_ref, z)
                cur = jnp.where(ym[0:1, :], out_ud[0 * S:1 * S, :], 0.0)
                for t in range(1, To):
                    cur += jnp.where(ym[t:t + 1, :],
                                     out_ud[t * S:(t + 1) * S, :], 0.0)
                if unify:
                    ynone = ~(ym[0:1, :])
                    for t in range(1, To):
                        ynone = ynone & ~(ym[t:t + 1, :])
                    cur += jnp.where(ynone,
                                     out_ud[To * S:(To + 1) * S, :], 0.0)
            if has_left and not unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = jnp.where(xm, w_left, 0.0)
                l_parts = [p1s * xw_left[t:t + 1, :] for t in range(Ti)]
                lz = jnp.concatenate(l_parts, axis=0)   # (Ti*S, chunk)
                sl = mm(m_left_ref, m_left_lo_ref, lz)
                cur = sl if cur is None else cur + sl
            # fresh chain start: cell (0,0) = closure column 0, scale 0
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

        # chain k's readout cells all sit on one known absolute diagonal
        fin_lane = (i_cells == Li) & (f_new == Lo)
        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        for k in range(n_chain):
            @pl.when(d == sigma * k + Li + Lo)
            def _cap(k=k):
                res_ref[k:k + 1, :] = jnp.where(fin_lane, val,
                                                res_ref[k:k + 1, :])

    d_even = 2 * s_id
    d_odd = d_even + 1
    n_abs = sigma * (n_chain - 1) + Li + Lo + 1

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        tk = tok_ref[0, 0]
        body(d_even, tk[0:1, :], tk[1:2, :], slabA, mA, slabB, mB)

    @pl.when(d_odd <= n_abs - 1)
    def _odd_step():
        tk = tok_ref[0, 1]
        body(d_odd, tk[0:1, :], tk[1:2, :], slabB, mB, slabA, mA)


def ragged_span(in_lens, out_lens, n_chain):
    """Exact diagonal span of the sorted shared-stagger ragged schedule
    (host-side; pass as n_abs_hint to make_wavefront_forward)."""
    ol = np.sort(np.asarray(out_lens))[::-1]
    il_by = np.asarray(in_lens)[np.argsort(-np.asarray(out_lens),
                                           kind="stable")]
    B = len(ol) // n_chain
    lomax = [int(ol[k * B:(k + 1) * B].max()) for k in range(n_chain)]
    limax = [int(il_by[k * B:(k + 1) * B].max()) for k in range(n_chain)]
    D = 0
    span = 0
    for k in range(n_chain):
        span = max(span, D + limax[k] + lomax[k] + 1)
        D += lomax[k] + 2
    return span


def _chained_ragged_kernel(Ti, To, S, B, W, n_abs, n_chunks, precision,
                           split, rescale_every, sink, classes, n_chain,
                           # refs:
                           m_ud_ref, m_left_ref, m_ud_lo_ref, m_left_lo_ref,
                           c0_ref, w_ref, tok_ref, icell_ref,
                           res_ref,
                           slabA, slabB, mA, mB):
    """RAGGED sequence-chained merged kernel.

    Generalizes _chained_kernel to PER-SEQUENCE lengths: each W-lane
    window chains its own sequences with per-chain stagger
    D[w, k+1] = D[w, k] + Lo[w, k] + 2 (the neighbor-coherence margins
    only involve the chain's OWN length, so the uniform-case safety
    argument carries over unchanged). All per-lane bookkeeping moves to
    HOST-precomputed streamed rows: the (1, 2, 4, cells) token block
    carries [x token, y token, finishing-chain index (-1 if none),
    flags (0 dead, 1 valid, 2 valid+fresh-chain-start)] per diagonal —
    the kernel keeps no (f, kidx) arithmetic at all, which is what makes
    arbitrary raggedness free. Captures test the streamed finish row
    every diagonal instead of one fixed diagonal per chain."""
    has_up, has_left, has_diag = classes
    unify = has_left and (has_up or has_diag)
    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]

    def readout(p_ref):
        if sink:
            return jnp.sum(p_ref[:] * w_ref[:], axis=0, keepdims=True)
        return p_ref[S - 1:S, :]

    def init():
        valid0 = i_cells == 0
        init_mask = valid0.astype(jnp.float32)
        row0 = c0_ref[:]                         # (S, 1) closure^T col 0
        slabB[:] = row0 * init_mask
        mB[:] = jnp.where(valid0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        res_ref[:] = jnp.full_like(res_ref, NEG_INF)

    def body(d, xtok, ytok, fink, flags, p1_ref, m1_ref, p2_ref, m2_ref):
        valid = flags >= 1
        init_now = flags == 2
        boundary = i_cells > 0
        xtok_f = xtok.astype(jnp.float32)
        ytok_f = ytok.astype(jnp.float32)
        dn = (((1,), (0,)), ((), ()))

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        def mm(mat_ref, lo_ref, x):
            if not split:
                return jax.lax.dot_general(
                    mat_ref[:], x, dn, precision=precision,
                    preferred_element_type=jnp.float32)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            xlo = x - xhi
            dd = jax.lax.dot_general
            return (dd(mat_ref[:], xhi, dn,
                       preferred_element_type=jnp.float32)
                    + dd(mat_ref[:], xlo, dn,
                         preferred_element_type=jnp.float32)
                    + dd(lo_ref[:], xhi, dn,
                         preferred_element_type=jnp.float32))

        # in-kernel one-hot masks from the streamed token rows, built over
        # the FULL row before chunking: Mosaic rejects sublane broadcasts
        # of lane-offset slices ("Invalid input layout" on
        # vector.broadcast), so the (1, cells) -> (T, cells) broadcasts
        # must happen at lane offset 0 and be sliced afterwards
        xm_full = xtok_f == jax.lax.broadcasted_iota(
            jnp.int32, (Ti, cells), 0).astype(jnp.float32)
        ym_full = ytok_f == jax.lax.broadcasted_iota(
            jnp.int32, (To, cells), 0).astype(jnp.float32)

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            mu_terms = []
            if has_up:
                mu_terms.append(m1c)
            if has_left:
                m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                mu_terms.append(m1s)
            if has_diag:
                m2s = jnp.where(bnd, rollc(m2_ref[:, lo_c:hi_c]), NEG_INF)
                mu_terms.append(m2s)
            mu_c = functools.reduce(jnp.maximum, mu_terms)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            p1c = p1_ref[:, lo_c:hi_c]

            xm = xm_full[:, lo_c:hi_c]
            ym = ym_full[:, lo_c:hi_c]

            z_parts = []
            if has_up:
                w_up = jnp.exp(m1c - mu_safe) * (m1c > NEG_INF / 2)
                z_parts.append(p1c * w_up)
            if has_diag:
                w_diag = jnp.exp(m2s - mu_safe) * (m2s > NEG_INF / 2)
                p2s = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                xw_diag = jnp.where(xm, w_diag, 0.0)
                z_parts += [p2s * xw_diag[t:t + 1, :] for t in range(Ti)]
            if has_left and unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = jnp.where(xm, w_left, 0.0)
                z_parts += [p1s * xw_left[t:t + 1, :] for t in range(Ti)]

            cur = None
            if z_parts:
                z = jnp.concatenate(z_parts, axis=0) if len(z_parts) > 1 \
                    else z_parts[0]              # (S + 2*Ti*S, chunk) max
                out_ud = mm(m_ud_ref, m_ud_lo_ref, z)
                cur = jnp.where(ym[0:1, :], out_ud[0 * S:1 * S, :], 0.0)
                for t in range(1, To):
                    cur += jnp.where(ym[t:t + 1, :],
                                     out_ud[t * S:(t + 1) * S, :], 0.0)
                if unify:
                    ynone = ~(ym[0:1, :])
                    for t in range(1, To):
                        ynone = ynone & ~(ym[t:t + 1, :])
                    cur += jnp.where(ynone,
                                     out_ud[To * S:(To + 1) * S, :], 0.0)
            if has_left and not unify:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1c), 0.0)
                xw_left = jnp.where(xm, w_left, 0.0)
                l_parts = [p1s * xw_left[t:t + 1, :] for t in range(Ti)]
                lz = jnp.concatenate(l_parts, axis=0)   # (Ti*S, chunk)
                sl = mm(m_left_ref, m_left_lo_ref, lz)
                cur = sl if cur is None else cur + sl
            # fresh chain start: cell (0,0) = closure column 0, scale 0
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

        # finishing lanes carry their chain index in the streamed row
        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        for k in range(n_chain):
            res_ref[k:k + 1, :] = jnp.where(fink == k, val,
                                            res_ref[k:k + 1, :])

    d_even = 2 * s_id
    d_odd = d_even + 1

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        tk = tok_ref[0, 0]
        body(d_even, tk[0:1, :], tk[1:2, :], tk[2:3, :], tk[3:4, :],
             slabA, mA, slabB, mB)

    @pl.when(d_odd <= n_abs - 1)
    def _odd_step():
        tk = tok_ref[0, 1]
        body(d_odd, tk[0:1, :], tk[1:2, :], tk[2:3, :], tk[3:4, :],
             slabB, mB, slabA, mA)




def _seqscale_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, rescale_every,
                     # refs:
                     m_ud_hi_ref, m_left_hi_ref, m_ud_lo_ref, m_left_lo_ref,
                     c0_ref, xoh_ref, ydiag_ref, icell_ref, dfin_ref,
                     res_ref,
                     p1hi, p1lo, p2hi, p2lo, mscale):
    """Per-SEQUENCE scale variant of the merged kernel.

    The carried invariant is value = (phi + plo) * exp(M[seq]) where M is
    uniform within each sequence's W-window of lanes. Lane rolls never
    cross a window (boundary-masked), so neighbor cells and both diagonal
    slabs share one scale — NO per-step weight multiplies, max-alignment,
    or scale rolls are needed at all. Slabs are stored as pre-split bf16
    (hi, lo) pairs, so the bf16x2 dot operands are built by pure masked
    copies (exact in bf16) instead of full-precision multiplies + casts —
    the dominant VPU cost of the per-cell-scale kernel.

    Every `rescale_every`-th diagonal both slabs are jointly renormalized
    by a per-window max (computed with log2(W) doubling rolls on a
    (1, cells) vector) and M absorbs the log factor. Between rescales
    values drift below 1; contributions more than ~85 nats below the
    window ridge flush to zero — far beyond the reference's own 10-nat
    log-sum-exp table cutoff (ref src/logsumexp.h:20-26)."""
    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def split_write(dst_hi, dst_lo, sl_c, val):
        hi = val.astype(bf16)
        dst_hi[:, sl_c] = hi
        dst_lo[:, sl_c] = (val - hi.astype(f32)).astype(bf16)

    def init():
        valid0 = i_cells == 0
        row0 = c0_ref[:]                          # (S, 1) closure^T col 0
        v0 = row0 * valid0.astype(f32)
        h = v0.astype(bf16)
        p1hi[:] = h
        p1lo[:] = (v0 - h.astype(f32)).astype(bf16)
        p2hi[:] = jnp.zeros_like(p2hi)
        p2lo[:] = jnp.zeros_like(p2lo)
        mscale[:] = jnp.zeros_like(mscale)
        endp = v0[S - 1:S, :]
        val0 = jnp.where(endp > 0,
                         jnp.log(jnp.maximum(endp, 1e-37)),
                         jnp.full((1, cells), NEG_INF, f32))
        res_ref[:] = jnp.where((dfin_ref[:] == 0) & valid0, val0,
                               jnp.full((1, cells), NEG_INF, f32))

    def body(d, yoh, a_hi, a_lo, b_hi, b_lo):
        """Read diagonal d-1 from (a_hi, a_lo), d-2 from (b_hi, b_lo),
        write diagonal d into (b_hi, b_lo)."""
        boundary = i_cells > 0
        dn = (((1,), (0,)), ((), ()))

        def roll_pair(hi, lo, bnd, zero_b):
            # Mosaic only rotates 32-bit data: combine the bf16 pair to
            # f32, roll once, re-split. The split is a pure function of
            # the value, so this matches rolling hi/lo individually.
            full = hi.astype(f32) + lo.astype(f32)
            r = pltpu.roll(full, 1, 1)
            rh = r.astype(bf16)
            rl = (r - rh.astype(f32)).astype(bf16)
            return (jnp.where(bnd, rh, zero_b),
                    jnp.where(bnd, rl, zero_b))

        def mm3(mhi_ref, mlo_ref, zhi, zlo):
            dd = jax.lax.dot_general
            return (dd(mhi_ref[:], zhi, dn, preferred_element_type=f32)
                    + dd(mhi_ref[:], zlo, dn, preferred_element_type=f32)
                    + dd(mlo_ref[:], zhi, dn, preferred_element_type=f32))

        for c in range(n_chunks):
            sl_c = slice(c * chunk, (c + 1) * chunk)
            bnd = boundary[:, sl_c]
            zero_b = jnp.zeros((S, chunk), bf16)
            p1c_hi = a_hi[:, sl_c]
            p1c_lo = a_lo[:, sl_c]
            p1s_hi, p1s_lo = roll_pair(p1c_hi, p1c_lo, bnd, zero_b)
            p2s_hi, p2s_lo = roll_pair(b_hi[:, sl_c], b_lo[:, sl_c],
                                       bnd, zero_b)

            xm = xoh_ref[:, sl_c] > 0.5                  # (Ti, chunk) bool
            zhi = jnp.concatenate(
                [p1c_hi] + [jnp.where(xm[t:t + 1, :], p2s_hi, zero_b)
                            for t in range(Ti)], axis=0)
            zlo = jnp.concatenate(
                [p1c_lo] + [jnp.where(xm[t:t + 1, :], p2s_lo, zero_b)
                            for t in range(Ti)], axis=0)
            out_ud = mm3(m_ud_hi_ref, m_ud_lo_ref, zhi, zlo)

            lzhi = jnp.concatenate(
                [jnp.where(xm[t:t + 1, :], p1s_hi, zero_b)
                 for t in range(Ti)], axis=0)
            lzlo = jnp.concatenate(
                [jnp.where(xm[t:t + 1, :], p1s_lo, zero_b)
                 for t in range(Ti)], axis=0)
            cur = mm3(m_left_hi_ref, m_left_lo_ref, lzhi, lzlo)

            yoh_c = yoh[:, sl_c]
            for t in range(To):
                cur += out_ud[t * S:(t + 1) * S, :] * yoh_c[t:t + 1, :]
            split_write(b_hi, b_lo, sl_c, cur)

        # fire on TWO consecutive diagonals so BOTH parities get
        # rescaled: diagonal-class mass lives entirely on one parity
        # (cells (j, j) sit at d = start + 2j), and a chain starting on
        # an odd diagonal would otherwise NEVER be renormalized — its
        # probabilities decay until exp underflows f32 at |path log|
        # ~87.9 nats (measured: a ragged chained window starting at
        # d=113 returned -inf exactly when the f64 oracle crossed -87.9)
        @pl.when(d % rescale_every <= 1)
        def _rescale():
            va = jnp.max(a_hi[:].astype(f32), axis=0, keepdims=True)
            vb = jnp.max(b_hi[:].astype(f32), axis=0, keepdims=True)
            v = jnp.maximum(va, vb)                      # (1, cells)
            # per-window max: prefix-max by doubling, then broadcast the
            # window max backwards — rolls never cross windows because
            # cells outside [0, W) of a window are masked by i_cells
            i_loc = i_cells
            sh = 1
            while sh < W:
                rolled = pltpu.roll(v, sh, 1)
                v = jnp.maximum(v, jnp.where(i_loc >= sh, rolled, 0.0))
                sh *= 2
            # v[c] = max over window cells [0..i(c)]; backward broadcast
            sh = 1
            while sh < W:
                rolled = pltpu.roll(v, -sh % cells, 1)
                v = jnp.maximum(v, jnp.where(i_loc < W - sh, rolled, 0.0))
                sh *= 2
            factor = jnp.where(v > 0, v, 1.0)
            inv = 1.0 / factor
            for hi_r, lo_r in ((a_hi, a_lo), (b_hi, b_lo)):
                full = hi_r[:].astype(f32) + lo_r[:].astype(f32)
                scaled = full * inv
                h = scaled.astype(bf16)
                hi_r[:] = h
                lo_r[:] = (scaled - h.astype(f32)).astype(bf16)
            mscale[:] = mscale[:] + jnp.log(factor)

        fin = (dfin_ref[:] == d)
        endp = (b_hi[S - 1:S, :].astype(f32) + b_lo[S - 1:S, :].astype(f32))
        val = jnp.where(endp > 0,
                        mscale[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full((1, cells), NEG_INF, f32))
        res_ref[:] = jnp.where(fin, val, res_ref[:])

    d_even = 2 * s_id
    d_odd = d_even + 1
    n_diags = Li + Lo + 1

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        body(d_even, ydiag_ref[0, 0], p2hi, p2lo, p1hi, p1lo)

    @pl.when(d_odd <= n_diags - 1)
    def _odd_step():
        body(d_odd, ydiag_ref[0, 1], p1hi, p1lo, p2hi, p2lo)


def _factored_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, precision, split,
                     rescale_every, sink, r_up, r_left, r_diag,
                     *args):
    """Destination-factored merged kernel (see pallas/factorize.py).

    Each neighbor class's token-conditioned tensor is decomposed as
    A[t, s, s'] = sum_r T_r[s, s'] * E_r[t, s'], so a cell's contribution
    is sum_r (T_r^T p) * (E_r^T onehot) — R shared full-depth matmuls plus
    one tiny (R*S, n_tok) token matmul per class, instead of n_tok
    redundant one-hot-masked blocks. For profile-structured machines
    (prot2dna: R = 1 left / 4 up / 0 diag) this cuts per-cell MXU work
    ~17x vs the generic merged layout; for full-rank random machines it
    matches it. Closure is applied as its own matmul per cell (the
    elementwise token scale prevents folding it into the factors).

    Scale/rescale/readout bookkeeping is identical to _merged_kernel."""
    # unpack refs by the statically known class presence
    it = iter(args)
    mt_u = e_u = mt_l = e_l = mt_d = e_d = None
    if r_up:
        mt_u = (next(it), next(it))
        e_u = (next(it), next(it))
    if r_left:
        mt_l = (next(it), next(it))
        e_l = (next(it), next(it))
    if r_diag:
        mt_d = (next(it), next(it))
        e_d = (next(it), next(it))
    cl_hi, cl_lo = next(it), next(it)
    c0_ref, w_ref = next(it), next(it)
    xoh_ref, ydiag_ref, icell_ref, dfin_ref = (next(it), next(it),
                                               next(it), next(it))
    res_ref = next(it)
    slabA, slabB, mA, mB = next(it), next(it), next(it), next(it)

    s_id = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]

    def readout(p_ref):
        if sink:
            return jnp.sum(p_ref[:] * w_ref[:], axis=0, keepdims=True)
        return p_ref[S - 1:S, :]

    def init():
        valid0 = i_cells == 0
        init_mask = valid0.astype(jnp.float32)
        row0 = c0_ref[:]                         # (S, 1) closure^T col 0
        slabB[:] = row0 * init_mask
        mB[:] = jnp.where(valid0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        endp = readout(slabB)
        val0 = jnp.where(endp > 0,
                         jnp.log(jnp.maximum(endp, 1e-37)),
                         jnp.full_like(mB, NEG_INF))
        res_ref[:] = jnp.where((dfin_ref[:] == 0) & valid0, val0,
                               jnp.full_like(mB, NEG_INF))

    def body(d, yoh, p1_ref, m1_ref, p2_ref, m2_ref):
        valid = (i_cells <= d) & (i_cells >= d - Lo) & (i_cells <= Li)
        boundary = i_cells > 0
        dn = (((1,), (0,)), ((), ()))

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        def mm3(mats, x):
            hi_ref, lo_ref = mats
            if not split:
                return jax.lax.dot_general(
                    hi_ref[:], x, dn, precision=precision,
                    preferred_element_type=jnp.float32)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            xlo = x - xhi
            dd = jax.lax.dot_general
            return (dd(hi_ref[:], xhi, dn,
                       preferred_element_type=jnp.float32)
                    + dd(hi_ref[:], xlo, dn,
                         preferred_element_type=jnp.float32)
                    + dd(lo_ref[:], xhi, dn,
                         preferred_element_type=jnp.float32))

        def mm2(mats, oh):
            # one-hot operands are bf16-exact; only the matrix is split
            hi_ref, lo_ref = mats
            dd = jax.lax.dot_general
            if not split:
                return dd(hi_ref[:], oh, dn, precision=precision,
                          preferred_element_type=jnp.float32)
            return (dd(hi_ref[:], oh, dn,
                       preferred_element_type=jnp.float32)
                    + dd(lo_ref[:], oh, dn,
                         preferred_element_type=jnp.float32))

        def rank_sum(out, scale, r):
            acc = out[0:S, :] * scale[0:S, :]
            for k in range(1, r):
                acc += out[k * S:(k + 1) * S, :] * scale[k * S:(k + 1) * S, :]
            return acc

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            m2c = m2_ref[:, lo_c:hi_c]
            cands = []
            m1s = m2s = None
            if r_up:
                cands.append(m1c)
            if r_left:
                m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
                cands.append(m1s)
            if r_diag:
                m2s = jnp.where(bnd, rollc(m2c), NEG_INF)
                cands.append(m2s)
            mu_c = cands[0]
            for extra in cands[1:]:
                mu_c = jnp.maximum(mu_c, extra)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            mu_parts.append(mu_c)

            xoh_c = xoh_ref[:, lo_c:hi_c]
            yoh_c = yoh[:, lo_c:hi_c]

            pre = None
            if r_up:
                w_up = jnp.exp(m1c - mu_safe) * (m1c > NEG_INF / 2)
                pu = p1_ref[:, lo_c:hi_c] * w_up
                out_u = mm3(mt_u, pu)                 # (r_up*S, chunk)
                eu = mm2(e_u, yoh_c)                  # (r_up*S, chunk)
                pre = rank_sum(out_u, eu, r_up)
            if r_left:
                w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
                p1s = jnp.where(bnd, rollc(p1_ref[:, lo_c:hi_c]), 0.0)
                out_l = mm3(mt_l, p1s * w_left)
                el = mm2(e_l, xoh_c)
                term = rank_sum(out_l, el, r_left)
                pre = term if pre is None else pre + term
            if r_diag:
                w_diag = jnp.exp(m2s - mu_safe) * (m2s > NEG_INF / 2)
                p2s = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)
                pair_rows = [xoh_c[t:t + 1, :] * yoh_c for t in range(Ti)]
                pairoh = jnp.concatenate(pair_rows, axis=0)  # (Ti*To, chunk)
                out_d = mm3(mt_d, p2s * w_diag)
                ed = mm2(e_d, pairoh)
                term = rank_sum(out_d, ed, r_diag)
                pre = term if pre is None else pre + term
            cur = mm3((cl_hi, cl_lo), pre)
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

        fin = (dfin_ref[:] == d) & valid
        endp = readout(p2_ref)
        val = jnp.where(endp > 0,
                        m2_ref[:] + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        res_ref[:] = jnp.where(fin, val, res_ref[:])

    d_even = 2 * s_id
    d_odd = d_even + 1
    n_diags = Li + Lo + 1

    @pl.when(s_id == 0)
    def _first():
        init()

    @pl.when(s_id > 0)
    def _even_step():
        body(d_even, ydiag_ref[0, 0], slabA, mA, slabB, mB)

    @pl.when(d_odd <= n_diags - 1)
    def _odd_step():
        body(d_odd, ydiag_ref[0, 1], slabB, mB, slabA, mA)


def _wavefront_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, precision, split,
                      # refs:
                      diag2_ref, left_cat_ref, up_cat_ref, closure_ref,
                      diag2_lo_ref, left_lo_ref, up_lo_ref, closure_lo_ref,
                      xoh_ref, ydiag_ref, icell_ref, dfin_ref,
                      res_ref,
                      slabA, slabB, mA, mB):
    d = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks

    i_cells = icell_ref[:]                      # (1, cells) i index per cell
    valid = (i_cells <= d) & (i_cells >= d - Lo) & (i_cells <= Li)

    @pl.when(d == 0)
    def _init():
        init_mask = ((i_cells == 0) & valid).astype(jnp.float32)
        row0 = closure_ref[:, 0:1]              # closure^T col 0 = C[0, :]
        slabB[:] = row0 * init_mask
        mB[:] = jnp.where(init_mask > 0, 0.0, NEG_INF)
        slabA[:] = jnp.zeros_like(slabA)
        mA[:] = jnp.full_like(mA, NEG_INF)
        endp = slabB[S - 1:S, :]
        val0 = jnp.where(endp > 0,
                         jnp.log(jnp.maximum(endp, 1e-37)),
                         jnp.full_like(mB, NEG_INF))
        res_ref[:] = jnp.where((dfin_ref[:] == 0) & (init_mask > 0), val0,
                               jnp.full_like(mB, NEG_INF))

    def body(p1_ref, m1_ref, p2_ref, m2_ref):
        # chunk boundaries coincide with sequence (W) boundaries, so the
        # i==0 mask also covers per-chunk roll wraparound: all shifts can be
        # done chunk-locally, avoiding full-slab temporaries in VMEM
        boundary = i_cells > 0

        def rollc(x):
            return pltpu.roll(x, 1, 1)

        dn = (((1,), (0,)), ((), ()))

        def mm(mat_ref, lo_ref, x):
            if not split:
                return jax.lax.dot_general(
                    mat_ref[:], x, dn, precision=precision,
                    preferred_element_type=jnp.float32)
            # bf16x2 emulation: M = Mhi + Mlo (host-split), X = Xhi + Xlo;
            # three DEFAULT (single-pass bf16) products recover ~f32 quality
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            xlo = x - xhi
            d = jax.lax.dot_general
            return (d(mat_ref[:], xhi, dn,
                      preferred_element_type=jnp.float32)
                    + d(mat_ref[:], xlo, dn,
                        preferred_element_type=jnp.float32)
                    + d(lo_ref[:], xhi, dn,
                        preferred_element_type=jnp.float32))

        mu_parts = []
        for c in range(n_chunks):
            lo_c, hi_c = c * chunk, (c + 1) * chunk
            bnd = boundary[:, lo_c:hi_c]
            m1c = m1_ref[:, lo_c:hi_c]
            m2c = m2_ref[:, lo_c:hi_c]
            m1s = jnp.where(bnd, rollc(m1c), NEG_INF)
            m2s = jnp.where(bnd, rollc(m2c), NEG_INF)
            mu_c = jnp.maximum(jnp.maximum(m1c, m1s), m2s)
            mu_safe = jnp.where(mu_c > NEG_INF / 2, mu_c, 0.0)
            w_up = jnp.exp(m1c - mu_safe) * (m1c > NEG_INF / 2)
            w_left = jnp.exp(m1s - mu_safe) * (m1s > NEG_INF / 2)
            w_diag = jnp.exp(m2s - mu_safe) * (m2s > NEG_INF / 2)
            mu_parts.append(mu_c)

            p1c = p1_ref[:, lo_c:hi_c]
            p1s = jnp.where(bnd, rollc(p1c), 0.0)
            p2s = jnp.where(bnd, rollc(p2_ref[:, lo_c:hi_c]), 0.0)

            up_all = mm(up_cat_ref, up_lo_ref, p1c)         # (To*S, chunk)
            left_all = mm(left_cat_ref, left_lo_ref, p1s)   # (Ti*S, chunk)

            yoh_c = ydiag_ref[0, :, lo_c:hi_c]
            xoh_c = xoh_ref[:, lo_c:hi_c]
            su = jnp.zeros((S, chunk), jnp.float32)
            for t in range(To):
                su += up_all[t * S:(t + 1) * S, :] * yoh_c[t:t + 1, :]
            sl = jnp.zeros((S, chunk), jnp.float32)
            for t in range(Ti):
                sl += left_all[t * S:(t + 1) * S, :] * xoh_c[t:t + 1, :]

            # diagonal: pre-mask the source by input token into a stacked
            # (Ti*S, chunk) operand, contract once against the regrouped
            # (To*S, Ti*S) matrix, then select by output token — replaces
            # 16 masked FMAs with 4 masked copies + 4 FMAs
            xblocks = [p2s * xoh_c[t:t + 1, :] for t in range(Ti)]
            xstack = jnp.concatenate(xblocks, axis=0)        # (Ti*S, chunk)
            diag_out = mm(diag2_ref, diag2_lo_ref, xstack)   # (To*S, chunk)
            sd = jnp.zeros((S, chunk), jnp.float32)
            for t in range(To):
                sd += diag_out[t * S:(t + 1) * S, :] * yoh_c[t:t + 1, :]

            u = su * w_up + sl * w_left + sd * w_diag
            cur = mm(closure_ref, closure_lo_ref, u)
            p2_ref[:, lo_c:hi_c] = cur
        mu = jnp.concatenate(mu_parts, axis=1)

        curv = p2_ref[:]
        mx = jnp.max(curv, axis=0, keepdims=True)            # (1, cells)
        has = (mx > 0) & valid
        curv = jnp.where(has, curv / jnp.maximum(mx, 1e-37), 0.0)
        m_new = jnp.where(has, mu + jnp.log(jnp.maximum(mx, 1e-37)),
                          NEG_INF)
        p2_ref[:] = curv
        m2_ref[:] = m_new

        fin = (dfin_ref[:] == d) & has
        endp = curv[S - 1:S, :]
        val = jnp.where(endp > 0,
                        m_new + jnp.log(jnp.maximum(endp, 1e-37)),
                        jnp.full_like(m_new, NEG_INF))
        res_ref[:] = jnp.where(fin, val, res_ref[:])

    @pl.when((d > 0) & (d % 2 == 1))
    def _odd():
        body(slabB, mB, slabA, mA)

    @pl.when((d > 0) & (d % 2 == 0))
    def _even():
        body(slabA, mA, slabB, mB)


def make_wavefront_forward(a_diag, a_left, a_up, closure, B, Li, Lo,
                           precision=jax.lax.Precision.HIGHEST,
                           n_chunks=None, interpret=False, split=True,
                           merged=False, rescale_every=4, variant=None,
                           n_abs_hint=None,
                           chain=None):
    """Build the pallas wavefront Forward for fixed machine tensors/shapes.

    Returns fn(in_toks (B,Li), out_toks (B,Lo), in_lens (B,), out_lens (B,))
    -> (B,) log-likelihoods.

    variant="chained" (with `chain` = sequences per lane window, B must be
    a multiple) packs `chain` staggered sequences into each W-lane window
    for ~2x lane occupancy; it requires UNIFORM lengths (in_lens == Li,
    out_lens == Lo for every sequence; the length args are ignored).

    variant="lowrank" (optionally with `chain`) delegates to the
    closure-folded, state-pruned, min-rank factored kernel
    (lowrank_kernel.py) — the fastest path for structured machines like
    prot2dna."""
    import math as _math
    if variant == "lowrank":
        from .lowrank_kernel import make_lowrank_forward
        return make_lowrank_forward(a_diag, a_left, a_up, closure, B, Li,
                                    Lo, precision=precision,
                                    n_chunks=n_chunks, interpret=interpret,
                                    split=split,
                                    rescale_every=rescale_every,
                                    chain=chain)
    Ti, To, S, _ = a_diag.shape
    n_chain = 1
    if variant in ("chained", "chained_ragged"):
        n_chain = chain or 4
        assert B % n_chain == 0, "chained: B must be a multiple of chain"
        assert Li >= 1 and Lo >= 1, "chained: needs non-empty sequences"
        B_total, B = B, B // n_chain        # B below = windows per slab
    # W need only be a multiple of 16 (sublane granularity of one slab row
    # per b); chunk boundaries must align BOTH to sequence boundaries (W)
    # and to lanes (128), i.e. chunks are multiples of lcm(W, 128)
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
        # keep the stacked intermediate (max(Ti,To)*S x chunk) around ~2MB
        target = max(1, (max(Ti, To) * S * 4 * cells) // (2 << 20))
        n_chunks = 1
        for cand in range(max_chunks, 0, -1):
            if max_chunks % cand == 0 and cand <= target:
                n_chunks = cand
                break
        n_chunks = max(n_chunks, 1)
    chunk0 = cells // n_chunks
    assert chunk0 * n_chunks == cells and chunk0 % 128 == 0 \
        and chunk0 % W == 0, "cells must split into aligned chunks"

    # probability-space concatenated matrices, transposed so that
    # out (S', chunk) = M^T (S', S) @ p (S, chunk)
    diag_p = np.exp(np.maximum(np.asarray(a_diag, np.float64), -700))
    left_p = np.exp(np.maximum(np.asarray(a_left, np.float64), -700))
    up_p = np.exp(np.maximum(np.asarray(a_up, np.float64), -700))
    closure_p = np.exp(np.maximum(np.asarray(closure, np.float64), -700))
    # regrouped diagonal matrix: D2[(to, s'), (ti, s)] = A_diag[ti,to][s,s']
    diag2 = np.transpose(diag_p, (1, 3, 0, 2)).reshape(To * S, Ti * S) \
        .astype(np.float32)
    diag2 = np.ascontiguousarray(diag2)
    left_cat = np.ascontiguousarray(
        np.transpose(left_p, (0, 2, 1)).reshape(Ti * S, S)) \
        .astype(np.float32)
    up_cat = np.ascontiguousarray(
        np.transpose(up_p, (0, 2, 1)).reshape(To * S, S)).astype(np.float32)
    closure_t = np.ascontiguousarray(closure_p.T).astype(np.float32)

    i_cell = np.tile(np.arange(W, dtype=np.int32), B)[None, :]

    def hi_lo(m):
        hi = m.astype(np.float32).astype(np.dtype("bfloat16")) \
            .astype(np.float32) if hasattr(np, "bfloat16") else m
        # numpy lacks bfloat16; emulate via jnp on host
        hi = np.asarray(jnp.asarray(m, jnp.float32).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        return hi, (m - hi).astype(np.float32)

    diag2_hi, diag2_lo = hi_lo(diag2)
    left_hi, left_lo = hi_lo(left_cat)
    up_hi, up_lo = hi_lo(up_cat)
    closure_hi, closure_lo = hi_lo(closure_t)
    if not split:
        diag2_hi, left_hi, up_hi, closure_hi = (diag2, left_cat, up_cat,
                                                closure_t)

    n_diags = Li + Lo + 1

    def _prep(in_toks, out_toks, in_lens, out_lens):
        i_idx = jnp.arange(W)
        Li_c = max(Li, 1)
        x_gather = jnp.where(
            (i_idx[None, :] >= 1) & (i_idx[None, :] <= Li),
            in_toks[:, jnp.clip(i_idx - 1, 0, Li_c - 1)] if Li else -1, -1)
        xoh = jax.nn.one_hot(x_gather, Ti, axis=-1, dtype=jnp.float32)
        xoh_t = jnp.transpose(xoh, (2, 0, 1)).reshape(Ti, cells)

        # per-diagonal y one-hots: for diagonal d, cell i has o-1 = d-1-i
        d_idx = jnp.arange(n_diags)
        o_minus_1 = d_idx[:, None] - 1 - i_idx[None, :]      # (n_diags, W)
        Lo_c = max(Lo, 1)
        y_gather = jnp.where(
            (o_minus_1[None] >= 0) & (o_minus_1[None] <= Lo - 1),
            (out_toks[:, jnp.clip(o_minus_1, 0, Lo_c - 1)] if Lo
             else -1), -1)                                    # (B, nd, W)
        yoh = jax.nn.one_hot(y_gather, To, axis=-1, dtype=jnp.float32)
        # (B, nd, W, To) -> (nd, To, B*W)
        ydiag = jnp.transpose(yoh, (1, 3, 0, 2)).reshape(n_diags, To, cells)

        dfin_cells = jnp.full((1, cells), jnp.int32(-1))
        cell_ids = jnp.arange(B) * W + in_lens.astype(jnp.int32)
        dfin_cells = dfin_cells.at[0, cell_ids].set(
            (in_lens + out_lens).astype(jnp.int32))
        return xoh_t, ydiag, dfin_cells, cell_ids

    if variant == "factored":
        from .factorize import factorize_token_tensor

        def pz(a):
            a64 = np.asarray(a, np.float64)
            return np.where(a64 > -1e29, np.exp(np.minimum(a64, 700.0)), 0.0)

        diag_z, left_z, up_z, clo_z = (pz(a_diag), pz(a_left), pz(a_up),
                                       pz(closure))
        # sink-state trim (same criterion and algebra as the merged kernel)
        eye = np.eye(S)
        is_sink = np.array([
            float(diag_z[:, :, s, :].sum() + left_z[:, s, :].sum()
                  + up_z[:, s, :].sum()) == 0.0
            and float(np.abs(clo_z[s] - eye[s]).sum()) == 0.0
            for s in range(S)])
        n_trail = 0
        while n_trail < S - 1 and is_sink[S - 1 - n_trail]:
            n_trail += 1
        readout_silent_in = (
            float(diag_z[:, :, :, S - 1].sum() + left_z[:, :, S - 1].sum()
                  + up_z[:, :, S - 1].sum()) == 0.0)
        S_k, sink = S, False
        w_vec = np.zeros((S, 1), np.float32)
        if n_trail > 0 and readout_silent_in:
            Sa = S - n_trail
            S_k, sink = Sa, True
            w_vec = np.linalg.solve(clo_z[:Sa, :Sa],
                                    clo_z[:Sa, S - 1]).reshape(Sa, 1) \
                .astype(np.float32)
            diag_z = diag_z[:, :, :Sa, :Sa]
            left_z = left_z[:, :Sa, :Sa]
            up_z = up_z[:, :Sa, :Sa]
            clo_z = clo_z[:Sa, :Sa]
        Sa = S_k
        ts_u, es_u, r_up = factorize_token_tensor(up_z)
        ts_l, es_l, r_left = factorize_token_tensor(left_z)
        ts_d, es_d, r_diag = factorize_token_tensor(
            diag_z.reshape(Ti * To, Sa, Sa))

        def dev_mt(ts, r):
            # mt[(r, s'), s] = T_r[s, s'] so out = mt @ p stacks (T_r^T p)
            return np.ascontiguousarray(
                np.transpose(ts, (0, 2, 1)).reshape(r * Sa, Sa)) \
                .astype(np.float32)

        def dev_e(es, r, T):
            # e[(r, s'), t] = E_r[t, s'] so e @ onehot gives the scales
            return np.ascontiguousarray(
                np.transpose(es, (0, 2, 1)).reshape(r * Sa, T)) \
                .astype(np.float32)

        clo_t = np.ascontiguousarray(clo_z.T).astype(np.float32)
        c0f = np.ascontiguousarray(clo_t[:, 0:1]).astype(np.float32)
        pieces = []

        def add_mat(m):
            hi, lo = hi_lo(m)
            pieces.extend([m if not split else hi, lo])

        if r_up:
            add_mat(dev_mt(ts_u, r_up))
            add_mat(dev_e(es_u, r_up, To))
        if r_left:
            add_mat(dev_mt(ts_l, r_left))
            add_mat(dev_e(es_l, r_left, Ti))
        if r_diag:
            add_mat(dev_mt(ts_d, r_diag))
            add_mat(dev_e(es_d, r_diag, Ti * To))
        add_mat(clo_t)
        n_mat_refs = len(pieces)

        kernel_f = functools.partial(
            _factored_kernel, Ti, To, Sa, B, W, Li, Lo, n_chunks, precision,
            split, rescale_every, sink, r_up, r_left, r_diag)
        n_steps_f = (Li + Lo) // 2 + 1
        call_f = pl.pallas_call(
            kernel_f,
            grid=(n_steps_f,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] *
            (n_mat_refs + 2) + [
                pl.BlockSpec(memory_space=pltpu.VMEM),       # xoh
                pl.BlockSpec((1, 2, To, cells), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),       # ydiag
                pl.BlockSpec(memory_space=pltpu.VMEM),       # icell
                pl.BlockSpec(memory_space=pltpu.VMEM),       # dfin
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, cells), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Sa, cells), jnp.float32),
                pltpu.VMEM((Sa, cells), jnp.float32),
                pltpu.VMEM((1, cells), jnp.float32),
                pltpu.VMEM((1, cells), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )
        mats_dev = ([jnp.array(m) for m in pieces]
                    + [jnp.array(c0f), jnp.array(w_vec)])

        @jax.jit
        def forward_factored(in_toks, out_toks, in_lens, out_lens):
            xoh_t, ydiag, dfin_cells, cell_ids = _prep(in_toks, out_toks,
                                                       in_lens, out_lens)
            pad_rows = 2 * n_steps_f - n_diags
            ydiag2 = jnp.concatenate(
                [ydiag, jnp.zeros((pad_rows, To, cells), jnp.float32)],
                axis=0).reshape(n_steps_f, 2, To, cells)
            res_cells = call_f(*mats_dev, xoh_t, ydiag2,
                               jnp.array(i_cell), dfin_cells)
            return res_cells[0, cell_ids]

        return forward_factored

    if merged or variant in ("seqscale", "chained"):
        # closure folded into every neighbor matrix (cur = C@u distributes
        # over the per-token output blocks); up and diag share one wide dot
        closure64 = np.asarray(closure_p, np.float64)
        # compile-time class presence: absent transition classes are
        # specialized out of the merged/chained kernels entirely
        ztol = 1e-290
        has_up = float(up_p.sum()) > ztol
        has_left = float(left_p.sum()) > ztol
        has_diag = float(diag_p.sum()) > ztol
        if not (has_up or has_left or has_diag):
            # degenerate (no symbol transitions): force the UP class, whose
            # kernel path needs no token masks — forcing diag would emit an
            # empty z stack when Ti == 0 and crash at trace time
            has_up = True
        classes = (has_up, has_left, has_diag)

        unify = has_left and (has_up or has_diag)

        def build_ud_left(Sa, c_aa):
            """Merged matrices over the ACTIVE states, present classes
            only. m_ud row blocks = one per output token (+1 "no output
            token" block when unified); columns = [up Sa][diag Ti*Sa]
            [left Ti*Sa (unified only)] matching the kernels' z stacking.
            Separate m_left only for left-only machines."""
            n_blk = To + 1 if unify else To
            col_groups = []
            if has_up:
                g = np.zeros((n_blk * Sa, Sa))
                for t in range(To):
                    g[t * Sa:(t + 1) * Sa] = \
                        c_aa.T @ np.asarray(up_p[t, :Sa, :Sa], np.float64).T
                col_groups.append(g)
            if has_diag:
                g = np.zeros((n_blk * Sa, Ti * Sa))
                for to in range(To):
                    for ti in range(Ti):
                        g[to * Sa:(to + 1) * Sa,
                          ti * Sa:(ti + 1) * Sa] = \
                            c_aa.T @ np.asarray(diag_p[ti, to, :Sa, :Sa],
                                                np.float64).T
                col_groups.append(g)
            if unify:
                # left term rides every output block (the y selection sums
                # to exactly one picked block per cell)
                g = np.zeros((n_blk * Sa, Ti * Sa))
                for rb in range(n_blk):
                    for ti in range(Ti):
                        g[rb * Sa:(rb + 1) * Sa,
                          ti * Sa:(ti + 1) * Sa] = \
                            c_aa.T @ np.asarray(left_p[ti, :Sa, :Sa],
                                                np.float64).T
                col_groups.append(g)
            m_ud_a = np.concatenate(col_groups, axis=1) if col_groups \
                else np.zeros((8, 128))                 # left-only machine
            if has_left and not unify:
                m_left_a = np.concatenate(
                    [c_aa.T @ np.asarray(left_p[t, :Sa, :Sa], np.float64).T
                     for t in range(Ti)], axis=1)       # (Sa, Ti*Sa)
            else:
                m_left_a = np.zeros((8, 128))
            return (np.ascontiguousarray(m_ud_a).astype(np.float32),
                    np.ascontiguousarray(m_left_a).astype(np.float32))

        m_ud, m_left = build_ud_left(S, closure64)
        m_ud_hi, m_ud_lo = hi_lo(m_ud)
        m_left_hi, m_left_lo = hi_lo(m_left)
        if not split:
            m_ud_hi, m_left_hi = m_ud, m_left
        c0 = np.ascontiguousarray(closure_t[:, 0:1]).astype(np.float32)

        if variant == "seqscale":
            # seqscale keeps the generic full layout (its kernel body is
            # not class-specialized)
            cu_blocks = [closure64.T @ np.asarray(up_p[t], np.float64).T
                         for t in range(To)]
            cd = np.zeros((To * S, Ti * S))
            for to in range(To):
                for ti in range(Ti):
                    cd[to * S:(to + 1) * S, ti * S:(ti + 1) * S] = \
                        closure64.T @ np.asarray(diag_p[ti, to],
                                                 np.float64).T
            m_ud = np.concatenate(
                [np.concatenate(cu_blocks, axis=0), cd], axis=1)
            m_left = np.concatenate(
                [closure64.T @ np.asarray(left_p[t], np.float64).T
                 for t in range(Ti)], axis=1)
            m_ud = np.ascontiguousarray(m_ud).astype(np.float32)
            m_left = np.ascontiguousarray(m_left).astype(np.float32)
            def bf_split(m):
                hi = np.asarray(jnp.asarray(m).astype(jnp.bfloat16))
                lo = np.asarray(jnp.asarray(m - hi.astype(np.float32))
                                .astype(jnp.bfloat16))
                return hi, lo

            ud_hi, ud_lo = bf_split(m_ud)
            l_hi, l_lo = bf_split(m_left)
            kernel_ss = functools.partial(_seqscale_kernel, Ti, To, S, B, W,
                                          Li, Lo, n_chunks, rescale_every)
            n_steps_ss = (Li + Lo) // 2 + 1
            call_ss = pl.pallas_call(
                kernel_ss,
                grid=(n_steps_ss,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5 + [
                    pl.BlockSpec(memory_space=pltpu.VMEM),       # xoh
                    pl.BlockSpec((1, 2, To, cells), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),       # ydiag
                    pl.BlockSpec(memory_space=pltpu.VMEM),       # icell
                    pl.BlockSpec(memory_space=pltpu.VMEM),       # dfin
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, cells), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((S, cells), jnp.bfloat16),
                    pltpu.VMEM((S, cells), jnp.bfloat16),
                    pltpu.VMEM((S, cells), jnp.bfloat16),
                    pltpu.VMEM((S, cells), jnp.bfloat16),
                    pltpu.VMEM((1, cells), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
                interpret=interpret,
            )

            @jax.jit
            def forward_seqscale(in_toks, out_toks, in_lens, out_lens):
                xoh_t, ydiag, dfin_cells, cell_ids = _prep(
                    in_toks, out_toks, in_lens, out_lens)
                pad_rows = 2 * n_steps_ss - n_diags
                ydiag2 = jnp.concatenate(
                    [ydiag, jnp.zeros((pad_rows, To, cells), jnp.float32)],
                    axis=0).reshape(n_steps_ss, 2, To, cells)
                res_cells = call_ss(jnp.array(ud_hi), jnp.array(l_hi),
                                    jnp.array(ud_lo), jnp.array(l_lo),
                                    jnp.array(c0), xoh_t, ydiag2,
                                    jnp.array(i_cell), dfin_cells)
                return res_cells[0, cell_ids]

            return forward_seqscale

        # --- sink trim: drop trailing silent sink states from the slab ---
        # A trailing block of states with no outgoing transitions (symbol
        # rows all zero, closure row = identity) never feeds the DP; if
        # additionally the readout state S-1 has only SILENT incoming
        # transitions, its value is w^T p_active with
        # w = inv(C_aa) @ C[active, End]. Trimming 65 -> 64 states turns
        # the (To*S, S+Ti*S) dot from 384x384 into 256x384 padded tiles.
        ztol = 1e-290
        S_k, sink, w_vec = S, False, np.zeros((S, 1), np.float32)
        eye = np.eye(S)
        is_sink = np.array([
            float(diag_p[:, :, s, :].sum() + left_p[:, s, :].sum()
                  + up_p[:, s, :].sum()) < ztol
            and float(np.abs(closure_p[s] - eye[s]).sum()) < ztol
            for s in range(S)])
        n_trail = 0
        while n_trail < S - 1 and is_sink[S - 1 - n_trail]:
            n_trail += 1
        readout_silent_in = (
            float(diag_p[:, :, :, S - 1].sum() + left_p[:, :, S - 1].sum()
                  + up_p[:, :, S - 1].sum()) < ztol)
        if n_trail > 0 and readout_silent_in:
            Sa = S - n_trail
            S_k, sink = Sa, True
            c_aa = np.asarray(closure_p[:Sa, :Sa], np.float64)
            c_ae = np.asarray(closure_p[:Sa, S - 1], np.float64)
            w_vec = np.linalg.solve(c_aa, c_ae).reshape(Sa, 1) \
                .astype(np.float32)
            m_ud, m_left = build_ud_left(Sa, c_aa)
            m_ud_hi, m_ud_lo = hi_lo(m_ud)
            m_left_hi, m_left_lo = hi_lo(m_left)
            if not split:
                m_ud_hi, m_left_hi = m_ud, m_left
            c0 = np.ascontiguousarray(closure_t[:Sa, 0:1]) \
                .astype(np.float32)

        if variant == "chained_ragged":
            # worst-case span: every chain at the padded (Li, Lo); actual
            # shorter chains leave dead (masked) diagonals at the tail.
            # Callers that know the batch lengths on host can trim the
            # grid with n_abs_hint (ragged_span computes the exact span
            # for the sorted shared-stagger schedule).
            n_abs = n_abs_hint or ((Lo + 2) * (n_chain - 1) + Li + Lo + 1)
            n_steps_ch = (n_abs + 1) // 2
            kernel_ch = functools.partial(
                _chained_ragged_kernel, Ti, To, S_k, B, W, n_abs,
                n_chunks, precision, split, rescale_every, sink, classes,
                n_chain)
            call_ch = pl.pallas_call(
                kernel_ch,
                grid=(n_steps_ch,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
                    pl.BlockSpec((1, 2, 4, cells), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),   # tok+meta
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # icell
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_chain, cells),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((S_k, cells), jnp.float32),
                    pltpu.VMEM((S_k, cells), jnp.float32),
                    pltpu.VMEM((1, cells), jnp.float32),
                    pltpu.VMEM((1, cells), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
                interpret=interpret,
            )

            @jax.jit
            def forward_chained_ragged(in_toks, out_toks, in_lens,
                                       out_lens):
                """Ragged batch with SHARED per-chain stagger: sequences
                are length-sorted (inside jit, inverse-permuted on
                return) into chains of B, and every window advances
                chain k+1 at D[k+1] = D[k] + max_w ol[k, w] + 2 — the
                shared D makes the chain index a (T, W) table independent
                of the window, so every token gather is a contiguous
                B-row gather (the per-window-offset formulation gathered
                2.4e7 scalars and spent 1.1 s/call in XLA gather — 9x
                the kernel itself, measured on v5e). Sorting keeps the
                shared stagger tight: block maxima track block lengths.
                Validity/finish masks stay per-window (broadcast
                compares, no gathers)."""
                order = jnp.argsort(-out_lens.astype(jnp.int32),
                                    stable=True)
                inv = jnp.argsort(order, stable=True)
                in_s = in_toks[order].reshape(n_chain, B, Li) \
                    .astype(jnp.int32)
                out_s = out_toks[order].reshape(n_chain, B, Lo) \
                    .astype(jnp.int32)
                il3 = in_lens[order].reshape(n_chain, B).astype(jnp.int32)
                ol3 = out_lens[order].reshape(n_chain, B) \
                    .astype(jnp.int32)
                lomax = jnp.max(ol3, axis=1)                # (K,)
                D = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(lomax[:-1] + 2)])           # (K,)

                T_pad = 2 * n_steps_ch
                t_i = jnp.arange(T_pad)[:, None]            # (T, 1)
                i_i = jnp.arange(W)[None, :]                # (1, W)
                started = (D[None, None, :] + i_i[:, :, None]
                           <= t_i[:, :, None])              # (T, W, K)
                k_arr = jnp.sum(started, axis=2) - 1        # (T, W)
                kc = jnp.clip(k_arr, 0, n_chain - 1)
                okk = (k_arr >= 0) & (k_arr < n_chain)
                f_arr = t_i - D[kc] - i_i                   # (T, W)
                Li_c = max(Li, 1)
                Lo_c = max(Lo, 1)
                ic = jnp.broadcast_to(jnp.clip(i_i - 1, 0, Li_c - 1),
                                      kc.shape)
                oc = jnp.clip(f_arr - 1, 0, Lo_c - 1)
                xg = in_s[kc, :, ic]                        # (T, W, B)
                yg = out_s[kc, :, oc]
                il_sel = il3[kc, :]                         # (T, W, B)
                ol_sel = ol3[kc, :]
                valid = (okk & (f_arr >= 0))[:, :, None] \
                    & (f_arr[:, :, None] <= ol_sel) \
                    & (i_i[:, :, None] <= il_sel)
                flags = valid.astype(jnp.int32) \
                    + (valid & ((f_arr == 0) & (i_i == 0))[:, :, None]
                       ).astype(jnp.int32)
                fink = jnp.where(valid
                                 & (i_i[:, :, None] == il_sel)
                                 & (f_arr[:, :, None] == ol_sel),
                                 kc[:, :, None], -1)
                xtok = jnp.where(valid & ((i_i >= 1))[:, :, None]
                                 & (i_i[:, :, None] <= il_sel), xg, -1)
                ytok = jnp.where(valid & ((f_arr >= 1))[:, :, None]
                                 & (f_arr[:, :, None] <= ol_sel), yg, -1)

                def flat(a):                    # (T, W, B) -> (T, B*W)
                    return jnp.transpose(a, (0, 2, 1)).reshape(T_pad,
                                                               cells)
                tok = jnp.stack([flat(xtok), flat(ytok), flat(fink),
                                 flat(flags)], axis=1) \
                    .reshape(n_steps_ch, 2, 4, cells)
                res = call_ch(jnp.array(m_ud_hi), jnp.array(m_left_hi),
                              jnp.array(m_ud_lo), jnp.array(m_left_lo),
                              jnp.array(c0), jnp.array(w_vec), tok,
                              jnp.array(i_cell))
                lanes = jnp.arange(B)[None, :] * W + il3    # (K, B)
                sorted_res = jnp.take_along_axis(
                    res, lanes.reshape(n_chain, B), axis=1) \
                    .reshape(B_total)
                return sorted_res[inv]

            return forward_chained_ragged

        if variant == "chained":
            sigma = Lo + 2
            n_abs = sigma * (n_chain - 1) + Li + Lo + 1
            n_steps_ch = (n_abs + 1) // 2
            kernel_ch = functools.partial(
                _chained_kernel, Ti, To, S_k, B, W, Li, Lo, n_chunks,
                precision, split, rescale_every, sink, classes, n_chain,
                sigma)
            call_ch = pl.pallas_call(
                kernel_ch,
                grid=(n_steps_ch,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
                    pl.BlockSpec((1, 2, 2, cells), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),   # token stream
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # icell
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_chain, cells),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((S_k, cells), jnp.float32),
                    pltpu.VMEM((S_k, cells), jnp.float32),
                    pltpu.VMEM((1, cells), jnp.float32),
                    pltpu.VMEM((1, cells), jnp.float32),
                    pltpu.VMEM((1, cells), jnp.int32),       # floc
                    pltpu.VMEM((1, cells), jnp.int32),       # kidx
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
                interpret=interpret,
            )

            @jax.jit
            def forward_chained(in_toks, out_toks, in_lens, out_lens):
                # lengths assumed uniform == (Li, Lo); see docstring
                del in_lens, out_lens
                in3 = in_toks.reshape(n_chain, B, Li).astype(jnp.int32)
                out3 = out_toks.reshape(n_chain, B, Lo).astype(jnp.int32)
                T_pad = 2 * n_steps_ch
                t_idx = jnp.arange(T_pad)[:, None]
                i_idx = jnp.arange(W)[None, :]
                tmi = t_idx - i_idx                              # (T, W)
                k_arr = jnp.floor_divide(tmi, sigma)
                f_arr = tmi - sigma * k_arr
                kc = jnp.clip(k_arr, 0, n_chain - 1)
                okk = (k_arr >= 0) & (k_arr < n_chain)
                ic = jnp.broadcast_to(jnp.clip(i_idx - 1, 0, Li - 1),
                                      (T_pad, W))
                xg = in3[kc, :, ic]                              # (T, W, B)
                x_ok = okk & (i_idx >= 1) & (i_idx <= Li)
                xtok = jnp.where(x_ok[:, :, None], xg, -1)
                oc = jnp.clip(f_arr - 1, 0, Lo - 1)
                yg = out3[kc, :, oc]
                y_ok = okk & (f_arr >= 1) & (f_arr <= Lo)
                ytok = jnp.where(y_ok[:, :, None], yg, -1)
                # (T, W, B) -> (T, B, W) -> (n_steps, even/odd, x/y, cells)
                xs = jnp.transpose(xtok, (0, 2, 1)).reshape(T_pad, cells)
                ys = jnp.transpose(ytok, (0, 2, 1)).reshape(T_pad, cells)
                tok = jnp.stack([xs, ys], axis=1) \
                    .reshape(n_steps_ch, 2, 2, cells)
                res = call_ch(jnp.array(m_ud_hi), jnp.array(m_left_hi),
                              jnp.array(m_ud_lo), jnp.array(m_left_lo),
                              jnp.array(c0), jnp.array(w_vec), tok,
                              jnp.array(i_cell))
                lanes = jnp.arange(B) * W + Li
                return res[:, lanes].reshape(B_total)

            return forward_chained

        kernel = functools.partial(_merged_kernel, Ti, To, S_k, B, W, Li,
                                   Lo, n_chunks, precision, split,
                                   rescale_every, sink, classes)
        n_steps = (Li + Lo) // 2 + 1
        call = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
                pl.BlockSpec(memory_space=pltpu.VMEM),           # xoh
                pl.BlockSpec((1, 2, To, cells), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),           # ydiag
                pl.BlockSpec(memory_space=pltpu.VMEM),           # icell
                pl.BlockSpec(memory_space=pltpu.VMEM),           # dfin
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, cells), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((S_k, cells), jnp.float32),
                pltpu.VMEM((S_k, cells), jnp.float32),
                pltpu.VMEM((1, cells), jnp.float32),
                pltpu.VMEM((1, cells), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )

        @jax.jit
        def forward_merged(in_toks, out_toks, in_lens, out_lens):
            xoh_t, ydiag, dfin_cells, cell_ids = _prep(in_toks, out_toks,
                                                       in_lens, out_lens)
            pad_rows = 2 * n_steps - n_diags
            ydiag2 = jnp.concatenate(
                [ydiag, jnp.zeros((pad_rows, To, cells), jnp.float32)],
                axis=0).reshape(n_steps, 2, To, cells)
            res_cells = call(jnp.array(m_ud_hi), jnp.array(m_left_hi),
                             jnp.array(m_ud_lo), jnp.array(m_left_lo),
                             jnp.array(c0), jnp.array(w_vec), xoh_t,
                             ydiag2, jnp.array(i_cell), dfin_cells)
            return res_cells[0, cell_ids]

    kernel = functools.partial(_wavefront_kernel, Ti, To, S, B, W, Li,
                               Lo, n_chunks, precision, split)

    call2 = pl.pallas_call(
        kernel,
        grid=(n_diags,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),           # xoh
            pl.BlockSpec((1, To, cells), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),           # ydiag
            pl.BlockSpec(memory_space=pltpu.VMEM),           # icell
            pl.BlockSpec(memory_space=pltpu.VMEM),           # dfin
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, cells), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((S, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
            pltpu.VMEM((1, cells), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def forward(in_toks, out_toks, in_lens, out_lens):
        xoh_t, ydiag, dfin_cells, cell_ids = _prep(in_toks, out_toks,
                                                   in_lens, out_lens)
        res_cells = call2(jnp.array(diag2_hi), jnp.array(left_hi),
                          jnp.array(up_hi), jnp.array(closure_hi),
                          jnp.array(diag2_lo), jnp.array(left_lo),
                          jnp.array(up_lo), jnp.array(closure_lo),
                          xoh_t, ydiag, jnp.array(i_cell), dfin_cells)
        return res_cells[0, cell_ids]

    return forward_merged if merged else forward
