"""Pallas TPU wavefront MAXPLUS (Viterbi) kernel with lattice streaming.

The Forward wavefront kernel (wavefront_kernel.py) rides the MXU because
log-sum-exp matvecs become real matmuls under the scaled-probability carry.
Max-plus has no MXU form (the systolic array only does sum-of-products), so
the Viterbi fill is a VPU kernel: per diagonal, each transition class
contributes

    out[(t, s'), c] = max_s ( v_nbr[s, c] + M_t[s, s'] )

computed as K sequential rank-1 "outer add + max" updates
(col_k (R, 1) + row_k (1, cells), then elementwise max into the (R, cells)
accumulator), followed by a per-cell token-block selection. Matrix columns
are extracted by ROTATING the (R, K) matrix one lane per iteration and
always reading lane 0 — K rolls return the matrix to identity, and the roll
traffic (K*R per diagonal) is negligible next to the K*R*cells compute.

Unlike the Forward kernel, every diagonal slab is STREAMED to HBM (grid-
indexed output block), because the point of device Viterbi is the value
lattice that the host traceback walks (algo/viterbi_device.py). Values are
carried directly in log space (max-plus never overflows), so there is no
scale bookkeeping at all.

Reference capability: viterbi(+path) on GPU in the WebGPU package
(ref js/webgpu/machineboss-gpu.mjs:63, shaders/wavefront-viterbi.wgsl).
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


def _mp_mat(a, b):
    """Max-plus matrix product: out[s, s'] = max_m a[s, m] + b[m, s']."""
    return (a[:, :, None] + b[None, :, :]).max(axis=1)


def _viterbi_kernel(Ti, To, S, B, W, Li, Lo, n_chunks, classes,
                    # refs:
                    mu_ref, md_ref, ml_ref, c0_ref, xoh_ref, yoh_ref,
                    icell_ref,
                    lat_ref,
                    slabA, slabB, acc, accl, zbuf, vnbr,
                    mrot_u, mrot_d, mrot_l):
    """One anti-diagonal per grid step; lat_ref is this step's (1, S, cells)
    output block. classes = (has_up, has_left, has_diag)."""
    has_up, has_left, has_diag = classes
    d = pl.program_id(0)
    cells = B * W
    chunk = cells // n_chunks
    i_cells = icell_ref[:]

    @pl.when(d == 0)
    def _init():
        valid0 = i_cells == 0
        v0 = c0_ref[:] + jnp.where(valid0, 0.0, NEG_INF)
        v0 = jnp.maximum(v0, NEG_INF)
        slabB[:] = v0
        slabA[:] = jnp.full_like(slabA, NEG_INF)
        lat_ref[0] = v0
        # preload the rotating matrix copies once; each body pass performs
        # exactly K rolls per chunk, returning them to this state
        if has_up:
            mrot_u[:] = mu_ref[:]
        if has_diag:
            mrot_d[:] = md_ref[:]
        if has_left:
            mrot_l[:] = ml_ref[:]

    def maxplus_pass(acc_ref, mrot_ref, K, src_ref, sl_c, src_chunk):
        """acc[r, c] = max(acc[r, c], max_k mrot[:, k] + src[k, c]),
        rotating mrot one lane left per k so column k is always lane 0.
        acc_ref/src local refs are chunk-sized; src_ref may be the full
        slab (sliced by sl_c) or an already-chunked scratch."""
        def step(k, _):
            col = mrot_ref[:, 0:1]                       # (R, 1)
            if src_chunk:
                row = src_ref[pl.ds(k, 1), :]            # (1, chunk)
            else:
                row = src_ref[pl.ds(k, 1), sl_c]
            acc_ref[:] = jnp.maximum(acc_ref[:], col + row)
            mrot_ref[:] = pltpu.roll(mrot_ref[:], K - 1, 1)
            return 0
        jax.lax.fori_loop(0, K, step, 0)

    def body(p1_ref, p2_ref, cur_write):
        valid = (i_cells <= d) & (i_cells >= d - Lo) & (i_cells <= Li)
        boundary = i_cells > 0
        xneg = jnp.where(xoh_ref[:] > 0.5, 0.0, NEG_INF)    # (Ti, cells)
        yneg = jnp.where(yoh_ref[0] > 0.5, 0.0, NEG_INF)    # (To, cells)

        for c in range(n_chunks):
            sl_c = slice(c * chunk, (c + 1) * chunk)
            bnd = boundary[:, sl_c]
            if has_up or has_diag:
                acc[:] = jnp.full((To * S, chunk), NEG_INF, jnp.float32)
            if has_up:
                maxplus_pass(acc, mrot_u, S, p1_ref, sl_c, False)
            if has_diag:
                v_dg = jnp.where(bnd, pltpu.roll(p2_ref[:, sl_c], 1, 1),
                                 NEG_INF)
                for t in range(Ti):
                    zbuf[t * S:(t + 1) * S, :] = \
                        v_dg + xneg[t:t + 1, sl_c]
                maxplus_pass(acc, mrot_d, Ti * S, zbuf, sl_c, True)
            if has_left:
                vnbr[:] = jnp.where(
                    bnd, pltpu.roll(p1_ref[:, sl_c], 1, 1), NEG_INF)
                accl[:] = jnp.full((Ti * S, chunk), NEG_INF, jnp.float32)
                maxplus_pass(accl, mrot_l, S, vnbr, sl_c, True)

            # token-block selection for this chunk
            cur = None
            if has_up or has_diag:
                a = acc[:]
                cur = a[0:S, :] + yneg[0:1, sl_c]
                for t in range(1, To):
                    cur = jnp.maximum(cur, a[t * S:(t + 1) * S, :]
                                      + yneg[t:t + 1, sl_c])
            if has_left:
                al = accl[:]
                curl = al[0:S, :] + xneg[0:1, sl_c]
                for t in range(1, Ti):
                    curl = jnp.maximum(curl, al[t * S:(t + 1) * S, :]
                                       + xneg[t:t + 1, sl_c])
                cur = curl if cur is None else jnp.maximum(cur, curl)
            cur = jnp.maximum(jnp.where(valid[:, sl_c], cur, NEG_INF),
                              NEG_INF)
            cur_write[:, sl_c] = cur
            lat_ref[0, :, sl_c] = cur

    @pl.when((d > 0) & (d % 2 == 1))
    def _odd():
        body(slabB, slabA, slabA)

    @pl.when((d > 0) & (d % 2 == 0))
    def _even():
        body(slabA, slabB, slabB)


def maxplus_class_mats(a_diag, a_left, a_up, closure):
    """Closure-folded, transposed class matrices shared by the full and
    banded MAXPLUS kernels (the host-side _mp_mat folds here are ~2 s at
    S=64 — build once per machine and pass as `premats`):
      MU[(ty, s'), s]      = (A_up[ty] (x)mp C)[s, s']
      MD[(ty, s'), (ti,s)] = (A_diag[ti,ty] (x)mp C)[s, s']
      ML[(ti, s'), s]      = (A_left[ti] (x)mp C)[s, s']
    Returns (mu, md, ml, c0_row, classes)."""
    Ti, To, S, _ = a_diag.shape

    def lg(a):
        return np.maximum(np.asarray(a, np.float64), NEG_INF)

    dg, lf, up, cl = lg(a_diag), lg(a_left), lg(a_up), lg(closure)
    has_up = bool((up > NEG_INF / 2).any())
    has_left = bool((lf > NEG_INF / 2).any())
    has_diag = bool((dg > NEG_INF / 2).any())
    if not (has_up or has_left or has_diag):
        has_diag = True
    classes = (has_up, has_left, has_diag)

    def clamp32(m):
        return np.maximum(m, NEG_INF).astype(np.float32)

    mu = np.concatenate([_mp_mat(up[t], cl).T for t in range(To)], axis=0) \
        if has_up else np.full((8, 128), NEG_INF)
    md = np.full((To * S, Ti * S), NEG_INF)
    if has_diag:
        for ty in range(To):
            for ti in range(Ti):
                md[ty * S:(ty + 1) * S, ti * S:(ti + 1) * S] = \
                    _mp_mat(dg[ti, ty], cl).T
    else:
        md = np.full((8, 128), NEG_INF)
    ml = np.concatenate([_mp_mat(lf[t], cl).T for t in range(Ti)], axis=0) \
        if has_left else np.full((8, 128), NEG_INF)
    c0_row = clamp32(cl[0:1, :].T)                       # (S, 1)
    return clamp32(mu), clamp32(md), clamp32(ml), c0_row, classes


def make_wavefront_viterbi(a_diag, a_left, a_up, closure, B, Li, Lo,
                           n_chunks=None, interpret=False, premats=None):
    """Build the Pallas MAXPLUS wavefront for fixed machine tensors/shapes.

    Tensors are LOG-space max-plus matrices: a_diag (Ti, To, S, S), a_left
    (Ti, S, S), a_up (To, S, S), closure (S, S) = the max-plus silent
    closure (lowering.matrices_2d("maxplus")).

    Returns fn(in_toks (B, Li), out_toks (B, Lo)) -> (n_diags, B, W, S)
    diagonal slabs (W = lane-aligned Li+1; slab d holds cells (i, o=d-i)),
    ready for ops/wavefront.lattice_from_diagonals + host traceback.
    """
    Ti, To, S, _ = a_diag.shape
    import math as _math
    W = _round_up(Li + 1, 16)
    cells = B * W
    chunk_base = W * 128 // _math.gcd(W, 128)
    if cells // chunk_base < 1:
        W = _round_up(Li + 1, 128)
        cells = B * W
        chunk_base = W * 128 // _math.gcd(W, 128)
    max_chunks = max(cells // chunk_base, 1)
    if n_chunks is None:
        # keep the (To*S, chunk) accumulator around ~8 MB
        target = max(1, (To * S * 4 * cells) // (8 << 20))
        n_chunks = 1
        for cand in range(max_chunks, 0, -1):
            if max_chunks % cand == 0 and cand <= target:
                n_chunks = cand
                break
    chunk0 = cells // n_chunks
    assert chunk0 * n_chunks == cells and chunk0 % 128 == 0 \
        and chunk0 % W == 0

    mu, md, ml, c0, classes = premats if premats is not None else \
        maxplus_class_mats(a_diag, a_left, a_up, closure)
    has_up, has_left, has_diag = classes

    i_cell = np.tile(np.arange(W, dtype=np.int32), B)[None, :]
    n_diags = Li + Lo + 1

    kernel = functools.partial(_viterbi_kernel, Ti, To, S, B, W, Li, Lo,
                               n_chunks, classes)
    # work scratch is CHUNK-sized, not cells-sized: at B=256 the old
    # (To*S, cells) accumulators alone were ~95 MB and blew the VMEM
    # budget (PERF.md round-3 "B=256 exceeds compiler limits" cliff)
    scratch = [
        pltpu.VMEM((S, cells), jnp.float32),             # slabA
        pltpu.VMEM((S, cells), jnp.float32),             # slabB
        pltpu.VMEM((To * S if (has_up or has_diag) else 8, chunk0),
                   jnp.float32),                         # acc (up+diag)
        pltpu.VMEM((Ti * S if has_left else 8, chunk0), jnp.float32),
        pltpu.VMEM((Ti * S if has_diag else 8, chunk0), jnp.float32),
        pltpu.VMEM((S if has_left else 8, chunk0), jnp.float32),  # vnbr
        pltpu.VMEM(mu.shape, jnp.float32),               # mrot_u
        pltpu.VMEM(md.shape, jnp.float32),               # mrot_d
        pltpu.VMEM(ml.shape, jnp.float32),               # mrot_l
    ]
    call = pl.pallas_call(
        kernel,
        grid=(n_diags,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),               # xoh
            pl.BlockSpec((1, To, cells), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),               # yoh
            pl.BlockSpec(memory_space=pltpu.VMEM),               # icell
        ],
        out_specs=pl.BlockSpec((1, S, cells), lambda d: (d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_diags, S, cells), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def viterbi(in_toks, out_toks):
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

        lat = call(jnp.array(mu), jnp.array(md), jnp.array(ml),
                   jnp.array(c0), xoh_t, ydiag, jnp.array(i_cell))
        # (n_diags, S, B*W) -> (n_diags, B, W, S)
        return jnp.transpose(lat.reshape(n_diags, S, B, W), (0, 2, 3, 1))

    return viterbi


# ------------------------------------------------------------------ banded

def _viterbi_banded_kernel(Ti, To, S, Wb, n_diags, classes,
                           # refs:
                           mu_ref, md_ref, ml_ref, c0_ref,
                           meta_ref,                     # SMEM scalars
                           xoh_ref, yoh_ref,
                           lat_ref,
                           slabA, slabB, acc, accl, zbuf, vnbr, vup,
                           mrot_u, mrot_d, mrot_l):
    """One anti-diagonal per grid step over a sliding band window.

    The lattice is restricted to a per-diagonal interval
    [lo_d, hi_d) of cell indices i; the window covers
    [base_d, base_d + Wb) with base_d non-decreasing by AT MOST 1 per
    diagonal (guaranteed for path±width envelopes — a guide alignment
    advances i by at most one per unit d — and enforced by the host
    builder). Neighbor windows therefore differ by shifts s1 = base_d -
    base_{d-1} in {0,1} and s2 = base_d - base_{d-2} in {0,1,2}, so
    neighbor access selects between STATIC pltpu.roll variants by a
    streamed SMEM scalar — no dynamic lane slicing (Mosaic requires
    128-aligned dynamic lane offsets; CLAUDE.md).

    meta_ref (VMEM, (8, 128) i32 blocks, row d%8 for diagonal d):
    columns [lo_d, hi_d, base_d, s1_d, s2_d, ...pad]. Streamed in
    8-row blocks because Mosaic requires sublane-divisible block shapes
    and a full (n_diags, .) scalar array blows the SMEM budget
    (both measured on v5e at L=1500). All uses stay VECTOR ops —
    (1,1)-sliced values broadcast against the window iota, so no
    vector-to-scalar extraction is ever needed.
    xoh/yoh: per-diagonal (Ti|To, Wb) one-hots for the window's cells.
    lat_ref: this diagonal's (1, S, Wb) window values.
    """
    has_up, has_left, has_diag = classes
    d = pl.program_id(0)
    mrow = meta_ref[d % 8, :]                              # (128,) i32
    lo = mrow[0:1][:, None]                                # (1, 1)
    hi = mrow[1:2][:, None]
    base = mrow[2:3][:, None]
    s1 = mrow[3:4][:, None]

    i_w = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    i_glob = base + i_w
    valid = (i_glob >= lo) & (i_glob < hi)

    @pl.when(d == 0)
    def _init():
        v0 = c0_ref[:] + jnp.where(i_glob == 0, 0.0, NEG_INF)
        v0 = jnp.maximum(jnp.where(valid, v0, NEG_INF), NEG_INF)
        slabB[:] = v0
        slabA[:] = jnp.full_like(slabA, NEG_INF)
        lat_ref[0] = v0
        if has_up:
            mrot_u[:] = mu_ref[:]
        if has_diag:
            mrot_d[:] = md_ref[:]
        if has_left:
            mrot_l[:] = ml_ref[:]

    def shifted(p_ref, shift, extra_left):
        """Neighbor slab aligned into this diagonal's window: value at
        window index w comes from prev index w + shift - extra_left
        (extra_left=1 for the i-1 neighbors). shift is a traced (1, 1)
        value in {0,1,2}; selection between the static roll variants is
        a broadcast where, and wrap positions are masked to NEG_INF."""
        p = p_ref[:]
        outs = []
        for sv in (0, 1, 2):
            net = sv - extra_left
            if net == 0:
                outs.append(p)
            else:
                # value[w] = p[w + net]  ==  roll left by net
                outs.append(pltpu.roll(p, (-net) % Wb, 1))
        # (1,1) -> (1,Wb) first: Mosaic cannot broadcast sublanes and
        # lanes in one step ("Broadcast in both sublanes and lanes")
        sh_w = jnp.broadcast_to(shift, (1, Wb))
        sel = jnp.where(sh_w == 0, outs[0],
                        jnp.where(sh_w == 1, outs[1], outs[2]))
        # mask positions whose source index w + shift - extra_left is
        # outside [0, Wb)
        src = i_w + shift - extra_left
        ok = (src >= 0) & (src < Wb)
        return jnp.where(ok, sel, NEG_INF)

    def maxplus_pass(acc_ref, mrot_ref, K, src_ref):
        # src must be a VMEM ref: Mosaic only lowers dynamic row slices
        # on refs (pl.ds), not on materialized values
        def step(k, _):
            col = mrot_ref[:, 0:1]
            row = src_ref[pl.ds(k, 1), :]
            acc_ref[:] = jnp.maximum(acc_ref[:], col + row)
            mrot_ref[:] = pltpu.roll(mrot_ref[:], K - 1, 1)
            return 0
        jax.lax.fori_loop(0, K, step, 0)

    def body(p1_ref, p2_ref, cur_write):
        s2 = mrow[4:5][:, None]
        xneg = jnp.where(xoh_ref[0] > 0.5, 0.0, NEG_INF)    # (Ti, Wb)
        yneg = jnp.where(yoh_ref[0] > 0.5, 0.0, NEG_INF)    # (To, Wb)

        if has_up or has_diag:
            acc[:] = jnp.full((To * S, Wb), NEG_INF, jnp.float32)
        if has_up:
            vup[:] = shifted(p1_ref, s1, 0)
            maxplus_pass(acc, mrot_u, S, vup)
        if has_diag:
            v_dg = shifted(p2_ref, s2, 1)
            for t in range(Ti):
                zbuf[t * S:(t + 1) * S, :] = v_dg + xneg[t:t + 1, :]
            maxplus_pass(acc, mrot_d, Ti * S, zbuf)
        if has_left:
            vnbr[:] = shifted(p1_ref, s1, 1)
            accl[:] = jnp.full((Ti * S, Wb), NEG_INF, jnp.float32)
            maxplus_pass(accl, mrot_l, S, vnbr)

        cur = None
        if has_up or has_diag:
            a = acc[:]
            cur = a[0:S, :] + yneg[0:1, :]
            for t in range(1, To):
                cur = jnp.maximum(cur, a[t * S:(t + 1) * S, :]
                                  + yneg[t:t + 1, :])
        if has_left:
            al = accl[:]
            curl = al[0:S, :] + xneg[0:1, :]
            for t in range(1, Ti):
                curl = jnp.maximum(curl, al[t * S:(t + 1) * S, :]
                                   + xneg[t:t + 1, :])
            cur = curl if cur is None else jnp.maximum(cur, curl)
        cur = jnp.maximum(jnp.where(valid, cur, NEG_INF), NEG_INF)
        cur_write[:] = cur
        lat_ref[0] = cur

    @pl.when((d > 0) & (d % 2 == 1))
    def _odd():
        body(slabB, slabA, slabA)

    @pl.when((d > 0) & (d % 2 == 0))
    def _even():
        body(slabA, slabB, slabB)


def band_windows(lo, hi, pad=128):
    """Window geometry for per-diagonal bands [lo_d, hi_d).

    Returns (bases, s1, Wb): non-decreasing bases advancing <= 1/step
    (clamped under lo_d where the band jumps faster — the window is then
    simply wider), and Wb = lane-aligned max(hi_d - base_d)."""
    n = len(lo)
    bases = np.zeros(n, np.int32)
    for d in range(1, n):
        bases[d] = min(max(bases[d - 1], 0) + 1, max(lo[d], 0))
        bases[d] = max(bases[d], bases[d - 1])
    w = max(int(hi[d] - bases[d]) for d in range(n))
    Wb = _round_up(max(w, 1), pad)
    s1 = np.zeros(n, np.int32)
    s1[1:] = bases[1:] - bases[:-1]
    assert (s1 >= 0).all() and (s1 <= 1).all()
    return bases, s1, Wb


def make_wavefront_viterbi_banded(a_diag, a_left, a_up, closure, Li, Lo,
                                  lo, hi, interpret=False, premats=None):
    """Envelope-banded Pallas MAXPLUS wavefront for ONE sequence pair.

    lo/hi: per-diagonal [lo_d, hi_d) bands of cell index i (from
    core.seqpair.Envelope via envelope_diag_bands). Only band cells are
    computed — the full-lattice kernel's per-diagonal work drops from
    O(W_full) to O(band width) lanes (the reference's --wiggle-room
    banding, ref src/seqpair.h:75-113, on the device fill path).

    Returns fn(in_toks (Li,), out_toks (Lo,)) -> (lattice (Li+1, Lo+1, S)
    ndarray with NEG_INF outside the band), for the host traceback."""
    Ti, To, S, _ = a_diag.shape
    n_diags = Li + Lo + 1
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    assert len(lo) == n_diags and len(hi) == n_diags
    bases, s1, Wb = band_windows(lo, hi)
    s2 = np.zeros(n_diags, np.int32)
    s2[2:] = bases[2:] - bases[:-2]
    s2[1] = bases[1] - bases[0]
    n_pad8 = _round_up(n_diags, 8)
    meta = np.zeros((n_pad8, 128), np.int32)
    meta[:n_diags, 0] = lo
    meta[:n_diags, 1] = hi
    meta[:n_diags, 2] = bases
    meta[:n_diags, 3] = s1
    meta[:n_diags, 4] = s2

    mu, md, ml, c0_row, classes = premats if premats is not None else \
        maxplus_class_mats(a_diag, a_left, a_up, closure)
    has_up, has_left, has_diag = classes
    c0 = np.ascontiguousarray(np.broadcast_to(c0_row, (S, Wb)))

    kernel = functools.partial(_viterbi_banded_kernel, Ti, To, S, Wb,
                               n_diags, classes)
    scratch = [
        pltpu.VMEM((S, Wb), jnp.float32),                # slabA
        pltpu.VMEM((S, Wb), jnp.float32),                # slabB
        pltpu.VMEM((To * S if (has_up or has_diag) else 8, Wb),
                   jnp.float32),                         # acc
        pltpu.VMEM((Ti * S if has_left else 8, Wb), jnp.float32),
        pltpu.VMEM((Ti * S if has_diag else 8, Wb), jnp.float32),
        pltpu.VMEM((S if has_left else 8, Wb), jnp.float32),
        pltpu.VMEM((S if has_up else 8, Wb), jnp.float32),   # vup
        pltpu.VMEM(mu.shape, jnp.float32),
        pltpu.VMEM(md.shape, jnp.float32),
        pltpu.VMEM(ml.shape, jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(n_diags,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec((8, 128), lambda d: (d // 8, 0),
                         memory_space=pltpu.VMEM),               # meta
            pl.BlockSpec((1, Ti, Wb), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),               # xoh
            pl.BlockSpec((1, To, Wb), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),               # yoh
        ],
        out_specs=pl.BlockSpec((1, S, Wb), lambda d: (d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_diags, S, Wb), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )

    # vectorized window geometry (python loops here were 10x the device
    # fill time at L=1500 — measured)
    ds_g = np.arange(n_diags)[:, None]                    # (n_diags, 1)
    ws_g = np.arange(Wb)[None, :]                         # (1, Wb)
    i_g = bases[:, None] + ws_g                           # (n_diags, Wb)
    o_g = ds_g - i_g
    in_band = (i_g >= lo[:, None]) & (i_g < hi[:, None]) & (o_g >= 0) \
        & (o_g <= Lo)
    mu_j, md_j, ml_j = jnp.array(mu), jnp.array(md), jnp.array(ml)
    c0_j, meta_j = jnp.array(c0), jnp.array(meta)

    def fill_raw(in_toks, out_toks):
        """Device band lattice (n_diags, S, Wb) — stays on device, for
        the on-device traceback walk (algo/traceback_device)."""
        in_toks = np.asarray(in_toks, np.int64)
        out_toks = np.asarray(out_toks, np.int64)
        # per-diagonal window one-hots: x token at cell i is
        # in_toks[i-1], y token at (i, o = d - i) is out_toks[o-1]
        xoh = np.zeros((n_diags, Ti, Wb), np.float32)
        yoh = np.zeros((n_diags, To, Wb), np.float32)
        xm = in_band & (i_g >= 1) & (i_g <= Li)
        if Li:
            xt = in_toks[np.clip(i_g - 1, 0, Li - 1)]
            dd, ww = np.nonzero(xm)
            xoh[dd, xt[dd, ww], ww] = 1.0
        ym = in_band & (o_g >= 1) & (o_g <= Lo)
        if Lo:
            yt = out_toks[np.clip(o_g - 1, 0, Lo - 1)]
            dd, ww = np.nonzero(ym)
            yoh[dd, yt[dd, ww], ww] = 1.0
        return call(mu_j, md_j, ml_j, c0_j, meta_j,
                    jnp.array(xoh), jnp.array(yoh))

    def scatter(lat):
        """Host (n_diags, S, Wb) windows -> full (Li+1, Lo+1, S)."""
        full = np.full((Li + 1, Lo + 1, S), NEG_INF, np.float64)
        dd, ww = np.nonzero(in_band & (i_g <= Li))
        full[i_g[dd, ww], o_g[dd, ww]] = lat[dd, :, ww]
        return full

    def viterbi(in_toks, out_toks):
        return scatter(np.asarray(fill_raw(in_toks, out_toks)))

    viterbi.fill_raw = fill_raw
    viterbi.scatter = scatter
    viterbi.bases = bases
    viterbi.Wb = Wb
    return viterbi


def envelope_diag_bands(env):
    """Per-diagonal [lo_d, hi_d) cell-index bands from a row Envelope
    (core.seqpair.Envelope: in_start[o] <= i < in_end[o])."""
    Li = env.in_len
    Lo = env.out_len
    n_diags = Li + Lo + 1
    lo = np.full(n_diags, 10**9, np.int64)
    hi = np.full(n_diags, -10**9, np.int64)
    cnt = np.zeros(n_diags, np.int64)
    for o in range(Lo + 1):
        for i in range(env.in_start[o], env.in_end[o]):
            d = i + o
            lo[d] = min(lo[d], i)
            hi[d] = max(hi[d], i + 1)
            cnt[d] += 1
    # The banded kernel fills the bounding interval [lo, hi) of each
    # diagonal; a non-contiguous cross-section (possible only for
    # hand-built envelopes, never for the CLI's guide-path +- width
    # bands) would silently admit out-of-envelope cells and can inflate
    # the device score vs the host env-restricted ViterbiMatrix.
    bad = (hi > lo) & (cnt != hi - lo)
    if bad.any():
        d = int(np.nonzero(bad)[0][0])
        raise ValueError(
            "envelope_diag_bands: diagonal %d cross-section is not "
            "contiguous (%d cells in [%d, %d)); the banded device kernel "
            "only supports per-diagonal interval envelopes — use the host "
            "engine for this envelope" % (d, cnt[d], lo[d], hi[d]))
    lo = np.where(hi > lo, lo, 0)
    hi = np.where(hi > lo, hi, 1)
    return lo, hi
