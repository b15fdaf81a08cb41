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

    def maxplus_pass(acc_ref, mrot_ref, K, src_ref, sl_c):
        """acc[r, c] = max(acc[r, c], max_k mrot[:, k] + src[k, c]),
        rotating mrot one lane left per k so column k is always lane 0."""
        def step(k, _):
            col = mrot_ref[:, 0:1]                       # (R, 1)
            row = src_ref[pl.ds(k, 1), sl_c]             # (1, chunk)
            acc_ref[:, sl_c] = jnp.maximum(acc_ref[:, sl_c], col + row)
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
                acc[:, sl_c] = jnp.full((To * S, chunk), NEG_INF,
                                        jnp.float32)
            if has_up:
                maxplus_pass(acc, mrot_u, S, p1_ref, sl_c)
            if has_diag:
                v_dg = jnp.where(bnd, pltpu.roll(p2_ref[:, sl_c], 1, 1),
                                 NEG_INF)
                for t in range(Ti):
                    zbuf[t * S:(t + 1) * S, sl_c] = \
                        v_dg + xneg[t:t + 1, sl_c]
                maxplus_pass(acc, mrot_d, Ti * S, zbuf, sl_c)
            if has_left:
                vnbr[:, sl_c] = jnp.where(
                    bnd, pltpu.roll(p1_ref[:, sl_c], 1, 1), NEG_INF)
                accl[:, sl_c] = jnp.full((Ti * S, chunk), NEG_INF,
                                         jnp.float32)
                maxplus_pass(accl, mrot_l, S, vnbr, sl_c)

        # token-block selection over the full row
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


def make_wavefront_viterbi(a_diag, a_left, a_up, closure, B, Li, Lo,
                           n_chunks=None, interpret=False):
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

    def lg(a):
        return np.maximum(np.asarray(a, np.float64), NEG_INF)

    dg, lf, up, cl = lg(a_diag), lg(a_left), lg(a_up), lg(closure)
    has_up = bool((up > NEG_INF / 2).any())
    has_left = bool((lf > NEG_INF / 2).any())
    has_diag = bool((dg > NEG_INF / 2).any())
    if not (has_up or has_left or has_diag):
        has_diag = True
    classes = (has_up, has_left, has_diag)

    # closure-folded, transposed class matrices:
    #   MU[(ty, s'), s]      = (A_up[ty] (x)mp C)[s, s']
    #   MD[(ty, s'), (ti,s)] = (A_diag[ti,ty] (x)mp C)[s, s']
    #   ML[(ti, s'), s]      = (A_left[ti] (x)mp C)[s, s']
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
    mu, md, ml = clamp32(mu), clamp32(md), clamp32(ml)
    c0 = clamp32(cl[0:1, :].T)                           # (S, 1)

    i_cell = np.tile(np.arange(W, dtype=np.int32), B)[None, :]
    n_diags = Li + Lo + 1

    kernel = functools.partial(_viterbi_kernel, Ti, To, S, B, W, Li, Lo,
                               n_chunks, classes)
    scratch = [
        pltpu.VMEM((S, cells), jnp.float32),             # slabA
        pltpu.VMEM((S, cells), jnp.float32),             # slabB
        pltpu.VMEM((To * S if (has_up or has_diag) else 8, cells),
                   jnp.float32),                         # acc (up+diag)
        pltpu.VMEM((Ti * S if has_left else 8, cells), jnp.float32),
        pltpu.VMEM((Ti * S if has_diag else 8, cells), jnp.float32),
        pltpu.VMEM((S if has_left else 8, cells), jnp.float32),  # vnbr
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
