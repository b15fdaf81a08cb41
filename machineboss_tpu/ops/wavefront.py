"""Anti-diagonal wavefront 2D DP — the per-chip speed-of-light engine.

Instead of nested scans (dp2d.py), scan over anti-diagonals d = i + o:
every cell on a diagonal depends only on diagonals d-1 and d-2, so each
step updates a whole (batch, diagonal) slab at once. Token-conditioned
transition matrices are handled MXU-style: for each token value t the slab
is multiplied by the SHARED matrix M_t (a full-size real matmul via the
log-semiring max-shift trick), then per-cell results are selected by the
cell's token — trading a small-alphabet redundancy factor for full systolic
array utilization. Sequential depth is Li + Lo instead of Li * Lo.

Best for small alphabets (DNA). The generic row-scan engine (dp2d.py)
remains the fallback for wide-alphabet or tiny-state machines.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, NEG_INF


def _apply_all_tokens(x, mats, sr):
    """x: (B, L, S); mats: (T, S, S) shared across batch.
    Returns (T, B, L, S): x (x) mats[t] for every token value t."""
    B, L, S = x.shape
    flat = x.reshape(1, B * L, S)
    out = sr.matmul(flat, mats[:, None, :, :].reshape(mats.shape[0], S, S))
    return out.reshape(mats.shape[0], B, L, S)


def _select_tokens(y, tok_idx):
    """y: (T, B, L, S); tok_idx: (B, L) -> out[b,l,s] = y[tok[b,l],b,l,s]."""
    y2 = jnp.moveaxis(y, 0, 2)                        # (B, L, T, S)
    picked = jnp.take_along_axis(
        y2, tok_idx[:, :, None, None].astype(jnp.int32), axis=2)
    return picked[:, :, 0, :]


@partial(jax.jit, static_argnames=("sr",))
def forward_2d_wavefront(a_diag, a_left, a_up, closure, in_toks, out_toks,
                         in_lens, out_lens, sr=LOGSUMEXP):
    """Batched 2D Forward by anti-diagonal wavefront.

    a_diag: (Ti, To, S, S); a_left: (Ti, S, S); a_up: (To, S, S);
    in_toks: (B, Li) 0-based; out_toks: (B, Lo); lens: (B,).
    Returns (B,) final log-likelihoods at (in_len, out_len, end state).
    """
    Ti, To, S, _ = a_diag.shape
    B, Li = in_toks.shape
    Lo = out_toks.shape[1]
    dtype = closure.dtype
    W = Li + 1  # diagonal storage width, indexed by i

    diag_mats = a_diag.reshape(Ti * To, S, S)

    # per-cell token indices, padded one step: x_tok[i] applies to cell i
    x_tok = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), in_toks.astype(jnp.int32)], axis=1)

    e0 = jnp.full((S,), sr.zero, dtype).at[0].set(sr.one)
    d0 = jnp.full((B, W, S), sr.zero, dtype)
    d0 = d0.at[:, 0, :].set(sr.vecmat(e0, closure)[None, :])

    i_idx = jnp.arange(W)
    b_idx = jnp.arange(B)
    d_final = (in_lens + out_lens).astype(jnp.int32)
    il = in_lens.astype(jnp.int32)

    def step(carry, d):
        prev1, prev2, res = carry  # diagonals d-1 and d-2: (B, W, S)
        # o index per cell on this diagonal
        o_idx = d - i_idx                                   # (W,)
        # tokens per cell: x_tok[:, i], y tok for o = out_toks[:, o-1]
        o_safe = jnp.clip(o_idx - 1, 0, Lo - 1)
        y_tok = out_toks[:, o_safe].astype(jnp.int32)       # (B, W)

        # left neighbor: cell(i-1, o) lives on prev1 at index i-1
        left_src = jnp.concatenate(
            [jnp.full((B, 1, S), sr.zero, dtype), prev1[:, :-1]], axis=1)
        left_all = _apply_all_tokens(left_src, a_left, sr)  # (Ti,B,W,S)
        left = _select_tokens(left_all, x_tok)

        # up neighbor: cell(i, o-1) lives on prev1 at index i
        up_all = _apply_all_tokens(prev1, a_up, sr)         # (To,B,W,S)
        up = _select_tokens(up_all, y_tok)

        # diagonal neighbor: cell(i-1, o-1) on prev2 at index i-1
        diag_src = jnp.concatenate(
            [jnp.full((B, 1, S), sr.zero, dtype), prev2[:, :-1]], axis=1)
        diag_all = _apply_all_tokens(diag_src, diag_mats, sr)
        pair_tok = x_tok * To + y_tok
        dg = _select_tokens(diag_all, pair_tok)

        u = sr.add(sr.add(left, up), dg)
        cur = sr.vecmat(u.reshape(B * W, S), closure).reshape(B, W, S)
        # mask out-of-lattice cells so they never contribute as neighbors of
        # the next diagonals (i > Li is impossible by construction of W)
        valid = (o_idx >= 0) & (o_idx <= Lo)
        cur = jnp.where(valid[None, :, None], cur, sr.zero)
        # capture each sequence's readout cell when its diagonal comes up
        res = jnp.where(d == d_final, cur[b_idx, il, S - 1], res)
        return (cur, prev1, res), None

    res0 = jnp.where(d_final == 0, d0[b_idx, il, S - 1],
                     jnp.full((B,), sr.zero, dtype))
    ds = jnp.arange(1, Li + Lo + 1)
    (_, _, res), _ = jax.lax.scan(
        step, (d0, jnp.full_like(d0, sr.zero), res0), ds)
    return res


@partial(jax.jit, static_argnames=("sr",))
def wavefront_2d_diagonals(a_diag, a_left, a_up, closure, in_toks, out_toks,
                           sr=LOGSUMEXP):
    """Batched wavefront that RETURNS every diagonal slab.

    Same recurrence as forward_2d_wavefront; output (n_diags, B, W, S)
    where slab d holds cells (i, o=d-i). With sr=MAXPLUS this is the
    device Viterbi fill whose reassembled lattice feeds the host traceback
    (the reference GPU package's viterbi+path capability,
    ref js/webgpu/machineboss-gpu.mjs:63)."""
    Ti, To, S, _ = a_diag.shape
    B, Li = in_toks.shape
    Lo = out_toks.shape[1]
    dtype = closure.dtype
    W = Li + 1

    diag_mats = a_diag.reshape(Ti * To, S, S)
    x_tok = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), in_toks.astype(jnp.int32)], axis=1)

    e0 = jnp.full((S,), sr.zero, dtype).at[0].set(sr.one)
    d0 = jnp.full((B, W, S), sr.zero, dtype)
    d0 = d0.at[:, 0, :].set(sr.vecmat(e0, closure)[None, :])

    i_idx = jnp.arange(W)

    def step(carry, d):
        prev1, prev2 = carry
        o_idx = d - i_idx
        o_safe = jnp.clip(o_idx - 1, 0, Lo - 1)
        y_tok = out_toks[:, o_safe].astype(jnp.int32)

        left_src = jnp.concatenate(
            [jnp.full((B, 1, S), sr.zero, dtype), prev1[:, :-1]], axis=1)
        left = _select_tokens(_apply_all_tokens(left_src, a_left, sr), x_tok)
        up = _select_tokens(_apply_all_tokens(prev1, a_up, sr), y_tok)
        diag_src = jnp.concatenate(
            [jnp.full((B, 1, S), sr.zero, dtype), prev2[:, :-1]], axis=1)
        dg = _select_tokens(_apply_all_tokens(diag_src, diag_mats, sr),
                            x_tok * To + y_tok)

        u = sr.add(sr.add(left, up), dg)
        cur = sr.vecmat(u.reshape(B * W, S), closure).reshape(B, W, S)
        valid = (o_idx >= 0) & (o_idx <= Lo)
        cur = jnp.where(valid[None, :, None], cur, sr.zero)
        return (cur, prev1), cur

    ds = jnp.arange(1, Li + Lo + 1)
    _, rest = jax.lax.scan(step, (d0, jnp.full_like(d0, sr.zero)), ds)
    return jnp.concatenate([d0[None], rest], axis=0)


def lattice_from_diagonals(diags, Li, Lo):
    """Host reassembly: (n_diags, B, W, S) -> (B, Li+1, Lo+1, S)."""
    import numpy as np
    diags = np.asarray(diags)
    ii = np.arange(Li + 1)[:, None]
    oo = np.arange(Lo + 1)[None, :]
    lat = diags[ii + oo, :, ii, :]            # (Li+1, Lo+1, B, S)
    return np.transpose(lat, (2, 0, 1, 3))
