"""Scaled-probability wavefront: the high-throughput Forward engine.

Each diagonal slab is carried as (p, m): probabilities p in [0,1] with a
per-cell log-scale m, i.e. cell = p * exp(m). Because the semiring matmul
is linear in the cell row, all matrix products run in PLAIN probability
space on the MXU — exp/log appear only on the (batch, diagonal) scalar
scales, once per step. Token-conditioned matrices are concatenated along
the output dimension into one wide matmul per neighbor class (diag 16*S,
left/up 4*S for DNA), keeping the systolic array full instead of looping
per token.

Compared to ops/wavefront.py (log-domain, per-token matmuls) this removes
~25x of VPU transcendental work per step and runs the matmuls at HIGH
(3-pass) precision, which is bit-comparable to f32 for [0,1] operands.
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _prep_prob_mats(a_diag, a_left, a_up, closure):
    """Exponentiate log matrices and concatenate token variants column-wise.

    Returns (diag_cat (S, Ti*To*S), left_cat (S, Ti*S), up_cat (S, To*S),
    closure_p (S, S)) in probability space."""
    Ti, To, S, _ = a_diag.shape
    diag_p = jnp.exp(jnp.maximum(a_diag, NEG_INF))
    left_p = jnp.exp(jnp.maximum(a_left, NEG_INF))
    up_p = jnp.exp(jnp.maximum(a_up, NEG_INF))
    closure_p = jnp.exp(jnp.maximum(closure, NEG_INF))
    diag_cat = jnp.transpose(diag_p.reshape(Ti * To, S, S),
                             (1, 0, 2)).reshape(S, Ti * To * S)
    left_cat = jnp.transpose(left_p, (1, 0, 2)).reshape(S, Ti * S)
    up_cat = jnp.transpose(up_p, (1, 0, 2)).reshape(S, To * S)
    return diag_cat, left_cat, up_cat, closure_p


def _mm(x, m, precision):
    return jnp.matmul(x, m, precision=precision,
                      preferred_element_type=jnp.float32)


def _pick(y, tok, S):
    """y: (B, W, T*S); tok: (B, W) -> (B, W, S) selecting token block."""
    B, W, TS = y.shape
    y4 = y.reshape(B, W, TS // S, S)
    picked = jnp.take_along_axis(
        y4, tok[:, :, None, None].astype(jnp.int32), axis=2)
    return picked[:, :, 0, :]


@partial(jax.jit, static_argnames=("precision",))
def forward_2d_wavefront_fast(a_diag, a_left, a_up, closure, in_toks,
                              out_toks, in_lens, out_lens,
                              precision=jax.lax.Precision.HIGH):
    """Batched 2D Forward log-likelihoods; arguments as in
    wavefront.forward_2d_wavefront (log-space machine tensors)."""
    Ti, To, S, _ = a_diag.shape
    B, Li = in_toks.shape
    Lo = out_toks.shape[1]
    W = Li + 1
    f32 = jnp.float32

    diag_cat, left_cat, up_cat, closure_p = _prep_prob_mats(
        a_diag, a_left, a_up, closure)

    x_tok = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), in_toks.astype(jnp.int32)], axis=1)

    # initial diagonal: cell(0,0) = e0 . closure
    p0 = jnp.zeros((B, W, S), f32)
    p0 = p0.at[:, 0, :].set(jnp.broadcast_to(closure_p[0], (B, S)))
    m0 = jnp.full((B, W), 0.0, f32)
    # normalize
    mx0 = jnp.max(p0, axis=-1)
    m0 = jnp.where(mx0 > 0, jnp.log(jnp.maximum(mx0, 1e-37)), NEG_INF)
    p0 = p0 / jnp.maximum(mx0, 1e-37)[:, :, None]

    i_idx = jnp.arange(W)
    b_idx = jnp.arange(B)
    d_final = (in_lens + out_lens).astype(jnp.int32)
    il = in_lens.astype(jnp.int32)

    zerop = jnp.zeros((B, 1, S), f32)
    zerom = jnp.full((B, 1), NEG_INF, f32)

    def step(carry, d):
        p1, m1, p2, m2, res = carry
        o_idx = d - i_idx
        o_safe = jnp.clip(o_idx - 1, 0, Lo - 1)
        y_tok = out_toks[:, o_safe].astype(jnp.int32)

        flat1 = p1.reshape(B * W, S)
        up_all = _mm(flat1, up_cat, precision).reshape(B, W, To, S)
        up = jnp.take_along_axis(
            up_all, y_tok[:, :, None, None], axis=2)[:, :, 0, :]
        up_m = m1

        left_all = _mm(flat1, left_cat, precision).reshape(B, W, Ti, S)
        # cell i reads neighbor i-1 with matrix A_left[x_i]: select the
        # DESTINATION cell's token from the neighbor's matmul results
        left_pick = jnp.take_along_axis(
            left_all[:, :-1], x_tok[:, 1:, None, None], axis=2)[:, :, 0, :]
        left = jnp.concatenate([zerop, left_pick], axis=1)
        left_m = jnp.concatenate([zerom, m1[:, :-1]], axis=1)

        flat2 = p2.reshape(B * W, S)
        diag_all = _mm(flat2, diag_cat, precision).reshape(B, W, Ti * To, S)
        pair = x_tok * To + y_tok
        diag_pick = jnp.take_along_axis(
            diag_all[:, :-1], pair[:, 1:, None, None], axis=2)[:, :, 0, :]
        dg = jnp.concatenate([zerop, diag_pick], axis=1)
        dg_m = jnp.concatenate([zerom, m2[:, :-1]], axis=1)

        # combine three contributions with per-cell rescaling
        mmax = jnp.maximum(jnp.maximum(up_m, left_m), dg_m)
        safe = jnp.where(mmax > NEG_INF / 2, mmax, 0.0)
        u = (up * jnp.exp(up_m - safe)[:, :, None]
             + left * jnp.exp(left_m - safe)[:, :, None]
             + dg * jnp.exp(dg_m - safe)[:, :, None])
        cur = _mm(u.reshape(B * W, S), closure_p, precision).reshape(B, W, S)
        # renormalize to keep p in [0,1]
        mx = jnp.max(cur, axis=-1)
        has = mx > 0
        cur = cur / jnp.maximum(mx, 1e-37)[:, :, None]
        m_new = jnp.where(has, safe + jnp.log(jnp.maximum(mx, 1e-37)),
                          NEG_INF)
        valid = (o_idx >= 0) & (o_idx <= Lo)
        cur = jnp.where(valid[None, :, None] & has[:, :, None], cur, 0.0)
        m_new = jnp.where(valid[None, :] & has, m_new, NEG_INF)

        cell_val = m_new[b_idx, il] + jnp.log(
            jnp.maximum(cur[b_idx, il, S - 1], 1e-37))
        cell_val = jnp.where(cur[b_idx, il, S - 1] > 0, cell_val, NEG_INF)
        res = jnp.where(d == d_final, cell_val, res)
        return (cur, m_new, p1, m1, res), None

    res0_val = m0[b_idx, il] + jnp.log(jnp.maximum(p0[b_idx, il, S - 1],
                                                   1e-37))
    res0 = jnp.where((d_final == 0) & (p0[b_idx, il, S - 1] > 0), res0_val,
                     jnp.full((B,), NEG_INF, f32))
    ds = jnp.arange(1, Li + Lo + 1)
    init = (p0, m0, jnp.zeros_like(p0), jnp.full_like(m0, NEG_INF), res0)
    (_, _, _, _, res), _ = jax.lax.scan(step, init, ds)
    return res
