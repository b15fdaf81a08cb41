"""PSWM (profile) sequence inputs for the device DP engines.

A PSWM sequence is a (L, n_tokens) matrix of per-position log source
weights, column 0 = epsilon (position may be skipped with that weight),
columns 1.. = alphabet tokens — the uncertainty-aware generalization of a
token sequence (one-hot rows reduce exactly to the token case). Used for
base-caller posteriors (nanopore), sequence profiles, and soft labels.

The 1D transfer matrix for a PSWM position folds the emission distribution
into the token-conditioned matrices:

    M_p = [ sum_t exp(pswm[p, t]) * E_t  (+)  exp(pswm[p, 0]) * I ] (x) C
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, NEG_INF


def pswm_from_tokens(toks, n_tokens, dtype=jnp.float32):
    """One-hot log PSWM from a 0-based token sequence."""
    L = toks.shape[0]
    p = jnp.full((L, n_tokens + 1), NEG_INF, dtype)
    return p.at[jnp.arange(L), toks + 1].set(0.0)


@partial(jax.jit, static_argnames=("sr",))
def pswm_transfer_matrices(emit, closure, pswm, sr=LOGSUMEXP):
    """Per-position transfer matrices for a PSWM sequence.

    emit: (n_tok, S, S) token-conditioned emission matrices (closure NOT
    folded); closure: (S, S); pswm: (L, n_tok+1) log weights (col 0 = eps).
    Returns (L, S, S) matrices with closure folded on the right."""
    S = closure.shape[-1]
    # weighted logsumexp over token matrices + epsilon identity
    w_tok = pswm[:, 1:, None, None] + emit[None, :, :, :]  # (L, T, S, S)
    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, NEG_INF).astype(emit.dtype)
    w_eps = pswm[:, 0, None, None] + eye[None]             # (L, S, S)
    stacked = jnp.concatenate([w_tok, w_eps[:, None]], axis=1)
    m = sr.reduce(jnp.moveaxis(stacked, 1, -1), axis=-1)
    m = jnp.maximum(m, NEG_INF)
    return sr.matmul(m, closure[None])


@partial(jax.jit, static_argnames=("sr",))
def forward_1d_pswm(emit, closure, pswm, length, sr=LOGSUMEXP):
    """1D Forward over a PSWM sequence (scan strategy)."""
    S = closure.shape[-1]
    mats = pswm_transfer_matrices(emit, closure, pswm, sr=sr)
    e0 = jnp.full((S,), sr.zero, closure.dtype).at[0].set(sr.one)
    f0 = sr.vecmat(e0, closure)

    def step(f, inp):
        m, pos = inp
        f_new = sr.vecmat(f, m)
        return jnp.where(pos < length, f_new, f), None

    fL, _ = jax.lax.scan(step, f0, (mats, jnp.arange(mats.shape[0])))
    return fL[S - 1]


@partial(jax.jit, static_argnames=("sr",))
def forward_2d_pswm(a_diag, a_left, a_up, closure, in_pswm, out_pswm,
                    in_len, out_len, sr=LOGSUMEXP):
    """Pairwise Forward with PSWM inputs on both sides.

    in_pswm: (Li, Ti+1) log weights (col 0 = eps skip); out_pswm: (Lo, To+1).
    Per-position transfer matrices are the PSWM-weighted mixtures of the
    token-conditioned matrices; an eps column mixes in an identity 'skip'.
    """
    from . import dp2d
    Ti, To, S, _ = a_diag.shape
    dtype = closure.dtype
    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, NEG_INF).astype(dtype)

    def mix(pswm_row, mats, with_eps):
        # logsumexp_t pswm[t]*mats[t]  (+ eps * I)
        stacked = pswm_row[1:, None, None] + mats
        if with_eps:
            stacked = jnp.concatenate(
                [stacked, (pswm_row[0] + eye)[None]], axis=0)
        return sr.reduce(jnp.moveaxis(stacked, 0, -1), axis=-1)

    left_mats = jax.vmap(lambda r: mix(r, a_left, True))(in_pswm)
    up_mats = jax.vmap(lambda r: mix(r, a_up, True))(out_pswm)
    # diag: mix over input tokens first -> (Li, To, S, S)
    dx = jax.vmap(lambda r: r[1:, None, None, None] + a_diag)(in_pswm)
    dx = sr.reduce(jnp.moveaxis(dx, 1, -1), axis=-1)  # (Li, To, S, S)
    Li = in_pswm.shape[0]
    left_full = jnp.concatenate(
        [jnp.full((1, S, S), sr.zero, dtype), left_mats], axis=0)

    e0 = jnp.full((S,), sr.zero, dtype).at[0].set(sr.one)
    u0 = jnp.full((Li + 1, S), sr.zero, dtype).at[0].set(e0)
    row0 = dp2d._row_scan(u0, left_full, closure, sr)

    def row_step(prev_row, inp):
        up_m, out_row = inp
        diag_m = sr.reduce(jnp.moveaxis(
            out_row[None, 1:, None, None] + dx, 1, -1), axis=-1)
        u_up = jax.vmap(lambda v: sr.vecmat(v, up_m))(prev_row)
        u_diag = jax.vmap(sr.vecmat)(prev_row[:-1], diag_m)
        u = u_up.at[1:].set(sr.add(u_up[1:], u_diag))
        row = dp2d._row_scan(u, left_full, closure, sr)
        return row, None

    final_row, _ = jax.lax.scan(row_step, row0, (up_mats, out_pswm))
    return final_row[in_len, S - 1]


@partial(jax.jit, static_argnames=("sr",))
def backward_1d_pswm(emit, closure, pswm, length, sr=LOGSUMEXP):
    """1D Backward over a PSWM sequence: reversed matvec scan. The total
    equals Forward (test invariant); the per-position backward vectors are
    the scan carries (posterior use)."""
    S = closure.shape[-1]
    mats = pswm_transfer_matrices(emit, closure, pswm, sr=sr)
    b_end = jnp.full((S,), sr.zero, closure.dtype).at[S - 1].set(sr.one)

    def step(b, inp):
        m, pos = inp
        b_new = sr.matvec(m, b)
        return jnp.where(pos < length, b_new, b), None

    L = mats.shape[0]
    b0, _ = jax.lax.scan(step, b_end, (mats, jnp.arange(L)), reverse=True)
    return sr.matvec(closure, b0)[0]


def reverse_tensors(a_diag, a_left, a_up, closure):
    """State-reversed machine tensors: transpose each matrix and flip the
    state order so end becomes start — Backward(M) = Forward(reverse(M))."""
    def rev(m):
        return jnp.flip(jnp.swapaxes(m, -1, -2), axis=(-1, -2))
    return rev(a_diag), rev(a_left), rev(a_up), rev(closure)


@partial(jax.jit, static_argnames=("sr",))
def backward_2d_pswm(a_diag, a_left, a_up, closure, in_pswm, out_pswm,
                     in_len, out_len, sr=LOGSUMEXP):
    """Pairwise Backward with PSWM inputs: Forward on the state-reversed
    machine over the reversed profiles. Padding rows must sit at the END
    of the pswm arrays (as in forward); they are rolled to keep the live
    positions adjacent after reversal."""
    ad, al, au, cl = reverse_tensors(a_diag, a_left, a_up, closure)
    Li = in_pswm.shape[0]
    Lo = out_pswm.shape[0]
    ip = jnp.roll(jnp.flip(in_pswm, 0), Li - in_len, axis=0) \
        if Li else in_pswm
    op = jnp.roll(jnp.flip(out_pswm, 0), Lo - out_len, axis=0) \
        if Lo else out_pswm
    return forward_2d_pswm(ad, al, au, cl, ip, op, in_len, out_len, sr=sr)
