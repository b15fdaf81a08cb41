"""Pairwise (2D) DP engines on device.

The lattice cell(i, o, s) sums paths consuming input prefix i and emitting
output prefix o, ending in state s (same recurrence as the reference
interpreter, ref src/forward.defs.h:22-49, re-shaped for TPU):

  cell(i,o) = [ cell(i-1,o-1) (x) A_diag[x_i, y_o]
              (+) cell(i-1,o) (x) A_left[x_i]
              (+) cell(i,o-1) (x) A_up[y_o] ] (x) C

where C is the silent closure. Engines:

  forward_2d_rows : outer lax.scan over output rows, inner lax.scan over
                    input positions (O(Li*Lo*S^2) work).
  forward_2d_assoc: inner row solved by an associative scan over augmented
                    (S+1,S+1) affine matrices — log-depth per row, MXU
                    semiring matmuls (the transfer-matrix trick applied to
                    the in-row recurrence).

Both are jit-friendly and vmap-batchable; padded positions never feed the
cells that are read out, so ragged batches need no masking.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, MAXPLUS, NEG_INF


def _e0(S, dtype, sr):
    v = jnp.full((S,), sr.zero, dtype)
    return v.at[0].set(sr.one)


def _row_scan(u, left_mats, closure, sr):
    """Solve f_i = (u_i (+) f_{i-1} (x) left_mats_i) (x) C for all i.

    u: (Li+1, S) pre-closure contributions; left_mats: (Li+1, S, S) where
    entry 0 is unused. Returns (Li+1, S) post-closure cells."""
    f0 = sr.vecmat(u[0], closure)

    def step(f_prev, inp):
        u_i, m_i = inp
        f_i = sr.vecmat(sr.add(u_i, sr.vecmat(f_prev, m_i)), closure)
        return f_i, f_i

    _, rest = jax.lax.scan(step, f0, (u[1:], left_mats[1:]))
    return jnp.concatenate([f0[None], rest], axis=0)


def _row_assoc(u, left_mats, closure, sr):
    """Same as _row_scan but via associative affine composition.

    Affine step: f_i = f_{i-1} (x) M_i (+) v_i with M_i = left_i (x) C and
    v_i = u_i (x) C. Compose as (S+1,S+1) matrices [[M,0],[v,1]]."""
    S = u.shape[-1]
    dtype = u.dtype
    m = sr.matmul(left_mats[1:], closure[None])           # (Li, S, S)
    v = sr.vecmat(u[1:], closure[None])                   # (Li, S)
    L = m.shape[0]
    aug = jnp.full((L, S + 1, S + 1), sr.zero, dtype)
    aug = aug.at[:, :S, :S].set(m)
    aug = aug.at[:, S, :S].set(v)
    aug = aug.at[:, S, S].set(sr.one)
    prods = jax.lax.associative_scan(sr.matmul, aug)
    f0 = sr.vecmat(u[0], closure)
    f0aug = jnp.concatenate([f0, jnp.array([sr.one], dtype)])
    rows = sr.vecmat(f0aug[None, :], prods)[:, :S]        # (Li, S)
    return jnp.concatenate([f0[None], rows], axis=0)


def _forward_2d(a_diag, a_left, a_up, closure, in_toks, out_toks, row_solver,
                sr, want_lattice, start_vec=None):
    S = closure.shape[-1]
    Li = in_toks.shape[0]
    dtype = closure.dtype

    # pre-gather per-position matrices
    left_mats = jnp.concatenate(
        [jnp.full((1, S, S), sr.zero, dtype), a_left[in_toks]], axis=0)

    if start_vec is None:
        start_vec = _e0(S, dtype, sr)
    u0 = jnp.full((Li + 1, S), sr.zero, dtype).at[0].set(start_vec)
    row0 = row_solver(u0, left_mats, closure, sr)

    def row_step(prev_row, out_tok):
        up = a_up[out_tok]                                # (S, S)
        diag = a_diag[in_toks, out_tok]                   # (Li, S, S)
        u_up = sr.vecmat(prev_row, up[None])              # (Li+1, S)
        u_diag = jax.vmap(sr.vecmat)(prev_row[:-1], diag)  # (Li, S)
        u = u_up.at[1:].set(sr.add(u_up[1:], u_diag))
        row = row_solver(u, left_mats, closure, sr)
        return row, row if want_lattice else row

    last_row, rows = jax.lax.scan(row_step, row0, out_toks)
    lattice = jnp.concatenate([row0[None], rows], axis=0)  # (Lo+1, Li+1, S)
    return lattice


@partial(jax.jit, static_argnames=("sr", "assoc"))
def forward_2d(a_diag, a_left, a_up, closure, in_toks, out_toks,
               in_len, out_len, sr=LOGSUMEXP, assoc=False):
    """Log-likelihood (or Viterbi score) of the (in, out) pair."""
    solver = _row_assoc if assoc else _row_scan
    lattice = _forward_2d(a_diag, a_left, a_up, closure, in_toks, out_toks,
                          solver, sr, True)
    S = closure.shape[-1]
    return lattice[out_len, in_len, S - 1]


@partial(jax.jit, static_argnames=("sr", "assoc"))
def forward_2d_lattice(a_diag, a_left, a_up, closure, in_toks, out_toks,
                       sr=LOGSUMEXP, assoc=False):
    solver = _row_assoc if assoc else _row_scan
    return _forward_2d(a_diag, a_left, a_up, closure, in_toks, out_toks,
                       solver, sr, True)


@partial(jax.jit, static_argnames=("sr", "assoc"))
def backward_2d_lattice(a_diag, a_left, a_up, closure, in_toks, out_toks,
                        sr=LOGSUMEXP, assoc=False):
    """Backward lattice b(o,i,s) = combined weight of all paths from state s
    at lattice position (i,o) to the machine end after the full sequences.

    b satisfies the forward recurrence on the index-reversed problem with
    transposed matrices and the end state as start vector, so it reuses the
    forward engine directly (b includes the same-cell silent closure, like
    the reference BackwardMatrix)."""
    S = closure.shape[-1]
    solver = _row_assoc if assoc else _row_scan
    eN = jnp.full((S,), sr.zero, closure.dtype).at[S - 1].set(sr.one)
    lattice_r = _forward_2d(jnp.swapaxes(a_diag, -1, -2),
                            jnp.swapaxes(a_left, -1, -2),
                            jnp.swapaxes(a_up, -1, -2),
                            jnp.swapaxes(closure, -1, -2),
                            in_toks[::-1], out_toks[::-1],
                            solver, sr, True, start_vec=eN)
    return lattice_r[::-1, ::-1, :]


def _row_scan_banded(u, left_mats, closure, sr, in_band):
    """Banded row solver: cells outside the envelope band are forced to the
    semiring zero inside the recurrence, so in-row chains cannot pass
    through them (matching the host's banded DP exactly).

    in_band: (Li+1,) bool for this row."""
    f0 = sr.vecmat(u[0], closure)
    f0 = jnp.where(in_band[0], f0, sr.zero)

    def step(f_prev, inp):
        u_i, m_i, band_i = inp
        f_i = sr.vecmat(sr.add(u_i, sr.vecmat(f_prev, m_i)), closure)
        f_i = jnp.where(band_i, f_i, sr.zero)
        return f_i, f_i

    _, rest = jax.lax.scan(step, f0, (u[1:], left_mats[1:], in_band[1:]))
    return jnp.concatenate([f0[None], rest], axis=0)


@partial(jax.jit, static_argnames=("sr",))
def forward_2d_banded(a_diag, a_left, a_up, closure, in_toks, out_toks,
                      in_start, in_end, in_len, out_len, sr=LOGSUMEXP):
    """Envelope-banded 2D Forward (ref: the Envelope of src/seqpair.h:75-113
    lowered to per-row masks): cells with i outside [in_start[o], in_end[o])
    are excluded from every path.

    in_start/in_end: (Lo+1,) int arrays (the envelope rows; for padded rows
    beyond out_len pass [0, Li+1))."""
    S = closure.shape[-1]
    Li = in_toks.shape[0]
    dtype = closure.dtype
    i_idx = jnp.arange(Li + 1)

    left_mats = jnp.concatenate(
        [jnp.full((1, S, S), sr.zero, dtype), a_left[in_toks]], axis=0)

    band0 = (i_idx >= in_start[0]) & (i_idx < in_end[0])
    u0 = jnp.full((Li + 1, S), sr.zero, dtype).at[0].set(
        _e0(S, dtype, sr))
    row0 = _row_scan_banded(u0, left_mats, closure, sr, band0)

    def row_step(carry, inp):
        prev_row = carry
        out_tok, o = inp
        band = (i_idx >= in_start[o]) & (i_idx < in_end[o])
        up = a_up[out_tok]
        diag = a_diag[in_toks, out_tok]
        u_up = sr.vecmat(prev_row, up[None])
        u_diag = jax.vmap(sr.vecmat)(prev_row[:-1], diag)
        u = u_up.at[1:].set(sr.add(u_up[1:], u_diag))
        row = _row_scan_banded(u, left_mats, closure, sr, band)
        return row, None

    Lo = out_toks.shape[0]
    final_row, _ = jax.lax.scan(
        row_step, row0, (out_toks, jnp.arange(1, Lo + 1)))
    return final_row[in_len, S - 1]
