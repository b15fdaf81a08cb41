"""Neural / parameterized DP: position-dependent transition weights,
differentiable end-to-end.

The caller supplies per-parameter tensors (scalars or arrays broadcastable
to (Li+1, Lo+1); indices are clamped, so (1,1) or (Li+1,1) shapes work).
Every DP cell (i, o) evaluates its transition weights at that cell's
coordinates; jax.grad through the whole DP trains whatever network
produced the parameter tensors (neural transducer training). Silent
transitions use fixed-iteration propagation so the computation stays
differentiable and fixed-shape.

Equivalent feature to the reference's neural DP
(ref python/machineboss/jax/dp_neural.py API surface; re-designed here
around a dense per-cell tensor contraction).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, NEG_INF
from .exprjit import ParameterizedMachine


def _cell_params(params, i, o):
    """Clamp-index every parameter array at cell (i, o)."""
    out = {}
    for k, v in params.items():
        v = jnp.asarray(v)
        if v.ndim == 0:
            out[k] = v
        elif v.ndim == 1:
            out[k] = v[jnp.clip(i, 0, v.shape[0] - 1)]
        else:
            out[k] = v[jnp.clip(i, 0, v.shape[0] - 1),
                       jnp.clip(o, 0, v.shape[1] - 1)]
    return out


def neural_log_forward(pm: ParameterizedMachine, in_toks, out_toks, params,
                       n_silent_iters=None, sr=LOGSUMEXP):
    """Forward log-likelihood with position-dependent parameters.

    pm: ParameterizedMachine; in_toks (Li,), out_toks (Lo,) 0-based token
    ids; params: dict of scalars / arrays broadcastable to (Li+1, Lo+1).
    Differentiable in params."""
    S = pm.n_states
    Li = in_toks.shape[0]
    Lo = out_toks.shape[0]
    if n_silent_iters is None:
        n_silent_iters = S

    def cell_tensor(i, o):
        lt = pm.log_trans_tensor(_cell_params(params, i, o))
        return lt  # (n_in, n_out, S, S)

    def silent_propagate(cell, silent_mat):
        # fixed-iteration closure: cell <- cell (+) cell (x) N, repeated
        def body(_, c):
            return sr.add(c, sr.vecmat(c, silent_mat))
        return jax.lax.fori_loop(0, n_silent_iters, body, cell)

    def row_scan(prev_row, o):
        # tensor is (n_in, n_out, S, S) with index 0 = epsilon; token ids
        # are 0-based, so real tokens index at +1
        if Lo:
            out_tok = jnp.where(o > 0,
                                out_toks[jnp.clip(o - 1, 0, Lo - 1)] + 1, 0)
        else:
            out_tok = jnp.int32(0)

        def col_step(carry, i):
            left = carry  # cell (i-1, o) post-propagation
            lt = cell_tensor(i, o)
            if Li:
                in_tok = jnp.where(
                    i > 0, in_toks[jnp.clip(i - 1, 0, Li - 1)] + 1, 0)
            else:
                in_tok = jnp.int32(0)
            silent_mat = lt[0, 0]
            acc = jnp.full((S,), sr.zero, jnp.float32)
            acc = jnp.where((i == 0) & (o == 0),
                            acc.at[0].set(sr.one), acc)
            diag = sr.vecmat(prev_row[jnp.clip(i - 1, 0, Li)],
                             lt[in_tok, out_tok])
            diag = jnp.where((i > 0) & (o > 0), diag, sr.zero)
            lft = sr.vecmat(left, lt[in_tok, 0])
            lft = jnp.where(i > 0, lft, sr.zero)
            up = sr.vecmat(prev_row[i], lt[0, out_tok])
            up = jnp.where(o > 0, up, sr.zero)
            acc = sr.add(sr.add(acc, diag), sr.add(lft, up))
            cell = silent_propagate(acc, silent_mat)
            return cell, cell

        init = jnp.full((S,), sr.zero, jnp.float32)
        _, row = jax.lax.scan(col_step, init, jnp.arange(Li + 1))
        return row, None

    row0, _ = row_scan(jnp.full((Li + 1, S), sr.zero, jnp.float32),
                       jnp.int32(0))
    if Lo == 0:
        return row0[Li, S - 1]

    def outer(carry, o):
        row, _ = row_scan(carry, o)
        return row, None

    final_row, _ = jax.lax.scan(outer, row0, jnp.arange(1, Lo + 1))
    return final_row[Li, S - 1]
