"""Device-accelerated CTC prefix-search scoring.

The prefix tree itself stays on host (inherently sequential A* search), but
each node's DP fill — the hot inner loop — runs as one jitted device call,
and extending a node scores ALL candidate tokens in a single batched call
(vmap over the alphabet). This is the SURVEY's 'host tree + batched device
scoring' design for beam/prefix decoding at nanopore scale.

Recurrences (matching algo/ctc.PrefixTree._fill):
  seq_cell:    one 2D DP column step for the appended input token
  prefix_cell: absorbing part, then chained through LS @ E_any[y_o] where
               LS is the all-non-outputting-paths closure
  logPrefixProb = lse(prefix[Lo] + LS[:, end])
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.semiring import LOGSUMEXP, NEG_INF


def _np_lse_reduce(stack):
    """logsumexp over the leading axis of (K, S, S), -inf aware."""
    m = np.max(stack, axis=0)
    safe = np.where(m > NEG_INF / 2, m, 0.0)
    s = np.sum(np.exp(stack - safe), axis=0)
    return np.where(s > 0, np.log(np.maximum(s, 1e-300)) + safe, NEG_INF)


def _np_log_matmul(a, b):
    amax = np.max(a, axis=-1, keepdims=True)
    bmax = np.max(b, axis=-2, keepdims=True)
    asafe = np.where(amax > NEG_INF / 2, amax, 0.0)
    bsafe = np.where(bmax > NEG_INF / 2, bmax, 0.0)
    prod = np.exp(a - asafe) @ np.exp(b - bsafe)
    with np.errstate(divide="ignore"):
        return np.where(prod > 0,
                        np.log(np.maximum(prod, 1e-300)) + asafe + bsafe,
                        NEG_INF)


class CTCDeviceModel:
    def __init__(self, ev, out_toks):
        """ev: EvaluatedMachine; out_toks: observed output token ids
        (1-based), fixed for the whole search."""
        self.ev = ev
        S = ev.n_states()
        self.S = S
        self.n_in = ev.input_tokenizer.n_tokens()
        n_out = ev.output_tokenizer.n_tokens()
        self.Lo = len(out_toks)

        # dense tensors (log space)
        dense = np.full((self.n_in, n_out, S, S), NEG_INF)
        for (i, o), (src, dst, _, lw) in ev.edges_by_token().items():
            for k in range(len(src)):
                w = lw[k] if np.isfinite(lw[k]) else NEG_INF
                dense[i, o, src[k], dst[k]] = np.logaddexp(
                    dense[i, o, src[k], dst[k]], w)
        ls = ev.log_sum_in_trans()  # all-non-outputting-paths closure
        ls = np.where(np.isfinite(ls), ls, NEG_INF)

        # per observed position matrices
        self.a_diag = jnp.array(
            np.stack([dense[:, t] for t in out_toks]), jnp.float32) \
            if self.Lo else jnp.zeros((0, self.n_in, S, S), jnp.float32)
        # (Lo, n_in, S, S): transitions consuming input i emitting y_o
        self.a_in = jnp.array(dense[:, 0], jnp.float32)   # (n_in, S, S)
        self.ls = jnp.array(ls, jnp.float32)
        # prefix chain matrices: LS @ E_any[y_o], with E_any = lse over i
        e_any = np.full((self.Lo, S, S), NEG_INF)
        for n, t in enumerate(out_toks):
            e_any[n] = _np_lse_reduce(dense[:, t])
        chain = np.stack([_np_log_matmul(ls, e_any[n])
                          for n in range(self.Lo)]) \
            if self.Lo else np.zeros((0, S, S))
        self.prefix_chain = jnp.array(chain, jnp.float32)
        # (eps,eps)-only silent closure, precomputed before any tracing
        n_mat = np.zeros((S, S))
        silent = ev.edges_by_token().get((0, 0))
        if silent is not None:
            ssrc, sdst, _, slw = silent
            np.add.at(n_mat, (ssrc, sdst),
                      np.where(np.isfinite(slw), np.exp(slw), 0.0))
        inv = np.linalg.inv(np.eye(S) - n_mat)
        with np.errstate(divide="ignore"):
            self._sc = jnp.array(
                np.where(inv > 0, np.log(np.maximum(inv, 1e-300)), NEG_INF),
                jnp.float32)
        self._fill = jax.jit(self._fill_impl)
        self._fill_batch = jax.jit(jax.vmap(self._fill_impl,
                                            in_axes=(None, 0)))

    def _fill_impl(self, parent_seq, in_tok):
        """parent_seq: (Lo+1, S); in_tok: scalar token id (0 = root/none).
        Returns (seq_cell, prefix_cell, log_prefix_prob)."""
        sr = LOGSUMEXP
        S = self.S
        Lo = self.Lo
        is_root = in_tok == 0
        tok = jnp.maximum(in_tok, 0)

        a_in_tok = self.a_in[tok]                       # (S, S)
        silent = self.a_in[0]

        # seq fill: row scan over output positions
        def row(carry, inp):
            prev_abs_row, o = carry, inp
            # absorbing: parent rows o-1 (emitting) and o (non-emitting)
            absorb = sr.vecmat(parent_seq[o], a_in_tok)
            emit_mat = self.a_diag[jnp.maximum(o - 1, 0), tok]
            absorb_emit = sr.vecmat(parent_seq[jnp.maximum(o - 1, 0)],
                                    emit_mat)
            absorb = sr.add(absorb, jnp.where(o > 0, absorb_emit, sr.zero))
            absorb = jnp.where(is_root, sr.zero, absorb)
            return carry, absorb

        o_idx = jnp.arange(Lo + 1)
        _, absorbs = jax.lax.scan(row, 0, o_idx)
        # non-absorbing (within own cell) resolution: scan rows applying
        # silent closure and emission chaining
        start = jnp.where(is_root,
                          jnp.full((S,), sr.zero).at[0].set(sr.one),
                          jnp.full((S,), sr.zero))

        def solve(prev_row, inp):
            absorb, o = inp
            base = sr.add(absorb, jnp.where(o == 0, start, sr.zero))
            emit = jnp.where(
                o > 0,
                sr.vecmat(prev_row, self.a_diag[jnp.maximum(o - 1, 0), 0]),
                sr.zero)
            v = sr.add(base, emit)
            # own silent closure: LS restricted to (eps,eps) paths is the
            # closure of `silent`; approximate with n iterations is exact
            # for advancing machines when applied in state order, here we
            # use the precomputed matrix form:
            v = sr.vecmat(v, self._silent_closure())
            return v, v

        _, rows = jax.lax.scan(solve, jnp.full((S,), sr.zero),
                               (absorbs, o_idx))
        seq_cell = rows

        # prefix fill
        def pref(prev, inp):
            absorb_pre, o = inp
            chained = jnp.where(
                o > 0,
                sr.vecmat(prev, self.prefix_chain[jnp.maximum(o - 1, 0)]),
                sr.zero)
            p = sr.add(absorb_pre, chained)
            return p, p

        # prefix absorbing part = the pre-non-absorbing value of seq fill:
        # absorbs + start (before own-cell chaining)
        pre = absorbs.at[0].set(sr.add(absorbs[0], start))
        _, prows = jax.lax.scan(pref, jnp.full((S,), sr.zero),
                                (pre, o_idx))
        prefix_cell = prows
        lpp = jax.scipy.special.logsumexp(prefix_cell[Lo]
                                          + self.ls[:, S - 1])
        return seq_cell, prefix_cell, lpp

    def _silent_closure(self):
        return self._sc

    # public API ------------------------------------------------------------

    def fill(self, parent_seq_cell, in_tok):
        seq, pref, lpp = self._fill(jnp.array(parent_seq_cell, jnp.float32),
                                    jnp.int32(in_tok))
        return np.array(seq), np.array(pref), float(lpp)

    def fill_all_tokens(self, parent_seq_cell):
        """Score every candidate extension token in one batched call."""
        toks = jnp.arange(1, self.n_in, dtype=jnp.int32)
        seq, pref, lpp = self._fill_batch(
            jnp.array(parent_seq_cell, jnp.float32), toks)
        return np.array(seq), np.array(pref), np.array(lpp)
