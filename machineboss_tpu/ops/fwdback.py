"""Device E-step: expected transition counts via automatic differentiation.

The classic identity E[n_t] = dLogLike/d(log w_t) turns count collection
into a gradient: we build the dense DP tensors differentiably from the
per-transition log-weight vector, run the batched Forward recurrence, and
let XLA derive the backward pass. This replaces the reference's explicit
BackwardMatrix::getCounts (ref src/backward.cpp:70-110) with a single
value_and_grad, fused end-to-end by the compiler, and yields the count
vector in exactly the host's (state, transIndex) layout.

Silent-transition counts flow through the differentiable closure
C = (I - N)^{-1}, so no special-casing of silent chains is needed.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, NEG_INF
from . import dp2d


class CountModel:
    """Static (host-side) description binding a machine's transitions to the
    differentiable device tensors."""

    def __init__(self, ev, dtype=jnp.float32):
        self.ev = ev
        S = ev.n_states()
        self.n_states = S
        self.n_in = ev.input_tokenizer.n_tokens()
        self.n_out = ev.output_tokenizer.n_tokens()
        # flat edge list in (state, transIndex) order = host count layout
        src, dst, itok, otok, logw = [], [], [], [], []
        for s, es in enumerate(ev.state):
            order = {}
            for (i, o), lst in es.outgoing.items():
                for d, ti, lw in lst:
                    order[ti] = (s, d, i, o, lw)
            for ti in range(es.n_transitions):
                s_, d, i, o, lw = order[ti]
                src.append(s_)
                dst.append(d)
                itok.append(i)
                otok.append(o)
                logw.append(lw if np.isfinite(lw) else NEG_INF)
        self.src = jnp.array(src, jnp.int32)
        self.dst = jnp.array(dst, jnp.int32)
        self.itok = jnp.array(itok, jnp.int32)
        self.otok = jnp.array(otok, jnp.int32)
        self.logw = jnp.array(np.maximum(np.array(logw, np.float64),
                                         NEG_INF), dtype)
        self.n_edges = len(src)
        self.dtype = dtype

    # -- differentiable tensor construction --------------------------------

    def build_tensors(self, logw):
        S = self.n_states
        probs = jnp.exp(logw)
        silent = (self.itok == 0) & (self.otok == 0)
        n_mat = jnp.zeros((S, S), logw.dtype).at[self.src, self.dst].add(
            jnp.where(silent, probs, 0.0))
        closure_p = jnp.linalg.inv(jnp.eye(S, dtype=logw.dtype) - n_mat)
        closure = _safe_log(closure_p)

        dense_p = jnp.zeros((self.n_in, self.n_out, S, S), logw.dtype) \
            .at[self.itok, self.otok, self.src, self.dst] \
            .add(jnp.where(silent, 0.0, probs))
        dense = _safe_log(dense_p)
        a_diag = dense[1:, 1:]
        a_left = dense[1:, 0]
        a_up = dense[0, 1:]
        return a_diag, a_left, a_up, closure

    # -- batched log-likelihood (the E-step objective) ---------------------

    def batch_loglike(self, logw, in_toks, out_toks, in_lens, out_lens,
                      weights=None):
        """Sum of log-likelihoods over a padded batch.

        in_toks: (B, Li) 0-based padded tokens; lens give true lengths.
        weights: optional (B,) per-pair multipliers on the objective —
        weight 0 removes a (padding) pair from both the total and, through
        the gradient, the expected counts."""
        a_diag, a_left, a_up, closure = self.build_tensors(logw)

        def one(it, ot, il, ol):
            return dp2d.forward_2d(a_diag, a_left, a_up, closure, it, ot,
                                   il, ol, sr=LOGSUMEXP, assoc=False)

        lls = jax.vmap(one)(in_toks, out_toks, in_lens, out_lens)
        # exclude impossible pairs from the sum the same way the reference
        # would fail them; caller can inspect per-seq lls
        valid = lls > NEG_INF / 2
        w = jnp.ones_like(lls) if weights is None else weights
        return jnp.sum(jnp.where(valid, lls, 0.0) * w), lls

    def counts_and_loglike(self, in_toks, out_toks, in_lens, out_lens,
                           logw=None, weights=None):
        """Expected per-transition counts + total loglike for a batch."""
        logw = self.logw if logw is None else logw

        def objective(w):
            total, lls = self.batch_loglike(w, in_toks, out_toks,
                                            in_lens, out_lens,
                                            weights=weights)
            return total, lls

        (total, lls), grads = jax.value_and_grad(
            objective, has_aux=True)(logw)
        return grads, total, lls


def _safe_log(p):
    return jnp.where(p > 0, jnp.log(jnp.where(p > 0, p, 1.0)), NEG_INF)


def pad_bucket(n, ratio=1.5, base=8):
    """Geometric padding bucket (ref seq.py pad_length semantics: lengths
    rounded up to powers of `ratio` to bound recompilation on ragged
    batches)."""
    b = base
    while b < n:
        b = int(b * ratio) + 1
    return b


def tokenize_batch(ev, seq_pairs, pad_to=None, bucket=False):
    """Pad/tokenize a list of SeqPairs into device arrays (0-based tokens).

    bucket=True rounds padded lengths up to geometric buckets so repeated
    calls with ragged batches reuse compiled kernels."""
    in_seqs = [[ev.input_tokenizer.sym2tok[c] - 1 for c in sp.input.seq]
               for sp in seq_pairs]
    out_seqs = [[ev.output_tokenizer.sym2tok[c] - 1 for c in sp.output.seq]
                for sp in seq_pairs]
    li = max([len(s) for s in in_seqs] + [1])
    lo = max([len(s) for s in out_seqs] + [1])
    if bucket:
        li = pad_bucket(li)
        lo = pad_bucket(lo)
    if pad_to:
        li = max(li, pad_to)
        lo = max(lo, pad_to)
    B = len(seq_pairs)
    it = np.zeros((B, li), np.int32)
    ot = np.zeros((B, lo), np.int32)
    il = np.zeros(B, np.int32)
    ol = np.zeros(B, np.int32)
    for n, (i_s, o_s) in enumerate(zip(in_seqs, out_seqs)):
        it[n, :len(i_s)] = i_s
        ot[n, :len(o_s)] = o_s
        il[n] = len(i_s)
        ol[n] = len(o_s)
    return jnp.array(it), jnp.array(ot), jnp.array(il), jnp.array(ol)


def posterior_lattice(a_diag, a_left, a_up, closure, in_toks, out_toks,
                      sr=None):
    """Posterior state marginals P(state at (i,o) | sequences): the
    forward lattice plus backward lattice minus total log-likelihood
    (equivalent feature to the reference WebGPU package's posteriors)."""
    from . import dp2d
    from .semiring import LOGSUMEXP
    sr = sr or LOGSUMEXP
    f = dp2d.forward_2d_lattice(a_diag, a_left, a_up, closure, in_toks,
                                out_toks, sr=sr)
    b = dp2d.backward_2d_lattice(a_diag, a_left, a_up, closure, in_toks,
                                 out_toks, sr=sr)
    S = closure.shape[-1]
    ll = f[-1, -1, S - 1]
    # note: f is post-closure and b includes same-cell closure, so f+b
    # counts within-cell silent runs on both sides; state marginals are
    # exact at emission boundaries (i.e. for loud states), matching the
    # reference's posterior semantics
    return f + b - ll
