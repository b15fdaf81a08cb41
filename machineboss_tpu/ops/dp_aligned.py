"""Alignment-constrained DP: scan along a prescribed alignment path.

Given an alignment (sequence of columns, each consuming an input token,
emitting an output token, or both), the DP reduces to a 1D scan over the
path's columns — O(A * S^2) instead of O(Li * Lo * S^2). This is the device
equivalent of the reference's path Envelope (ref src/seqpair.h:99-112 and
the JAX package's aligned DP), used for training on labeled alignments.

Columns are encoded as (in_tok, out_tok) pairs with 0 = epsilon; the
corresponding transfer matrix per column is A[in,out] (x) C.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP


@partial(jax.jit, static_argnames=("sr",))
def forward_aligned(log_trans, closure, col_in, col_out, n_cols,
                    sr=LOGSUMEXP):
    """log_trans: (n_in, n_out, S, S); closure: (S, S);
    col_in/col_out: (A,) token ids (0 = epsilon) per alignment column;
    n_cols: actual number of columns (padding allowed).
    Returns the path-constrained Forward log-likelihood."""
    S = closure.shape[-1]
    e0 = jnp.full((S,), sr.zero, closure.dtype).at[0].set(sr.one)
    f0 = sr.vecmat(e0, closure)

    def step(f, inp):
        it, ot, pos = inp
        m = sr.matmul(log_trans[it, ot], closure)
        f_new = sr.vecmat(f, m)
        return jnp.where(pos < n_cols, f_new, f), None

    A = col_in.shape[0]
    fA, _ = jax.lax.scan(step, f0, (col_in, col_out, jnp.arange(A)))
    return fA[S - 1]


def alignment_tokens(ev, alignment):
    """Convert a host alignment (list of (in_sym, out_sym)) to token arrays."""
    import numpy as np
    col_in = np.array([ev.input_tokenizer.sym2tok[a] if a else 0
                       for a, b in alignment], np.int32)
    col_out = np.array([ev.output_tokenizer.sym2tok[b] if b else 0
                        for a, b in alignment], np.int32)
    return col_in, col_out
