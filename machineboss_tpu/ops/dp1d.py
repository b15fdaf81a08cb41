"""1D DP engines (generator or recognizer machines) on device.

Two strategies over token-conditioned transfer matrices (lowering.py):

  'scan'    : lax.scan of vector (x) matrix steps — O(L*S^2) work, depth L.
              Best for large S / short L.
  'assoc'   : lax.associative_scan prefix product of (S,S) transfer matrices
              — O(L*S^3) work, depth log L, all of it MXU semiring matmuls.
              Best for long sequences / small S, and the basis for
              length-sharded multi-chip scans (parallel/lengthshard.py).

All entry points are jit-friendly, batched (leading batch dim + per-sequence
lengths with padding masks), and take a semiring (Forward=LOGSUMEXP,
Viterbi=MAXPLUS).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, MAXPLUS, NEG_INF


def _start_vector(S, closure, sr, dtype):
    e0 = jnp.full((S,), sr.zero, dtype)
    e0 = e0.at[0].set(sr.one)
    return sr.vecmat(e0, closure)


@partial(jax.jit, static_argnames=("sr",))
def forward_1d_scan(trans, closure, toks, length, sr=LOGSUMEXP):
    """Sequential scan. trans: (n_tok, S, S) with closure folded; toks: (L,)
    0-based token ids (tok-1); length: actual length for padding mask."""
    S = trans.shape[-1]
    f0 = _start_vector(S, closure, sr, trans.dtype)

    def step(f, inp):
        tok, pos = inp
        m = trans[tok]
        f_new = sr.vecmat(f, m)
        f_new = jnp.where(pos < length, f_new, f)
        return f_new, None

    fL, _ = jax.lax.scan(step, f0, (toks, jnp.arange(toks.shape[0])))
    return fL[S - 1]


@partial(jax.jit, static_argnames=("sr",))
def forward_1d_assoc(trans, closure, toks, length, sr=LOGSUMEXP):
    """Associative prefix-product scan (log depth)."""
    S = trans.shape[-1]
    eye = jnp.where(jnp.eye(S, dtype=bool), sr.one, sr.zero) \
             .astype(trans.dtype)
    mats = trans[toks]                                    # (L, S, S)
    pos = jnp.arange(toks.shape[0])
    mats = jnp.where((pos < length)[:, None, None], mats, eye[None])
    prod = jax.lax.associative_scan(sr.matmul, mats)      # prefix products
    f0 = _start_vector(S, closure, sr, trans.dtype)
    final = sr.vecmat(f0, prod[-1])
    return final[S - 1]


@partial(jax.jit, static_argnames=("sr",))
def forward_1d_all(trans, closure, toks, length, sr=LOGSUMEXP):
    """Sequential scan returning the full (L+1, S) lattice (for counts)."""
    S = trans.shape[-1]
    f0 = _start_vector(S, closure, sr, trans.dtype)

    def step(f, inp):
        tok, pos = inp
        f_new = sr.vecmat(f, trans[tok])
        f_new = jnp.where(pos < length, f_new, f)
        return f_new, f_new

    fL, rows = jax.lax.scan(step, f0, (toks, jnp.arange(toks.shape[0])))
    return jnp.concatenate([f0[None], rows], axis=0)


@partial(jax.jit, static_argnames=("sr",))
def backward_1d_all(trans, closure, toks, length, sr=LOGSUMEXP):
    """Backward lattice b[p, s] = weight of emitting toks[p:] from state s.

    b_L = closure-into-end contribution handled by trans folding: b_L[s] =
    one at end state (silent closure is folded on the left of each step, so
    the final silent run is included in the last transfer matrix; the
    residual end vector needs the closure into the end state).
    """
    S = trans.shape[-1]
    bL = jnp.full((S,), sr.zero, trans.dtype).at[S - 1].set(sr.one)

    def step(b, inp):
        tok, pos = inp
        b_new = sr.matvec(trans[tok], b)
        b_new = jnp.where(pos < length, b_new, b)
        return b_new, b_new

    L = toks.shape[0]
    _, rows = jax.lax.scan(step, bL, (toks[::-1], jnp.arange(L)[::-1]))
    rows = rows[::-1]
    full = jnp.concatenate([rows, bL[None]], axis=0)
    return full


def make_batched(fn, sr=LOGSUMEXP):
    """Batched (vmapped over toks/length) jitted variant of a 1D engine."""
    def call(trans, closure, toks, length):
        return fn(trans, closure, toks, length, sr=sr)
    return jax.jit(jax.vmap(call, in_axes=(None, None, 0, 0)))
