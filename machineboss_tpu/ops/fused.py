"""Fused generator (x) transducer DP: score a transducer's output against a
generator WITHOUT materializing the composite state space.

The joint DP cell is a (Sg, St) matrix per output position. Every composite
transition factors as a Kronecker product (generator move) (x) (transducer
move), so each update is two small matmuls instead of one (Sg*St)^2 product:

    C' = sum_a  Ga^T  C  T[a, out]        (G emits a; T consumes a)
       +        C  T[eps, out]            (T moves without input)
       + Gn^T C                           (G silent move)

Complexity O(Lo * A * (Sg^2 St + Sg St^2)) versus O(Lo * (Sg St)^2) for the
materialized composition — the same asymptotic win as the reference's fused
DP (ref python/machineboss/jax/fused.py API), realized here with MXU
matmuls. Joint silent moves (G emits, T absorbs silently) are handled by
fixed-iteration propagation, keeping the kernel fixed-shape and
differentiable.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, NEG_INF


@partial(jax.jit, static_argnames=("sr", "n_pair_iters"))
def fused_forward(g_emit, g_closure, t_tensor, t_closure, out_toks, out_len,
                  n_pair_iters=4, sr=LOGSUMEXP):
    """Forward log-likelihood of output sequence under generator (x)
    transducer, fused.

    g_emit: (A, Sg, Sg) generator transitions emitting symbol a (log)
    g_closure: (Sg, Sg) closure over the generator's silent moves
    t_tensor: (A+1, n_out, St, St) transducer transitions indexed by
        (input token 0=eps, output token 0=eps) over the SHARED alphabet A
    t_closure: (St, St) closure over the transducer's (eps,eps) moves
    out_toks: (Lo,) 0-based observed output tokens; out_len: actual length.

    Silent composite paths decompose uniquely as alternations of G-silent
    runs (folded into g_closure), T-silent runs (t_closure, folded on the
    right of every T move), and PAIRED silent moves (G emits a, T absorbs
    it silently); only the paired count is iterated, bounded by
    n_pair_iters per output position.

    Interleaving canonicalization: values that arrive via a T-only output
    move ("cold") may feed paired moves but NOT g_closure — commuting
    (G-silent, T-only) adjacent pairs are ordered G-first, admitting each
    interleaving class once, exactly like the reference's waiting-machine
    composition (ref src/machine.cpp:1053-1145).
    """
    A, Sg, _ = g_emit.shape
    St = t_tensor.shape[-1]
    dtype = g_emit.dtype
    g_emit_t = jnp.swapaxes(g_emit, -1, -2)
    g_closure_t = jnp.swapaxes(g_closure, -1, -2)
    # fold the T (eps,eps) closure into every T move matrix
    tt = sr.matmul(t_tensor, t_closure)

    def close_g(c):
        return sr.matmul(g_closure_t, c)

    def paired(c):
        """One paired silent move (G emits a, T absorbs silently)."""
        ga_c = sr.matmul(g_emit_t, c[None])                       # (A,Sg,St)
        both = sr.matmul(ga_c, tt[1:, 0])                         # (A,Sg,St)
        return sr.reduce(jnp.moveaxis(both, 0, -1), axis=-1)

    def propagate_hot(base):
        # h = close_g(base (+) paired(h)): geometric series over the
        # paired-move count
        base = close_g(base)

        def body(_, carry):
            acc, cur = carry
            cur = close_g(paired(cur))
            return sr.add(acc, cur), cur

        acc, _ = jax.lax.fori_loop(0, n_pair_iters, body, (base, base))
        return acc

    c0 = jnp.full((Sg, St), sr.zero, dtype).at[0, 0].set(sr.one)
    c0 = propagate_hot(sr.matmul(c0, t_closure))

    def step(c, inp):
        tok, pos = inp
        # T-only output move: cold — no generator closure may follow
        cold = sr.matmul(c, tt[0, tok + 1])
        # paired with output: G emits a, T consumes a and emits tok
        ga_c = sr.matmul(g_emit_t, c[None])                        # (A,Sg,St)
        with_input = sr.matmul(ga_c, tt[1:, tok + 1])
        hot0 = sr.reduce(jnp.moveaxis(with_input, 0, -1), axis=-1)
        h = propagate_hot(sr.add(hot0, paired(cold)))
        c_new = sr.add(h, cold)
        return jnp.where(pos < out_len, c_new, c), None

    Lo = out_toks.shape[0]
    c_fin, _ = jax.lax.scan(step, c0, (out_toks, jnp.arange(Lo)))
    return c_fin[Sg - 1, St - 1]


def fused_tensors(gen_ev, td_ev, dtype=None):
    """Lower an (evaluated generator, evaluated transducer) pair for
    fused_forward. The generator's output alphabet must equal the
    transducer's input alphabet."""
    import numpy as np
    dtype = dtype or np.float32
    g_alph = gen_ev.output_tokenizer.tok2sym[1:]
    t_alph = td_ev.input_tokenizer.tok2sym[1:]
    if g_alph != t_alph:
        raise ValueError("generator output alphabet %r != transducer input"
                         " alphabet %r" % (g_alph, t_alph))
    A = len(g_alph)
    Sg = gen_ev.n_states()
    St = td_ev.n_states()
    g_emit = np.full((A, Sg, Sg), NEG_INF)
    g_null = np.full((Sg, Sg), NEG_INF)
    for (i, o), (src, dst, _, lw) in gen_ev.edges_by_token().items():
        for k in range(len(src)):
            w = lw[k] if np.isfinite(lw[k]) else NEG_INF
            if o == 0:
                g_null[src[k], dst[k]] = np.logaddexp(
                    g_null[src[k], dst[k]], w)
            else:
                g_emit[o - 1, src[k], dst[k]] = np.logaddexp(
                    g_emit[o - 1, src[k], dst[k]], w)
    n_out = td_ev.output_tokenizer.n_tokens()
    t_tensor = np.full((A + 1, n_out, St, St), NEG_INF)
    for (i, o), (src, dst, _, lw) in td_ev.edges_by_token().items():
        for k in range(len(src)):
            w = lw[k] if np.isfinite(lw[k]) else NEG_INF
            t_tensor[i, o, src[k], dst[k]] = np.logaddexp(
                t_tensor[i, o, src[k], dst[k]], w)

    def np_closure(log_n):
        n_mat = np.where(log_n > NEG_INF / 2, np.exp(log_n), 0.0)
        inv = np.linalg.inv(np.eye(n_mat.shape[0]) - n_mat)
        with np.errstate(divide="ignore"):
            return np.where(inv > 0, np.log(np.maximum(inv, 1e-300)),
                            NEG_INF)

    g_closure = np_closure(g_null)
    t_closure = np_closure(t_tensor[0, 0])
    return (g_emit.astype(dtype), g_closure.astype(dtype),
            t_tensor.astype(dtype), t_closure.astype(dtype))
