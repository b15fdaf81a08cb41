"""Pallas TPU 1D Forward scan: VMEM-resident carry, one grid step/token.

The reference's fastest 1D path is the compiled-C++ sequential scan
(BASELINE: 152 M cells/s single-core at S=64, L=10000; its jax 1D-optimal
path took 200 s on the same config — SURVEY.md §6). The XLA formulations
here top out early: the vmapped log-space scan pays a per-step (B, S, S)
gather + transcendental-heavy logsumexp vecmat (~0.3 G cells/s on the v5e
chip), and a gather + tree-fold over host-exact k-token block tables is
gather/batched-small-matmul-bound in XLA (~0.07 G — measured, see PERF.md).

This kernel keeps EVERYTHING resident:

  - carry p (S, B): scaled probabilities, batch on the 128-lane dim
  - per-lane Kahan-compensated log-scale (renormalized every step, so f32
    carries values near unit scale — same numerics as forward_1d_scan and
    the wavefront kernels' scaled-probability design)
  - the exp-shifted transfer matrices (n_tok, S, S) in VMEM
  - per step: n_tok MXU matmuls (S, S) @ (S, B) + a one-hot token select
    on the VPU; the only HBM traffic is one (1, B) int32 token row per
    grid step (streamed via the grid BlockSpec index_map) and the final
    (B,) result.

Numerics: the matmul MUST run at HIGHEST precision — at Mosaic's DEFAULT
(bf16 multiplies) the once-rounded matrix introduces a systematic
~5e-5 nat/step bias (measured 0.51 nats at L=10000 on the v5e chip, same
mechanism as the XLA wide-matmul engine's caveat in dp1d.py); at HIGHEST
the per-step error is ~1e-7 random walk. Gate-checked against the f64
host oracle at L=10000 in bench.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _scan1d_kernel(n_tok, S, Bp, L, unroll, split, renorm_every,
                   em_ref, c0_ref, tok_ref, len_ref,
                   out_ref,
                   p_scr, sc_scr):
    """`unroll` token positions per grid step (per-step grid overhead
    dominated the single-token version: 13.6 us/step measured on v5e).

    em_ref   (n_tok, S, S): exp(M_t^T - g), transposed so the step is
             em_t @ p (g = one global shift, see make_forward_1d_pallas).
    c0_ref   (S, Bp): start vector as probabilities (closure row 0).
    tok_ref  (unroll, Bp) int32: this grid step's token rows.
    len_ref  (1, Bp) int32: per-lane lengths.
    out_ref  (8, Bp): row 0 = final log-likelihood.
    p_scr    (S, Bp) carry; sc_scr (8, Bp): row 0 scale, row 1 Kahan comp,
             row 2 dead-lane flag (1.0 = dead).

    `split` partitions the contraction into split-wide chunks summed as a
    balanced tree: the carry converges toward the transfer operator's
    stationary vector, so the f32 accumulation error of a monolithic
    64-term contraction repeats IDENTICALLY every step and accumulates as
    a linear bias (measured 3.8e-6 nat/step at S=64 even at HIGHEST
    precision); chunked tree summation shortens the sequential
    accumulation to split + log2(S/split) rounding steps."""
    g0 = pl.program_id(0)

    @pl.when(g0 == 0)
    def _init():
        p_scr[:] = c0_ref[:]
        sc_scr[:] = jnp.zeros_like(sc_scr)

    for j in range(unroll):
        d = g0 * unroll + j
        tok = tok_ref[j, :]                               # (Bp,) int32
        keep = ((d < len_ref[0, :]) & (tok >= 0))[None, :]
        p = p_scr[:]

        if split >= S:
            # ONE stacked (n_tok*S, S) @ (S, Bp) matmul instead of n_tok
            # (S, S) dots: at S=64 a lone (64, 64, B) dot uses a quarter
            # of the 128x128 MXU tile; the stacked form fills the M dim.
            # em_ref arrives pre-stacked (n_tok*S, S) from the host.
            q_all = jnp.dot(em_ref[:], p,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            cur = None
            for t in range(n_tok):
                sel = (tok == t)[None, :].astype(jnp.float32)
                q = q_all[t * S:(t + 1) * S, :] * sel
                cur = q if cur is None else cur + q
        else:
            cur = None
            for t in range(n_tok):
                parts = [
                    jnp.dot(em_ref[t * S:(t + 1) * S, c:c + split],
                            p[c:c + split, :],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                    for c in range(0, S, split)]
                while len(parts) > 1:
                    parts = [parts[i] + parts[i + 1]
                             if i + 1 < len(parts) else parts[i]
                             for i in range(0, len(parts), 2)]
                q = parts[0]
                sel = (tok == t)[None, :].astype(jnp.float32)
                cur = q * sel if cur is None else cur + q * sel

        # static-in-j renorm schedule (d = g0*unroll + j is traced via
        # program_id; unroll is a multiple of renorm_every, so
        # (d+1) % renorm_every == (j+1) % renorm_every is compile-time).
        # No final-step renorm is needed: the host-side log reads the
        # unrenormalized mantissa exactly, and a lane that dies in a
        # trailing partial window is caught by the mant <= 0 check.
        if (j + 1) % renorm_every == 0:
            m = jnp.max(cur, axis=0, keepdims=True)       # (1, Bp)
            dead = (m <= 0.0).astype(jnp.float32)
            # EXACT power-of-two renormalization: extract the max's
            # binary exponent by bit twiddling and scale by 2^-e (exact
            # in fp), so the loop carries NO transcendentals at all —
            # the per-step jnp.log of the earlier Kahan-scale design had
            # a deterministic ~4e-6 nat/step approximation bias at the
            # carry's stationary point (measured 3.79e-2 at L=10000 on
            # v5e, invariant under matmul restructuring). The single
            # final log runs in f64 on the host side of the call.
            # Because the scaling is an exact power of two it commutes
            # exactly with the linear recurrence, so renormalizing every
            # `renorm_every` steps (instead of every step) is
            # numerically IDENTICAL — it only narrows the f32 underflow
            # headroom to ~(126 - 2*renorm_every... ) bits, i.e. steps
            # may shrink by up to 2^-(126/renorm_every) each before a
            # live lane hits zero mid-window. The per-step max-reduce
            # over S sublanes + bit ops were ~half the step time
            # (VPU-bound; measured).
            msafe = jnp.where(m > 0.0, m, 1.0)
            bits = pltpu.bitcast(msafe, jnp.int32)
            kexp = jnp.bitwise_and(jnp.right_shift(bits, 23), 0xFF)
            inv = pltpu.bitcast(jnp.left_shift(254 - kexp, 23),
                                jnp.float32)
            p_new = cur * inv                              # exact scaling
            inc = (kexp - 127).astype(jnp.float32)
            upd = keep.astype(jnp.float32)
            p_scr[:] = jnp.where(keep, p_new, p)
            sc_scr[0:1, :] = sc_scr[0:1, :] + inc * upd
            sc_scr[2:3, :] = jnp.maximum(sc_scr[2:3, :], dead * upd)
        else:
            p_scr[:] = jnp.where(keep, cur, p)

    n_steps = pl.num_programs(0)

    @pl.when(g0 == n_steps - 1)
    def _fin():
        # row 0: final-state mantissa; row 1: exponent sum; row 2: dead
        out_ref[0:1, :] = p_scr[S - 1:S, :]
        out_ref[1:2, :] = sc_scr[0:1, :]
        out_ref[2:3, :] = sc_scr[2:3, :]
        out_ref[3:8, :] = jnp.zeros((5, sc_scr.shape[1]), jnp.float32)


def make_forward_1d_pallas(trans, closure, B, L, unroll=8, split=None,
                           renorm_every=4, interpret=False):
    """Build the VMEM-resident batched 1D Forward for fixed shapes.

    trans (n_tok, S, S) log transfer matrices (silent closure folded,
    lowering.emit_matrices_1d); closure (S, S). Returns
    fn(toks (B, L) 0-based int32, lens (B,)) -> (B,) log-likelihoods.

    The per-token global max gmax_t is folded out of the matrix and into
    the per-step scale increment implicitly: matrices are shifted so the
    hottest entry is 1.0, and the per-step renormalization absorbs the
    shift into log(m). Mathematically: using exp(M_t - g_t) scales every
    lane's step by exp(-g_t); the final scale must add sum over steps of
    g_{tok}. That sum is data-dependent, so instead the shift g is chosen
    GLOBAL (max over all tokens): one constant, added back as L_real * g
    via the length (exact, no per-step bookkeeping)."""
    trans = np.asarray(trans, np.float64)
    closure = np.asarray(closure, np.float64)
    n_tok, S, _ = trans.shape
    g = float(np.max(trans))                  # single global shift
    if not np.isfinite(g):
        g = 0.0
    em = np.exp(np.maximum(trans - g, -700.0))
    em = np.where(np.isfinite(trans), em, 0.0)
    em_t = np.ascontiguousarray(np.transpose(em, (0, 2, 1))
                                ).astype(np.float32)       # (n_tok, S', S)
    em_t = em_t.reshape(n_tok * S, S)        # pre-stacked for the kernel

    e0 = np.full(S, NEG_INF)
    e0[0] = 0.0
    with np.errstate(divide="ignore"):
        c0 = np.where(np.isfinite(closure), np.exp(closure), 0.0)[0]
    Bp = _round_up(max(B, 1), 128)
    c0b = np.broadcast_to(c0[:, None], (S, Bp)).astype(np.float32)

    if split is None:
        split = S          # monolithic: measured best AND bias-free once
                           # the renormalization became transcendental-free
                           # (v5e: 4.36 G vs 2.11 G with split=8; err 4e-5
                           # either way at L=10000)
    unroll = max(8, _round_up(unroll, 8))
    n_steps = -(-L // unroll)
    renorm_every = max(1, int(renorm_every))
    while unroll % renorm_every:       # schedule must be static in j
        renorm_every -= 1
    kernel = functools.partial(_scan1d_kernel, n_tok, S, Bp, L, unroll,
                               split, renorm_every)
    call = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # em
            pl.BlockSpec(memory_space=pltpu.VMEM),            # c0
            pl.BlockSpec((unroll, Bp), lambda d: (d, 0),
                         memory_space=pltpu.VMEM),            # tokens
            pl.BlockSpec(memory_space=pltpu.VMEM),            # lens
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, Bp), jnp.float32),
            pltpu.VMEM((8, Bp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    L8 = n_steps * unroll

    @jax.jit
    def _dev(toks, lens):
        # pad rows beyond L with token -1 (matches no class -> masked)
        tp = jnp.full((L8, Bp), -1, jnp.int32)
        tp = tp.at[:L, :B].set(jnp.transpose(toks))
        lp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(lens)
        return call(jnp.asarray(em_t), jnp.asarray(c0b), tp, lp)

    def fwd(toks, lens):
        out = np.asarray(_dev(toks, lens), np.float64)
        lens = np.asarray(lens)
        mant, expo, dead = out[0, :B], out[1, :B], out[2, :B] > 0.5
        # final reduction in host f64: ONE log + exact exponent/shift
        with np.errstate(divide="ignore"):
            ll = (np.log(np.maximum(mant, 1e-300)) + expo * np.log(2.0)
                  + lens.astype(np.float64) * g)
        return np.where(dead | (mant <= 0.0), NEG_INF, ll)

    fwd.device_call = _dev

    return fwd
