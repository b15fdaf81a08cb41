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
    0-based token ids (tok-1); length: actual length for padding mask.

    The carry is RENORMALIZED each step (running max subtracted into a
    Kahan-compensated scale accumulator): carrying absolute log values in
    f32 loses ~|LL|*eps per step, which at L=10000 / |LL|~2e4 nats
    accumulates to ~7e-2 — far outside the 0.01-nat device/host
    contract. With the compensated scale the error stays O(eps*|LL|)
    total (measured 1.4e-4 at L=10000 on the v5e chip)."""
    S = trans.shape[-1]
    f0 = _start_vector(S, closure, sr, trans.dtype)
    zero = jnp.zeros((), trans.dtype)

    def step(carry, inp):
        f, scale, comp = carry
        tok, pos = inp
        m = trans[tok]
        f_new = sr.vecmat(f, m)
        norm = jnp.max(f_new)
        norm = jnp.where(norm > NEG_INF / 2, norm, zero)
        f_new = f_new - norm
        # Kahan-compensated scale += norm
        y = norm - comp
        t = scale + y
        comp_new = (t - scale) - y
        keep = pos < length
        return (jnp.where(keep, f_new, f),
                jnp.where(keep, t, scale),
                jnp.where(keep, comp_new, comp)), None

    (fL, scale, _), _ = jax.lax.scan(
        step, (f0, zero, zero), (toks, jnp.arange(toks.shape[0])))
    return fL[S - 1] + scale


@jax.jit
def forward_1d_scan_probs_batch(trans, closure, toks, lens):
    """Batch-major prob-space 1D Forward scan (LOGSUMEXP only).

    Design (same scaled-probability idea as the Pallas wavefront
    kernels): the carry is a probability-space vector p (B, S), kept
    near unit scale by a per-step renormalization whose log goes into a
    Kahan-compensated per-sequence scale; each step is ONE real
    (B, S) x (S, n_tok*S) matmul against the precomputed
    exp-shifted wide transfer matrix — ALL tokens at once — followed by
    a one-hot block select, so there is no per-sequence (S, S) matrix
    gather in the loop. Entries more than ~80 nats below a token
    block's max underflow (same single-step tolerance as
    semiring.LogSemiring.matmul).

    trans (n_tok, S, S) log, closure (S, S) log; toks (B, L) 0-based;
    lens (B,). Returns (B,) log-likelihoods read at state S-1.

    CAVEAT (measured on the 2026-08 v5e runtime): the per-step MXU
    matmul carries a SYSTEMATIC ~3e-6..1e-4 nat/step bias (the same
    exp'd matrix is re-rounded identically every step), which
    accumulates LINEARLY — ~3e-2 nats at L=10000, outside the 0.01-nat
    device/host contract. An explicit bf16x3 split emulation made it
    WORSE (the residual is itself bf16-re-rounded: ~8e-5/step). Use
    this engine for L up to a few thousand; for longer scans the
    per-sequence log-space forward_1d_scan (whose vecmat lowers to an
    unbiased path on this runtime; flat ~1e-3 error at L=10000) is the
    contract-passing default (bench.py BENCH_1D)."""
    n_tok, S, _ = trans.shape
    B, L = toks.shape
    if L > 3000:
        # the bias caveat above is enforced, not just documented: beyond
        # a few thousand steps this engine leaves the 0.01-nat contract
        import warnings
        warnings.warn(
            "forward_1d_scan_probs_batch: L=%d exceeds the ~3000-step "
            "safe bound for the MXU per-step rounding bias (~1e-4 "
            "nat/step worst case); use forward_1d_scan or the blocked "
            "engine for long scans" % L, stacklevel=2)
    gmax = jnp.max(trans.reshape(n_tok, S * S), axis=1)      # (n_tok,)
    gsafe = jnp.where(gmax > NEG_INF / 2, gmax, 0.0)
    wide = jnp.exp(jnp.transpose(trans - gsafe[:, None, None],
                                 (1, 0, 2)).reshape(S, n_tok * S))

    def _mm(p):
        return jnp.matmul(p, wide,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=p.dtype)

    f0 = _start_vector(S, closure, LOGSUMEXP, trans.dtype)
    m0 = jnp.max(f0)
    m0 = jnp.where(m0 > NEG_INF / 2, m0, 0.0)
    p0 = jnp.broadcast_to(jnp.exp(f0 - m0), (B, S))
    scale0 = jnp.full((B,), m0, trans.dtype)
    comp0 = jnp.zeros((B,), trans.dtype)

    def step(carry, inp):
        p, scale, comp = carry
        tok, pos = inp                                       # (B,), ()
        q = _mm(p)                                           # (B, nT*S)
        qs = jnp.take_along_axis(q.reshape(B, n_tok, S),
                                 tok[:, None, None], axis=1)[:, 0]
        m = jnp.max(qs, axis=-1)                             # (B,)
        dead = m <= 0                                        # no mass left
        msafe = jnp.where(dead, 1.0, m)
        p_new = qs / msafe[:, None]
        inc = jnp.log(msafe) + gsafe[tok]
        # Kahan-compensated scale += inc (dead lanes pin to log-zero so
        # the compensation never sees inf - inf)
        y = inc - comp
        t = scale + y
        comp_new = (t - scale) - y
        t = jnp.where(dead, NEG_INF, t)
        comp_new = jnp.where(dead, 0.0, comp_new)
        keep = pos < lens
        return (jnp.where(keep[:, None], p_new, p),
                jnp.where(keep, t, scale),
                jnp.where(keep, comp_new, comp)), None

    (pL, scale, _), _ = jax.lax.scan(
        step, (p0, scale0, comp0),
        (jnp.transpose(toks), jnp.arange(L)))
    last = pL[:, S - 1]
    return jnp.where(last > 0, jnp.log(last), NEG_INF) + scale


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


# --------------------------------------------------------------- blocked

def _np_log_matmul_batch(a, b):
    """Batched f64 log-space matmul (host, exact shift)."""
    import numpy as np
    amax = np.max(a, axis=-1, keepdims=True)
    bmax = np.max(b, axis=-2, keepdims=True)
    asafe = np.where(amax > NEG_INF / 2, amax, 0.0)
    bsafe = np.where(bmax > NEG_INF / 2, bmax, 0.0)
    prod = np.exp(a - asafe) @ np.exp(b - bsafe)
    with np.errstate(divide="ignore"):
        out = np.where(prod > 0, np.log(np.maximum(prod, 1e-300))
                       + asafe + bsafe, NEG_INF)
    return out


def build_token_block_table(trans, k=None, budget_mb=40):
    """Host-exact f64 transfer table over k-token blocks.

    trans: (n_tok, S, S) log transfer matrices (token-conditioned, silent
    closure folded — lowering.emit_matrices_1d). Returns (table, k) where
    table[(…(t0*(n+1)+t1)*(n+1)…)+t_{k-1}] = M_{t0} (x) … (x) M_{t_{k-1}}
    in the log semiring, with the extra token id n_tok = identity (pad).

    This is the numerics-first answer to the long-scan MXU bias
    (see forward_1d_scan_probs_batch's caveat): block products are folded
    ONCE on the host in float64, so the device scan takes L/k steps
    instead of L — both the per-step rounding exposure and the sequential
    depth drop by k. k auto-sizes to keep the table under budget_mb."""
    import numpy as np
    n_tok, S, _ = trans.shape
    base = n_tok + 1
    if k is None:
        k = 1
        while k < 8 and base ** (k + 1) * S * S * 4 <= budget_mb * (1 << 20):
            k += 1
    t64 = np.asarray(trans, np.float64)
    eye = np.where(np.eye(S, dtype=bool), 0.0, NEG_INF)
    level = np.concatenate([t64, eye[None]], axis=0)        # (base, S, S)
    table = level
    for _ in range(k - 1):
        # table_{j+1}[c*base + t] = table_j[c] (x) level[t]
        table = _np_log_matmul_batch(
            table[:, None], level[None])                    # (C, base, S, S)
        table = table.reshape(-1, S, S)
    return table, k


def make_forward_1d_blocked(trans, closure, k=None, chunk_combos=64,
                            dtype=None):
    """Batch-major blocked 1D Forward: fn(toks (B, L) 0-based, lens (B,))
    -> (B,) log-likelihoods.

    Per jitted step over macro-chunks of the sequence: gather the chunk's
    block matrices from the host-exact table (VMEM/HBM resident), fold
    them pairwise with log-depth semiring matmuls (MXU, HIGHEST), then
    advance the renormalized Kahan-scaled carry once per chunk — the
    sequential depth is L/(k*chunk_combos) instead of L, and every
    matmul's operands differ step to step (no correlated-rounding bias,
    unlike the wide prob-space scan)."""
    import numpy as np
    n_tok, S, _ = np.asarray(trans).shape
    table_np, k = build_token_block_table(np.asarray(trans), k=k)
    base = n_tok + 1
    if dtype is None:
        dtype = jnp.float32
    table = jnp.asarray(np.maximum(table_np, NEG_INF), dtype)
    closure = jnp.asarray(np.maximum(np.asarray(closure, np.float64),
                                     NEG_INF), dtype)
    # chunk_combos must be a power of two for the fold tree
    cc = 1
    while cc * 2 <= chunk_combos:
        cc *= 2
    pad_id = base ** k - 1                      # the all-identity block
    powers = np.array([base ** (k - 1 - j) for j in range(k)], np.int64)

    @jax.jit
    def fwd(toks, lens):
        B, L = toks.shape
        nC = -(-L // k)
        nMacro = -(-nC // cc)
        Lp = nMacro * cc * k
        pad = jnp.full((B, Lp - L), n_tok, toks.dtype)
        t = jnp.concatenate([
            jnp.where(jnp.arange(L)[None, :] < lens[:, None], toks, n_tok),
            pad], axis=1)
        ids = (t.reshape(B, nMacro * cc, k)
               * jnp.asarray(powers)[None, None, :]).sum(-1)
        ids = ids.reshape(B, nMacro, cc)

        f0 = _start_vector(S, closure, LOGSUMEXP, dtype)
        zero = jnp.zeros((), dtype)

        def step(carry, ids_c):
            f, scale, comp = carry                      # (B,S),(B,),(B,)
            mats = table[ids_c]                         # (B, cc, S, S)
            n = cc
            while n > 1:
                mats = LOGSUMEXP.matmul(mats[:, 0::2], mats[:, 1::2])
                n //= 2
            f_new = LOGSUMEXP.vecmat(f, mats[:, 0])
            norm = jnp.max(f_new, axis=-1)
            norm = jnp.where(norm > NEG_INF / 2, norm, zero)
            f_new = f_new - norm[:, None]
            y = norm - comp
            tt = scale + y
            comp_new = (tt - scale) - y
            return (f_new, tt, comp_new), None

        f0b = jnp.broadcast_to(f0, (B, S))
        (fL, scale, _), _ = jax.lax.scan(
            step, (f0b, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype)),
            jnp.transpose(ids, (1, 0, 2)))
        return fL[:, S - 1] + scale

    return fwd
