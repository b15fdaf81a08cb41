"""Log-space semirings for device DP.

Two semirings parameterize every DP kernel (ref behavior:
python/machineboss/jax/semiring.py in the reference's JAX package — here
re-designed for the MXU):

  LOGSUMEXP: (+) = logaddexp, (x) = +, zero = -inf, one = 0   [Forward]
  MAXPLUS:   (+) = max,       (x) = +, zero = -inf, one = 0   [Viterbi]

The hot op is the semiring matrix product C[i,j] = (+)_k A[i,k] + B[k,j].
For LOGSUMEXP this lowers to a REAL matmul on the MXU via max-shifting:

  C = log( exp(A - rmax(A)) @ exp(B - cmax(B)) ) + rmax(A) + cmax(B)

exp values lie in [0,1], so the f32 matmul is numerically safe; terms more
than ~80 nats below the row/col max underflow, which is far below the 1e-2
cross-backend tolerance. MAXPLUS stays on the VPU (broadcast max-reduce).
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite stand-in for log(0); avoids inf-inf NaNs under jit


class LogSemiring:
    name = "logsumexp"

    @staticmethod
    def add(a, b):
        return jnp.logaddexp(a, b)

    @staticmethod
    def reduce(x, axis=-1):
        return jax.scipy.special.logsumexp(x, axis=axis)

    @staticmethod
    def matmul(a, b):
        """(...,m,k) x (...,k,n) -> (...,m,n) via shifted real matmul (MXU)."""
        amax = jnp.max(a, axis=-1, keepdims=True)            # (...,m,1)
        bmax = jnp.max(b, axis=-2, keepdims=True)            # (...,1,n)
        asafe = jnp.where(amax > NEG_INF / 2, amax, 0.0)
        bsafe = jnp.where(bmax > NEG_INF / 2, bmax, 0.0)
        ea = jnp.exp(a - asafe)
        eb = jnp.exp(b - bsafe)
        # full f32 accumulation: the default (bf16-multiply) precision loses
        # ~4e-3 relative per product, visibly biasing long scan chains
        prod = jnp.matmul(ea, eb, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32
                          if a.dtype == jnp.float32 else None)
        c = jnp.log(jnp.maximum(prod, jnp.finfo(a.dtype).tiny)) \
            + asafe + bsafe
        return jnp.where(prod > 0, c, NEG_INF)

    @staticmethod
    def vecmat(v, m):
        """(...,k) x (...,k,n) -> (...,n)."""
        return LogSemiring.matmul(v[..., None, :], m)[..., 0, :]

    @staticmethod
    def matvec(m, v):
        return LogSemiring.matmul(m, v[..., :, None])[..., 0]

    @staticmethod
    def matmul_small(a, b):
        """Semiring matmul expanded ELEMENTWISE over the contraction dim
        — for tiny k (a transducer's 2-4 states): the MXU form pads k
        and n to full tiles (>98% wasted work at k=2) and its
        max-reduce/exp/log passes dominate; the broadcast form is a
        handful of fusible VPU ops. Measured 2.3x end-to-end on the
        fused-Plan7 flat solver (PERF.md round 5)."""
        z = a[..., :, :, None] + b[..., None, :, :]
        m = jnp.max(z, axis=-2)
        msafe = jnp.where(m > NEG_INF / 2, m, 0.0)
        s = jnp.sum(jnp.exp(z - msafe[..., None, :]), axis=-2)
        return jnp.where(m > NEG_INF / 2, jnp.log(s) + msafe, NEG_INF)

    @staticmethod
    def vecmat_small(v, m):
        z = v[..., :, None] + m
        mx = jnp.max(z, axis=-2)
        msafe = jnp.where(mx > NEG_INF / 2, mx, 0.0)
        s = jnp.sum(jnp.exp(z - msafe[..., None, :]), axis=-2)
        return jnp.where(mx > NEG_INF / 2, jnp.log(s) + msafe, NEG_INF)

    zero = NEG_INF
    one = 0.0


class MaxSemiring:
    name = "maxplus"

    @staticmethod
    def add(a, b):
        return jnp.maximum(a, b)

    @staticmethod
    def reduce(x, axis=-1):
        return jnp.max(x, axis=axis)

    @staticmethod
    def matmul(a, b):
        # (...,m,k,1) + (...,1,k,n) -> max over k
        return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    @staticmethod
    def vecmat(v, m):
        return jnp.max(v[..., :, None] + m, axis=-2)

    @staticmethod
    def matvec(m, v):
        return jnp.max(m + v[..., None, :], axis=-1)

    # max-plus matmul is already the elementwise broadcast form
    @staticmethod
    def matmul_small(a, b):
        return MaxSemiring.matmul(a, b)

    @staticmethod
    def vecmat_small(v, m):
        return MaxSemiring.vecmat(v, m)

    zero = NEG_INF
    one = 0.0


class ProbSemiring:
    """SCALED-PROBABILITY execution of the log semiring.

    Values are probabilities relative to a caller-carried per-item log
    scale; (+) is real +, (x) by a log CONSTANT is exp(const) * x, and
    the semiring matmul takes the LOG matrix and exps it internally —
    for compile-time-constant matrices XLA folds the exp away entirely,
    so a DP step lowers to pure multiply/add with NO transcendentals
    (the design of the Pallas wavefront/scan kernels, applied to an XLA
    graph: each LogSemiring op otherwise pays a max-reduce + exp + log
    pass over the whole tensor). The caller must renormalize its carry
    periodically (per DP row) and accumulate log scales; values more
    than ~87 nats below the carry scale flush to zero, far below the
    0.01-nat device contract."""

    name = "prob"

    @staticmethod
    def add(a, b):
        return a + b

    @staticmethod
    def reduce(x, axis=-1):
        return jnp.sum(x, axis=axis)

    @staticmethod
    def _exp(m_log):
        return jnp.exp(m_log)

    @staticmethod
    def matmul(a, b_log):
        return jnp.matmul(a, jnp.exp(b_log),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    @staticmethod
    def vecmat(v, m_log):
        return ProbSemiring.matmul(v[..., None, :], m_log)[..., 0, :]

    @staticmethod
    def matvec(m_log, v):
        # note: first arg is the LOG matrix, second the prob vector
        return jnp.matmul(jnp.exp(m_log), v[..., :, None],
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)[..., 0]

    @staticmethod
    def cx(c_log, x):
        """(x) by a log-space constant."""
        return jnp.exp(c_log) * x

    @staticmethod
    def matmul_small(a, b_log):
        return jnp.sum(a[..., :, :, None] * jnp.exp(b_log)[..., None, :, :],
                       axis=-2)

    @staticmethod
    def vecmat_small(v, m_log):
        return jnp.sum(v[..., :, None] * jnp.exp(m_log), axis=-2)

    zero = 0.0
    one = 1.0


# (x) by a log constant in the native log semirings is just +
LogSemiring.cx = staticmethod(lambda c, x: c + x)
MaxSemiring.cx = staticmethod(lambda c, x: c + x)

LOGSUMEXP = LogSemiring
MAXPLUS = MaxSemiring
PROB = ProbSemiring


def get_semiring(name):
    if name in ("logsumexp", "sum", "forward"):
        return LOGSUMEXP
    if name in ("maxplus", "max", "viterbi"):
        return MAXPLUS
    raise ValueError("Unknown semiring %r" % name)
