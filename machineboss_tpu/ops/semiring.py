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

    zero = NEG_INF
    one = 0.0


LOGSUMEXP = LogSemiring
MAXPLUS = MaxSemiring


def get_semiring(name):
    if name in ("logsumexp", "sum", "forward"):
        return LOGSUMEXP
    if name in ("maxplus", "max", "viterbi"):
        return MAXPLUS
    raise ValueError("Unknown semiring %r" % name)
