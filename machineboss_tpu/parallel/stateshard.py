"""State-sharded semiring operations: the tensor-parallel axis.

For very large compositions the (S, S) transfer matrices dominate memory
and matmul time; shard them column-wise over the 'state' mesh axis. A
forward step f' = f (x) M then computes each chip's output block locally
from the replicated input vector and finishes with one all_gather of the
(S/n)-sized pieces — ordinary sharded matmul in the (logsumexp, +)
semiring, riding ICI.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.semiring import LOGSUMEXP


def state_sharded_scan_fn(mesh, sr=LOGSUMEXP, axis="state"):
    """Build fn(trans, closure, toks, length) -> final state vector with the
    per-token transfer matrices column-sharded over `axis`.

    trans: (T, S, S) sharded on the last dim; closure likewise; the state
    vector stays replicated (S is assumed large but the vector is cheap to
    gather)."""

    def shard_fn(trans, closure, toks, length):
        S = closure.shape[0]  # full rows; local columns = S // n
        f0 = jnp.full((S,), sr.zero, trans.dtype).at[0].set(sr.one)
        f0_local = sr.vecmat(f0, closure)          # local column block
        f0_full = jax.lax.all_gather(f0_local, axis, tiled=True)

        def step(f, inp):
            tok, pos = inp
            f_local = sr.vecmat(f, trans[tok])     # (S,) x (S, S/n)
            f_new = jax.lax.all_gather(f_local, axis, tiled=True)
            return jnp.where(pos < length, f_new, f), None

        fL, _ = jax.lax.scan(step, f0_full,
                             (toks, jnp.arange(toks.shape[0])))
        return fL[S - 1]

    mapped = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(None, None, axis), P(None, axis), P(),
                                 P()),
                       out_specs=P(), check_vma=False)
    return jax.jit(mapped)
