"""Length-sharded 1D DP: the context-parallel axis for WFST scans.

The 1D transfer-matrix formulation is associative, so a sequence can be
sharded along L across chips (SURVEY §2.5): each chip reduces its local
block of (S,S) transfer matrices to a single product, the per-chip products
are combined across the 'len' mesh axis (all_gather + exclusive prefix in
log-depth; the gathered tensor is n_chips * S * S, tiny next to the local
work), and each chip then resolves its local prefix against its incoming
carry. One round-trip over ICI per forward pass.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.semiring import LOGSUMEXP


def _local_product(mats, sr):
    """Reduce (Lk, S, S) to a single product by log-depth pairwise matmuls."""
    def reduce_pairs(m):
        n = m.shape[0]
        if n == 1:
            return m[0]
        half = n // 2
        paired = sr.matmul(m[0:2 * half:2], m[1:2 * half:2])
        if n % 2:
            paired = jnp.concatenate([paired, m[-1:]], axis=0)
        return reduce_pairs(paired)
    return reduce_pairs(mats)


def length_sharded_forward_fn(mesh, sr=LOGSUMEXP, axis="len"):
    """Build fn(trans, closure, toks, length) -> final state vector, with
    toks sharded along `axis` of the mesh. trans/closure replicated."""

    n_shards = mesh.shape[axis]

    def shard_fn(trans, closure, toks, length):
        # toks: local (L/n,) block; global position offset from axis index
        idx = jax.lax.axis_index(axis)
        S = trans.shape[-1]
        eye = jnp.where(jnp.eye(S, dtype=bool), sr.one, sr.zero) \
                 .astype(trans.dtype)
        local_l = toks.shape[0]
        pos = idx * local_l + jnp.arange(local_l)
        mats = jnp.where((pos < length)[:, None, None], trans[toks],
                         eye[None])
        local_prod = _local_product(mats, sr)                 # (S, S)
        # gather all shard products (n*S*S floats over ICI) and finish the
        # global product redundantly on every chip -- cheaper than a second
        # collective for the tiny (S,S) carries
        all_prods = jax.lax.all_gather(local_prod, axis)      # (n, S, S)
        tail = _local_product(all_prods, sr)                  # global product
        f0 = jnp.full((S,), sr.zero, trans.dtype).at[0].set(sr.one)
        f0 = sr.vecmat(f0, closure)
        final = sr.vecmat(f0, tail)
        return final

    mapped = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(), P(axis), P()),
                       out_specs=P(), check_vma=False)
    return jax.jit(mapped)
