"""Data-parallel batched inference: Forward log-likelihoods over a mesh.

The serving-side counterpart of parallel/em.py: the machine's lowered
tensors are replicated per chip and the (padded, masked) seqpair batch
is sharded over the 'data' mesh axis; each chip runs the 2D wavefront
on its shard and the per-pair log-likelihoods are all-gathered. One
invocation scores B pairs on N chips at N-way throughput — the
multi-host "reads/s at 1/N hosts" deployment shape from BASELINE.json.

No reference counterpart (the reference is single-process,
SURVEY.md §2.5); designed TPU-first with shard_map over XLA collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def sharded_forward_fn(lowered, mesh):
    """Build the pjit'd data-parallel batched Forward.

    lowered: ops.lowering.LoweredMachine (dense 2D). Returns
    fn(in_toks (B,Li), out_toks (B,Lo), in_lens, out_lens) -> (B,)
    log-likelihoods, with B divisible by the 'data' axis size (pad with
    repeated pairs and slice, as dispatch._log_forward_batch_bucketed
    does, when it is not)."""
    from ..ops.wavefront_fast import forward_2d_wavefront_fast

    mats = tuple(jnp.array(x) for x in lowered.matrices_2d())

    def shard_fn(it, ot, il, ol):
        return forward_2d_wavefront_fast(*mats, it, ot, il, ol)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False)
    return jax.jit(mapped)


def forward_batch_sharded(ev, seq_pairs, mesh, dtype=jnp.float32):
    """Score tokenizable SeqPairs data-parallel over `mesh` ('data'
    axis). Returns a numpy (B,) array aligned with seq_pairs."""
    from ..ops.lowering import LoweredMachine
    from ..ops.fwdback import tokenize_batch

    lm = LoweredMachine(ev, dtype=np.dtype(dtype).type)
    it, ot, il, ol = tokenize_batch(ev, list(seq_pairs))
    B = it.shape[0]
    n = mesh.shape["data"]
    pad = (-B) % n
    if pad:
        rep = lambda a: np.concatenate([np.asarray(a)] +
                                       [np.asarray(a)[-1:]] * pad, axis=0)
        it, ot, il, ol = rep(it), rep(ot), rep(il), rep(ol)
    fn = sharded_forward_fn(lm, mesh)
    out = np.array(fn(jnp.asarray(it), jnp.asarray(ot),
                      jnp.asarray(il), jnp.asarray(ol)))
    return out[:B]
