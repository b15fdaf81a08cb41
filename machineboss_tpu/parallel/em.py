"""Distributed EM: data-parallel E-step with psum count reduction.

Replaces the reference's serial per-seqpair count accumulation
(ref src/counts.cpp:37-71, MachineCounts::operator+=) with a shard_map over
the 'data' mesh axis: each chip runs the batched differentiable E-step
(ops/fwdback.py) on its shard of sequence pairs and the per-transition count
vectors are merged with a single psum over ICI — the count tensor is O(#
transitions) floats, so the collective is negligible next to the DP.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core.eval import EvaluatedMachine
from ..ops.fwdback import CountModel, tokenize_batch
from ..algo.counts import MachineCounts


def sharded_counts_fn(model: CountModel, mesh):
    """Build the pjit'd data-parallel E-step over a mesh with a 'data' axis.

    Returns fn(logw, in_toks, out_toks, in_lens, out_lens) ->
    (counts_vector, total_loglike), where batch arrays are sharded over
    'data' and the returned values are fully reduced (replicated)."""

    def shard_fn(logw, it, ot, il, ol, w):
        grads, total, _ = model.counts_and_loglike(it, ot, il, ol, logw=logw,
                                                   weights=w)
        return (jax.lax.psum(grads, "data"),
                jax.lax.psum(total, "data"))

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                  P("data")),
        out_specs=(P(), P()), check_vma=False)
    jitted = jax.jit(mapped)

    def fn(logw, it, ot, il, ol, weights=None):
        if weights is None:
            weights = jnp.ones((it.shape[0],), logw.dtype)
        return jitted(logw, it, ot, il, ol, weights)

    return fn


def device_counts(machine, all_params, training_set, envelopes=None,
                  mesh=None, dtype=jnp.float32):
    """Drop-in E-step for MachineFitter(engine='device').

    Computes expected counts for the whole training set on device (single
    chip or data-parallel mesh) and returns a host MachineCounts."""
    ev = EvaluatedMachine(machine, all_params)
    model = CountModel(ev, dtype=dtype)
    seq_pairs = list(training_set.seq_pairs)
    it, ot, il, ol = tokenize_batch(ev, seq_pairs)
    if mesh is not None:
        n_shard = mesh.shape["data"]
        pad = (-len(seq_pairs)) % n_shard
        weights = jnp.ones((len(seq_pairs) + pad,), dtype)
        if pad:
            # pad to a shardable batch by repeating leading rows with
            # objective weight 0: the padding pairs run through the DP but
            # contribute nothing to the loglike or (via the gradient) the
            # counts — one jitted call, no host-side correction pass
            it = jnp.concatenate([it, it[:pad]], 0)
            ot = jnp.concatenate([ot, ot[:pad]], 0)
            il = jnp.concatenate([il, il[:pad]], 0)
            ol = jnp.concatenate([ol, ol[:pad]], 0)
            weights = weights.at[-pad:].set(0.0)
        fn = sharded_counts_fn(model, mesh)
        grads, total = fn(model.logw, it, ot, il, ol, weights)
    else:
        grads, total, _ = model.counts_and_loglike(it, ot, il, ol)

    grads = np.array(grads, np.float64)
    counts = MachineCounts()
    counts.init(ev)
    offset = 0
    for s in range(ev.n_states()):
        n = ev.state[s].n_transitions
        counts.count[s][:] = grads[offset:offset + n]
        offset += n
    counts.loglike = float(total)
    return counts
