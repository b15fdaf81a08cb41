"""Device mesh helpers.

The framework's parallelism axes:
  'data'   : sequence batches (data parallel; EM counts merged by psum)
  'len'    : sequence length (length-sharded associative scans, the
             context-parallel analog for WFST DP)
  'state'  : machine state dimension (sharded semiring matmuls for very
             large compositions, the tensor-parallel analog)

All collectives ride XLA's ICI/DCN paths via shard_map + psum/all_gather;
no custom transport.
"""

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def make_mesh(data=None, length=1, state=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (length * state)
    shape = (data, length, state)
    if int(np.prod(shape)) != n:
        raise ValueError("mesh %s does not cover %d devices" % (shape, n))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, ("data", "len", "state"))


def data_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("data",))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, axis="data"):
    return NamedSharding(mesh, P(axis))
