"""Parallel-axis engines: length-sharded and state-sharded scans must equal
the single-device engines."""

import numpy as np

from conftest import REF

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops import dp1d
from machineboss_tpu.ops.semiring import LOGSUMEXP
from machineboss_tpu.parallel.lengthshard import length_sharded_forward_fn
from machineboss_tpu.parallel.stateshard import state_sharded_scan_fn


def _gen_machine():
    from machineboss_tpu.core.csvprof import CSVProfile
    gen = CSVProfile.from_file(REF + "/t/csv/nanopore_test.csv").machine()
    ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32, dense_max_states=4096)
    trans, closure = lm.emit_matrices_1d(output_side=True)
    return ev, trans, closure


def test_length_sharded_equals_local():
    ev, trans, closure = _gen_machine()
    rng = np.random.RandomState(0)
    L = 16
    toks = jnp.array(rng.randint(0, trans.shape[0], L), jnp.int32)
    local = float(dp1d.forward_1d_scan(jnp.array(trans), jnp.array(closure),
                                       toks, L, sr=LOGSUMEXP))
    mesh = Mesh(np.array(jax.devices()[:4]), ("len",))
    fn = length_sharded_forward_fn(mesh, axis="len")
    sharded_vec = np.array(fn(jnp.array(trans), jnp.array(closure), toks,
                              jnp.int32(L)))
    sharded = float(sharded_vec[-1])
    assert abs(local - sharded) < 1e-3, (local, sharded)


def test_state_sharded_equals_local():
    ev, trans, closure = _gen_machine()
    S = closure.shape[0]
    # pad state dim to a multiple of 4 for sharding
    n = 4
    S_pad = ((S + n - 1) // n) * n
    tp = np.full((trans.shape[0], S_pad, S_pad), -1e30, np.float32)
    tp[:, :S, :S] = trans
    cp = np.full((S_pad, S_pad), -1e30, np.float32)
    cp[:S, :S] = closure
    # keep the end state at the last PADDED index by moving it
    tp[:, [S - 1, S_pad - 1]] = tp[:, [S_pad - 1, S - 1]]
    tp[:, :, [S - 1, S_pad - 1]] = tp[:, :, [S_pad - 1, S - 1]]
    cp[[S - 1, S_pad - 1]] = cp[[S_pad - 1, S - 1]]
    cp[:, [S - 1, S_pad - 1]] = cp[:, [S_pad - 1, S - 1]]

    rng = np.random.RandomState(0)
    L = 12
    toks = jnp.array(rng.randint(0, trans.shape[0], L), jnp.int32)
    local = float(dp1d.forward_1d_scan(jnp.array(tp), jnp.array(cp), toks,
                                       L, sr=LOGSUMEXP))
    mesh = Mesh(np.array(jax.devices()[:n]), ("state",))
    fn = state_sharded_scan_fn(mesh, axis="state")
    sharded = float(fn(jnp.array(tp), jnp.array(cp), toks, jnp.int32(L)))
    assert abs(local - sharded) < 1e-3, (local, sharded)
