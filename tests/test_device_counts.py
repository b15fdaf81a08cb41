"""Device E-step (autodiff counts) vs the host Forward-Backward oracle, and
data-parallel EM invariance: 1-chip results == N-chip results."""

import json

import numpy as np
import pytest

from conftest import REF

import jax
import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json, Constraints
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, SeqPairList, NamedSeq
from machineboss_tpu.algo.counts import MachineCounts
from machineboss_tpu.ops.fwdback import CountModel, tokenize_batch
from machineboss_tpu.parallel.em import device_counts
from machineboss_tpu.parallel.mesh import data_mesh


def _load(path):
    with open(path) as f:
        return json.load(f)


def _setup():
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    params = param_assign_from_json(_load(REF + "/t/io/params.json"))
    ev = EvaluatedMachine(m, params)
    return m, params, ev


def _sp(i, o):
    return SeqPair(NamedSeq("i", list(i)), NamedSeq("o", list(o)))


def test_counts_match_host():
    m, params, ev = _setup()
    pairs = [_sp("101", "001"), _sp("1101", "1110"), _sp("0", "0")]
    host = MachineCounts(ev, SeqPairList(pairs))
    model = CountModel(ev, dtype=jnp.float32)
    it, ot, il, ol = tokenize_batch(ev, pairs)
    grads, total, lls = model.counts_and_loglike(it, ot, il, ol)
    assert abs(float(total) - host.loglike) < 1e-3
    flat_host = np.concatenate(host.count)
    np.testing.assert_allclose(np.array(grads), flat_host, rtol=1e-3,
                               atol=1e-4)


def test_counts_stutter_silent():
    """Machine with silent transitions: counts flow through the closure."""
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    params = param_assign_from_json(_load(REF + "/t/io/params.json"))
    ev = EvaluatedMachine(m, params)
    pairs = [_sp("101", "0011")]
    host = MachineCounts(ev, SeqPairList(pairs))
    model = CountModel(ev, dtype=jnp.float32)
    it, ot, il, ol = tokenize_batch(ev, pairs)
    grads, total, _ = model.counts_and_loglike(it, ot, il, ol)
    assert abs(float(total) - host.loglike) < 1e-3
    flat_host = np.concatenate(host.count)
    np.testing.assert_allclose(np.array(grads), flat_host, rtol=1e-3,
                               atol=1e-4)


def test_device_counts_sharded_invariance():
    """Counts must be identical with and without a data mesh."""
    m, params, ev = _setup()
    pairs = [_sp("101", "001"), _sp("1101", "1110"), _sp("0", "0"),
             _sp("10", "10"), _sp("111", "101")]
    spl = SeqPairList(pairs)
    single = device_counts(m, params, spl)
    mesh = data_mesh()
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    multi = device_counts(m, params, spl, mesh=mesh)
    assert abs(single.loglike - multi.loglike) < 1e-3
    for s in range(len(single.count)):
        np.testing.assert_allclose(multi.count[s], single.count[s],
                                   rtol=1e-3, atol=1e-4)


def test_device_em_fit():
    """EM with the device E-step converges to the same params as host EM."""
    from machineboss_tpu.algo.fitter import MachineFitter
    m, params, ev = _setup()
    cons = Constraints.from_json(_load(REF + "/t/io/pqcons.json"))
    spl = SeqPairList.from_json(_load(REF + "/t/io/seqpairlist.json"))
    host_fit = MachineFitter(machine=m, constraints=cons,
                             seed=cons.default_params()).fit(spl)
    dev_fit = MachineFitter(machine=m, constraints=cons,
                            seed=cons.default_params(),
                            engine="device").fit(spl)
    for k in host_fit.defs:
        assert abs(float(host_fit.defs[k]) - float(dev_fit.defs[k])) < 1e-3, k
