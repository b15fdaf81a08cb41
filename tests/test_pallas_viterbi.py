"""Pallas MAXPLUS (Viterbi) wavefront kernel, interpret mode.

Parity targets: the host ViterbiMatrix fill (float64 table-free max-plus)
and the byte-level alignment goldens walked through the SAME traceback.
Reference capability: GPU viterbi(+path) in the WebGPU package
(ref js/webgpu/machineboss-gpu.mjs:63, shaders/wavefront-viterbi.wgsl).
"""

import json

import numpy as np

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ViterbiMatrix
from machineboss_tpu.algo.viterbi_device import device_viterbi_matrices
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops.pallas.viterbi_kernel import make_wavefront_viterbi

TOL = 1e-4


def _compose_stutter_noise():
    a = Machine.from_file(REF + "/t/machine/bitstutter.json")
    b = Machine.from_file(REF + "/t/machine/bitnoise.json")
    m = Machine.compose(a, b)
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    return m, EvaluatedMachine(m, params)


def test_pallas_viterbi_kernel_lattice_matches_host():
    """Raw kernel lattice vs host ViterbiMatrix cells (all-class machine:
    bitstutter has up/left structure, the noise composition adds diag)."""
    m, ev = _compose_stutter_noise()
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))
    rng = np.random.RandomState(0)
    B, Li, Lo = 4, 6, 5
    it = rng.randint(0, 2, (B, Li)).astype(np.int32)
    ot = rng.randint(0, 2, (B, Lo)).astype(np.int32)
    vit = make_wavefront_viterbi(*mats, B, Li, Lo, interpret=True)
    diags = np.asarray(vit(jnp.array(it), jnp.array(ot)))
    from machineboss_tpu.ops.wavefront import lattice_from_diagonals
    lat = lattice_from_diagonals(diags, Li, Lo)      # (B, Li+1, Lo+1, S)
    for b in range(B):
        sp = SeqPair(NamedSeq("i", ["01"[t] for t in it[b]]),
                     NamedSeq("o", ["01"[t] for t in ot[b]]))
        host = ViterbiMatrix(ev, sp)
        hc = np.asarray(host.cell)                   # (Li+1, Lo+1, S)
        dc = lat[b]
        both = (hc > -1e29) & (dc > -1e29)
        assert np.array_equal(hc > -1e29, dc > -1e29), b
        assert np.abs(hc[both] - dc[both]).max() < TOL, b


def test_pallas_viterbi_device_matrices_alignment():
    """Full wiring: device_viterbi_matrices(engine='pallas') traceback
    equals the host ViterbiMatrix traceback (same machine, same pairs)."""
    m, ev = _compose_stutter_noise()
    rng = np.random.RandomState(3)
    pairs = []
    for _ in range(3):
        li, lo = rng.randint(2, 7), rng.randint(2, 7)
        pairs.append(SeqPair(
            NamedSeq("i", ["01"[t] for t in rng.randint(0, 2, li)]),
            NamedSeq("o", ["01"[t] for t in rng.randint(0, 2, lo)])))
    dev = device_viterbi_matrices(ev, pairs, engine="pallas",
                                  interpret=True)
    for sp, dm in zip(pairs, dev):
        host = ViterbiMatrix(ev, sp)
        if host.log_like() == -np.inf:
            assert dm.log_like() < -1e20
            continue
        assert abs(dm.log_like() - host.log_like()) < TOL
        assert dm.path(m).to_json() == host.traceback(m).to_json()


def test_viterbi_f64_oracle_matches_host():
    """viterbi_2d_f64 (the bench gate oracle) == host ViterbiMatrix."""
    from machineboss_tpu.ops.host_oracle import viterbi_2d_f64
    m, ev = _compose_stutter_noise()
    lm = LoweredMachine(ev, dtype=np.float64)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))
    rng = np.random.RandomState(7)
    for _ in range(6):
        li, lo = rng.randint(0, 7), rng.randint(0, 7)
        it = rng.randint(0, 2, li)
        ot = rng.randint(0, 2, lo)
        sp = SeqPair(NamedSeq("i", ["01"[t] for t in it]),
                     NamedSeq("o", ["01"[t] for t in ot]))
        host = ViterbiMatrix(ev, sp).log_like()
        got = viterbi_2d_f64(*mats, it, ot)
        if host == -np.inf:
            assert got < -1e29
        else:
            assert abs(got - host) < 1e-9, (li, lo, host, got)


def test_pallas_viterbi_class_specialization():
    """up+left-only machine (no diag class) through the kernel."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_pallas_kernel import build_indel_transducer
    mm = build_indel_transducer(5, list("AC"), seed=21)
    ev = EvaluatedMachine(mm, mm.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))
    rng = np.random.RandomState(5)
    B, L = 3, 5
    it = rng.randint(0, 2, (B, L)).astype(np.int32)
    ot = rng.randint(0, 2, (B, L)).astype(np.int32)
    vit = make_wavefront_viterbi(*mats, B, L, L, interpret=True)
    diags = np.asarray(vit(jnp.array(it), jnp.array(ot)))
    from machineboss_tpu.ops.wavefront import lattice_from_diagonals
    lat = lattice_from_diagonals(diags, L, L)
    for b in range(B):
        sp = SeqPair(NamedSeq("i", ["AC"[t] for t in it[b]]),
                     NamedSeq("o", ["AC"[t] for t in ot[b]]))
        host = ViterbiMatrix(ev, sp)
        hll = host.log_like()
        dll = float(lat[b, L, L, lat.shape[-1] - 1])
        if hll == -np.inf:
            assert dll < -1e20, b
        else:
            assert abs(dll - hll) < TOL, (b, hll, dll)
