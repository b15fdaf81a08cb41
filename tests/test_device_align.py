"""Device-engine alignment/counts parity: `--engine device` must reproduce
the reference golden outputs byte-for-byte (Viterbi fill + E-step run on
the device engines; traceback and JSON emission on host).

Golden anchors: ref Makefile:515-516 (align-stutter-noise) and the counts
suite; device capability anchor: ref js/webgpu/machineboss-gpu.mjs:63
(GPU viterbi+path / posteriors)."""

import json
import os
import sys

import numpy as np

from test_golden_cli import run_cli, T

from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ViterbiMatrix


def _expect(path):
    with open(path) as f:
        return f.read()


def test_device_align_matches_golden():
    status, out = run_cli([T("machine/bitstutter.json"),
                           T("machine/bitnoise.json"), "-P",
                           T("io/params.json"), "-D", T("io/difflen.json"),
                           "--engine", "device", "-A"])
    assert status == 0
    assert out == _expect(T("expect/align-stutter-noise-difflen.json"))


def test_device_align_matches_host_engine():
    args = [T("machine/bitstutter.json"), T("machine/bitnoise.json"), "-P",
            T("io/params.json"), "-D", T("io/difflen.json"), "-A", "-V"]
    s_host, host = run_cli(args)
    s_dev, dev = run_cli(args[:-2] + ["--engine", "device", "-A", "-V"])
    assert s_host == 0 and s_dev == 0
    # Viterbi log-likes agree to f32 fill noise; alignments byte-identical
    host_align = host.split("\n", 1)
    dev_align = dev.split("\n", 1)
    assert dev_align[1] == host_align[1]


def test_device_counts_matches_golden():
    status, out = run_cli([T("machine/bitnoise.json"), "--input-chars",
                           "101", "--output-chars", "001", "-P",
                           T("io/params.json"), "-N", T("io/pqcons.json"),
                           "--engine", "device", "-C"])
    assert status == 0
    assert out == _expect(T("expect/counts.json"))


def test_banded_device_align_matches_host_banded():
    """--wiggle-room bands on the DEVICE align path: the banded Pallas
    MAXPLUS kernel (per-diagonal sliding window, only band cells filled)
    must reproduce the host banded ViterbiMatrix — scores AND alignments
    (ref --wiggle-room banding, ref src/seqpair.h:75-113)."""
    from machineboss_tpu.core.seqpair import Envelope
    from machineboss_tpu.algo.viterbi_device import device_viterbi_matrices
    from bench import build_random_transducer

    m = build_random_transducer(6, list("ACGT"), seed=2)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    rng = np.random.RandomState(1)
    Li = Lo = 24
    xs = [("ACGT")[c] for c in rng.randint(0, 4, Li)]
    ys = [("ACGT")[c] for c in rng.randint(0, 4, Lo)]
    align = [(a, b) for a, b in zip(xs, ys)]
    spa = SeqPair(NamedSeq("x", xs), NamedSeq("y", ys), align)
    env = Envelope(spa, width=4)

    host = ViterbiMatrix(ev, spa, env=env)
    dev = device_viterbi_matrices(ev, [spa], envelopes=[env],
                                  interpret=True)[0]
    assert abs(dev.log_like() - host.log_like()) < 1e-4
    hp = host.traceback(m)
    dp = dev.traceback(m)
    assert [(t.in_, t.out, t.dest) for t in hp.trans] == \
        [(t.in_, t.out, t.dest) for t in dp.trans]


def test_cli_banded_device_align():
    """`--align --wiggle-room --engine device` end-to-end equals the
    host banded align byte-for-byte."""
    import io
    from machineboss_tpu.cli import main

    def run(args):
        out = io.StringIO()
        old = sys.stdout
        sys.stdout = out
        try:
            status = main(args)
        finally:
            sys.stdout = old
        return status, out.getvalue()

    # weights chosen tie-free so the optimal alignment is unique (f32
    # fill noise must not be able to flip an exact-tie argmax)
    m = {"state": [
        {"id": "s", "trans": [
            {"in": "A", "out": "A", "to": "s", "weight": 0.47},
            {"in": "A", "out": "C", "to": "s", "weight": 0.09},
            {"in": "C", "out": "C", "to": "s", "weight": 0.39},
            {"in": "C", "out": "A", "to": "s", "weight": 0.11},
            {"in": "G", "out": "G", "to": "s", "weight": 0.3},
            {"in": "A", "to": "s", "weight": 0.05},
            {"in": "C", "to": "s", "weight": 0.03},
            {"in": "G", "to": "s", "weight": 0.04},
            {"out": "A", "to": "s", "weight": 0.02},
            {"to": "e", "weight": 0.1}]},
        {"id": "e", "trans": []}]}
    # the deleted symbol (G) appears exactly once, so the optimal
    # alignment is unique — no ties for f32 fill noise to flip
    data = [{"input": {"name": "x", "sequence": list("ACAGCC")},
             "output": {"name": "y", "sequence": list("ACACC")},
             "alignment": [["A", "A"], ["C", "C"], ["A", "A"], ["G", ""],
                           ["C", "C"], ["C", "C"]]}]
    import tempfile
    d = tempfile.mkdtemp()
    mf = os.path.join(d, "m.json")
    df = os.path.join(d, "data.json")
    with open(mf, "w") as f:
        json.dump(m, f)
    with open(df, "w") as f:
        json.dump(data, f)
    args = [mf, "--align", "--data", df, "--wiggle-room", "2"]
    s1, host_out = run(args)
    s2, dev_out = run(args + ["--engine", "device"])
    assert s1 in (0, None) and s2 in (0, None)
    assert host_out == dev_out
    assert '"alignment"' in host_out


def test_sparse_device_traceback_avoids_readback():
    """The device walk must serve the whole traceback from the sparse
    path-neighborhood records — no full-lattice materialization — and
    reproduce the host alignment exactly (banded AND full-lattice)."""
    from machineboss_tpu.core.seqpair import Envelope
    from machineboss_tpu.algo.viterbi_device import (
        device_viterbi_matrices, SparseDeviceViterbiMatrix)
    from bench import build_random_transducer

    m = build_random_transducer(6, list("ACGT"), seed=2)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    rng = np.random.RandomState(7)
    Li = Lo = 24
    xs = [("ACGT")[c] for c in rng.randint(0, 4, Li)]
    ys = [("ACGT")[c] for c in rng.randint(0, 4, Lo)]
    align = [(a, b) for a, b in zip(xs, ys)]
    spa = SeqPair(NamedSeq("x", xs), NamedSeq("y", ys), align)

    host = ViterbiMatrix(ev, spa)
    hp = host.traceback(m)

    # full-lattice batched path
    dev = device_viterbi_matrices(ev, [spa], interpret=True)[0]
    assert isinstance(dev, SparseDeviceViterbiMatrix)
    assert abs(dev.log_like() - host.log_like()) < 1e-4
    dp = dev.traceback(m)
    assert dev._full is None, "sparse traceback fell back to full readback"
    assert [(t.in_, t.out, t.dest) for t in hp.trans] == \
        [(t.in_, t.out, t.dest) for t in dp.trans]

    # banded path
    env = Envelope(spa, width=4)
    hostb = ViterbiMatrix(ev, spa, env=env)
    devb = device_viterbi_matrices(ev, [spa], envelopes=[env],
                                   interpret=True)[0]
    assert isinstance(devb, SparseDeviceViterbiMatrix)
    dpb = devb.traceback(m)
    assert devb._full is None, "banded sparse traceback fell back"
    hpb = hostb.traceback(m)
    assert [(t.in_, t.out, t.dest) for t in hpb.trans] == \
        [(t.in_, t.out, t.dest) for t in dpb.trans]


def test_sparse_device_traceback_fallback_is_safe():
    """If the sparse record set is damaged (simulating a device/host tie
    divergence), the traceback must transparently fall back to the full
    lattice and still produce the host alignment."""
    from machineboss_tpu.algo.viterbi_device import (
        device_viterbi_matrices, SparseDeviceViterbiMatrix)
    from bench import build_random_transducer

    m = build_random_transducer(6, list("ACGT"), seed=2)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    rng = np.random.RandomState(9)
    xs = [("ACGT")[c] for c in rng.randint(0, 4, 12)]
    ys = [("ACGT")[c] for c in rng.randint(0, 4, 12)]
    spa = SeqPair(NamedSeq("x", xs), NamedSeq("y", ys),
                  [(a, b) for a, b in zip(xs, ys)])
    dev = device_viterbi_matrices(ev, [spa], interpret=True)[0]
    assert isinstance(dev, SparseDeviceViterbiMatrix)
    # drop half the records: the walk is now incomplete mid-path
    keys = sorted(dev._cells)
    for k in keys[: len(keys) // 2]:
        if k != (12, 12):
            del dev._cells[k]
    host = ViterbiMatrix(ev, spa)
    hp = host.traceback(m)
    dp = dev.traceback(m)
    assert dev._full is not None, "expected the fallback to trigger"
    assert [(t.in_, t.out, t.dest) for t in hp.trans] == \
        [(t.in_, t.out, t.dest) for t in dp.trans]
