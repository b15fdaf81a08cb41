"""Fused (composition-free) Viterbi alignment vs the composed-machine host
engine. The headline property: projecting the product-graph traceback onto
the materialized composition yields a path achieving the composed machine's
own Viterbi optimum — alignment parity without ever composing."""

import json
import math

import numpy as np

from conftest import REF

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.core import weight as W
from machineboss_tpu.algo.dp_host import ViterbiMatrix
from machineboss_tpu.algo.fused_align import FusedViterbiAligner
from machineboss_tpu.core.hmmer import HmmerModel

from test_fused_plan7 import _HMM, _TD, _TD_PROT, _COMBOS


def _setup():
    hmm = HmmerModel()
    hmm.read(_HMM)
    return hmm, Machine.from_json(_TD)


def _gen(hmm, mode, local, multihit):
    return hmm.machine(local) if mode == "core" else \
        hmm.plan7_machine(multihit=multihit, length=10.0)


def test_path_consistency():
    """Traceback path re-scores to the lattice score; output matches."""
    hmm, td = _setup()
    for mode, local, multihit in _COMBOS:
        al = FusedViterbiAligner(_gen(hmm, mode, local, multihit), td)
        for seq in ("A", "ACG", "TTACGACGTT"):
            a = al.align(seq)
            assert abs(sum(s.lw for s in a.steps) - a.score) < 1e-9
            assert "".join(a.output_sequence()) == seq
            assert a.alignment_columns() == [("", c) for c in seq]


def test_projection_achieves_composed_viterbi_optimum():
    """The fused alignment, projected onto the composed machine, is a
    valid composed path whose weight EQUALS the composed machine's own
    ViterbiMatrix optimum — all four mode x multihit combos."""
    hmm, td = _setup()
    for mode, local, multihit in _COMBOS:
        gen = _gen(hmm, mode, local, multihit)
        al = FusedViterbiAligner(gen, td)
        comp = Machine.compose(gen, td)
        params = comp.get_param_defs(True)
        ev = EvaluatedMachine(comp, params)
        for seq in ("ACG", "TTACGACGTT"):
            a = al.align(seq)
            vm = ViterbiMatrix(ev, SeqPair(NamedSeq("i", []),
                                           NamedSeq("o", list(seq))))
            path = a.to_machine_path(comp)
            w = sum(math.log(W.evaluate(t.weight, params.defs))
                    for t in path.trans)
            assert abs(w - vm.log_like()) < 1e-9, (mode, local, multihit,
                                                   seq, w, vm.log_like())
            assert "".join(t.out for t in path.trans if t.out) == seq


def test_fn3_alignment():
    """fn3.hmm x protein read, plan7 multihit — the flagship HMMER use
    case. Materializing this composition takes >10 MINUTES on host (the
    multihit machine's giant silent SCC makes compose's cycle fold
    pathological — measured, see PERF.md), so this is exactly the case
    the fused aligner exists for: it aligns in milliseconds. Validation
    is composition-free: the path re-scores exactly, reproduces the
    read, anchors real match states, and the score matches the
    INDEPENDENT fused device engine (ops/fused_plan7.py maxplus — a
    closure-algebra implementation, not a product-graph fill;
    tests/test_fused_plan7.py::test_fused_viterbi_fn3 pins both).
    Composed-machine projection parity is covered on the toy profile in
    test_projection_achieves_composed_viterbi_optimum."""
    from machineboss_tpu.ops.fused_plan7 import Plan7Fused
    hmm = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    td = Machine.from_json(_TD_PROT)
    gen = hmm.plan7_machine(multihit=True, length=10.0)
    al = FusedViterbiAligner(gen, td)
    seq = "ACDEFGHIKLMNPQRSTVWYACDEFG"
    a = al.align(seq)
    assert abs(sum(st.lw for st in a.steps) - a.score) < 1e-9
    assert "".join(a.output_sequence()) == seq
    names = [al.gen.states[st.g_dst].name for st in a.steps]
    assert any(n and n.startswith("M") for n in names)
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    fused = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True,
                       length=10.0, semiring="maxplus")
    got = fused.forward(list(seq))
    assert abs(got - a.score) < 2e-4, (got, a.score)


def test_path_json_format():
    """Product-space path JSON mirrors the reference's path schema
    ({"start","id","trans":[{"to","id","out"}...]})."""
    hmm, td = _setup()
    al = FusedViterbiAligner(_gen(hmm, "plan7", True, False), td)
    a = al.align("ACG")
    doc = json.loads(a.path_json_str())
    assert doc["start"] == 0
    assert doc["id"] == ["S", "loop"]
    outs = [t.get("out") for t in doc["trans"] if "out" in t]
    assert outs == ["A", "C", "G"]
    for t in doc["trans"]:
        assert "to" in t and "id" in t


def test_impossible_sequence_raises():
    hmm, td = _setup()
    al = FusedViterbiAligner(_gen(hmm, "core", False, False), td)
    # global core mode cannot emit nothing through M-chain with this toy?
    # use a symbol outside the transducer's output alphabet instead
    try:
        al.align("Z")
        raised = False
    except (ValueError, KeyError):
        raised = True
    assert raised


# ------------------------------------------------------------------- CLI

def test_cli_fused_align_golden():
    """`--engine fused --viterbi --align` byte-matches the committed
    golden, and its alignments agree with the host composed-machine
    engine (same columns and path anchoring; the fused score is the
    best-collapsed-path score, <= the composed score which includes
    compose's silent-path sum-splices — see ops/fused_plan7.py)."""
    import os
    from test_golden_cli import run_cli
    d = os.path.join(os.path.dirname(__file__), "golden", "fused")
    args = ["--hmmer-plan7", os.path.join(d, "toy.hmm"),
            os.path.join(d, "noise_td.json"),
            "--viterbi", "--align", "--data", os.path.join(d, "reads.json")]
    status, fused_out = run_cli(args + ["--engine", "fused"])
    assert status in (0, None)
    with open(os.path.join(d, "align-toy.expect")) as f:
        assert fused_out == f.read()

    status, host_out = run_cli(args)
    assert status in (0, None)
    f_lines = fused_out.splitlines()
    h_lines = host_out.splitlines()
    f_scores = json.loads("".join(f_lines[:2]))
    h_scores = json.loads("".join(h_lines[:2]))
    f_align = json.loads("".join(f_lines[2:]))
    h_align = json.loads("".join(h_lines[2:]))
    for fs, hs in zip(f_scores, h_scores):
        assert fs[:2] == hs[:2]
        assert fs[2] <= hs[2] + 1e-6          # composed >= collapsed-path
        # splice boost grows ~linearly with read length
        assert hs[2] - fs[2] < 0.05 * len(hs[1]) + 0.1
    for fa, ha in zip(f_align, h_align):
        assert fa["alignment"] == ha["alignment"]
        # same profile anchoring: the sequence of gen-state ids visited
        def anchors(doc):
            out = []
            for t in doc["meta"]["path"]["trans"]:
                nm = t.get("id")
                while isinstance(nm, list) and len(nm) == 2 and \
                        nm[0] in ("concat-l", "concat-r"):
                    nm = nm[1]
                if isinstance(nm, list):
                    g = nm[0]
                    if isinstance(g, str) and (not out or out[-1] != g):
                        out.append(g)
            return out
        fan, han = anchors(fa), anchors(ha)
        # compose splices silent pass-through states away, so the host
        # path's anchors are a SUBSEQUENCE of the fused product path's
        def is_subseq(sub, seq):
            it = iter(seq)
            return all(x in it for x in sub)
        assert is_subseq(han, fan), (fan, han)
        # and both must visit the same EMITTING anchors (Mx states carry
        # the match emissions — those can never be spliced)
        assert [a for a in fan if a.startswith("Mx")] == \
            [a for a in han if a.startswith("Mx")], (fan, han)


def test_cli_fused_fn3_multihit():
    """The flagship HMMER case end-to-end through the CLI: fn3.hmm
    (multihit plan7) x protein reads, --engine fused — the composition
    this avoids takes >10 minutes to materialize on host (PERF.md)."""
    import os
    import tempfile
    from test_golden_cli import run_cli
    td = _TD_PROT
    d = tempfile.mkdtemp()
    tf = os.path.join(d, "td.json")
    with open(tf, "w") as f:
        json.dump(td, f)
    rf = os.path.join(d, "reads.json")
    with open(rf, "w") as f:
        json.dump([{"input": {"name": "", "sequence": []},
                    "output": {"name": "r1",
                               "sequence": list("ACDEFGHIKLMN")}}], f)
    status, out = run_cli(["--hmmer-multihit", REF + "/t/hmmer/fn3.hmm",
                           tf, "--viterbi", "--align", "--data", rf,
                           "--engine", "fused"])
    assert status in (0, None)
    lines = out.splitlines()
    scores = json.loads(lines[0] + lines[1] if not lines[0].endswith("]")
                        else lines[0])
    assert scores[0][1] == "r1" and np.isfinite(scores[0][2])
    al = json.loads("".join(lines[1 if lines[0].endswith("]") else 2:]))
    assert "".join(c for _, c in al[0]["alignment"]) == "ACDEFGHIKLMN"
