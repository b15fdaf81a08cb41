"""Unit tests mirroring the reference's per-subsystem unit binaries
(ref t/src/test*.cpp, Makefile:424-530): weight algebra derivatives and
evaluation, envelopes, seqpair round-trips, params/constraints round-trips,
FASTA I/O, forward/backward/counts matrix dumps."""

import json
import math

import pytest

from conftest import REF

from machineboss_tpu.core import weight as W
from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import (Params, Constraints,
                                         param_assign_from_json,
                                         param_funcs_from_json)
from machineboss_tpu.core.seqpair import SeqPair, SeqPairList, Envelope
from machineboss_tpu.core.fastseq import read_fast_seqs
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.algo.dp_host import ForwardMatrix, BackwardMatrix
from machineboss_tpu.algo.counts import MachineCounts


def _load(path):
    with open(path) as f:
        return json.load(f)


def _expr_file(path):
    return W.from_json(_load(path))


# ---- weight algebra (ref testderiv, testeval, testlistparams) -------------

def test_deriv_xplusy_x():
    e = _expr_file(REF + "/t/algebra/x_plus_y.json")
    d = W.deriv(e, {}, "x")
    assert W.to_json_str(d) == \
        open(REF + "/t/expect/dxplusy_dx.json").read().strip()


def test_deriv_xy_x():
    e = _expr_file(REF + "/t/algebra/x_times_y.json")
    d = W.deriv(e, {}, "x")
    assert W.to_json_str(d) == '"y"'


def test_list_params():
    e = _expr_file(REF + "/t/algebra/x_times_y.json")
    assert sorted(W.params_of(e)) == ["x", "y"]


def test_eval_1plus2():
    e = _expr_file(REF + "/t/algebra/x_plus_y.json")
    params = param_assign_from_json(_load(REF + "/t/algebra/params.json"))
    assert W.evaluate(e, params.defs) == 3


# ---- envelopes (ref testenv) ----------------------------------------------

def _env_json(env):
    return env.to_json_str()


def _env_case(sp_file, mode):
    sp = SeqPair.from_json(_load(REF + "/t/io/" + sp_file))
    env = Envelope()
    if mode == "full":
        env.init_full(sp)
    elif mode == "path":
        env.init_path(sp.alignment)
    else:
        env.init_path_area(sp.alignment, int(mode))
    return env.to_json_str()


@pytest.mark.parametrize("sp_file,mode,golden", [
    ("tinypath.json", "full", "tinypath_full_env.json"),
    ("tinypath.json", "path", "tinypath_path_env.json"),
    ("smallpath.json", "path", "smallpath_path_env.json"),
    ("smallpath.json", "0", "smallpath_area0_env.json"),
    ("smallpath.json", "1", "smallpath_area1_env.json"),
    ("smallpath.json", "2", "smallpath_area2_env.json"),
    ("smallpath.json", "3", "smallpath_area3_env.json"),
    ("smallpath.json", "4", "smallpath_area4_env.json"),
    ("smallpath.json", "5", "smallpath_area4_env.json"),
    ("asympath.json", "0", "asympath_area0_env.json"),
    ("asympath.json", "1", "asympath_area1_env.json"),
])
def test_envelope(sp_file, mode, golden):
    got = _env_case(sp_file, mode)
    expect = open(REF + "/t/expect/" + golden).read().strip()
    assert got == expect


# ---- seqpair round trips (ref testseqpair/testseqpairlist) ----------------

@pytest.mark.parametrize("f", ["tiny.json", "tinypath.json"])
def test_seqpair_idempotent(f):
    text = open(REF + "/t/io/" + f).read()
    sp = SeqPair.from_json(json.loads(text))
    out = sp.to_json_str()
    sp2 = SeqPair.from_json(json.loads(out))
    assert sp2.to_json_str() == out


def test_seqpair_fail():
    with pytest.raises(Exception):
        SeqPair.from_json(_load(REF + "/t/io/tinyfail.json"))


def test_seqpair_names_resolve():
    a = SeqPair.from_json(_load(REF + "/t/io/tinypathnames.json"))
    b = SeqPair.from_json(_load(REF + "/t/io/tinypath.json"))
    assert a.to_json_str() == b.to_json_str()


def test_seqpair_pathonly():
    sp = SeqPair.from_json(_load(REF + "/t/io/tinypathonly.json"))
    golden = open(REF + "/t/expect/tinypathonly.json").read().strip()
    assert sp.to_json_str() == golden


def test_seqpairlist_idempotent():
    text = _load(REF + "/t/io/seqpairlist.json")
    spl = SeqPairList.from_json(text)
    out = spl.to_json_str()
    spl2 = SeqPairList.from_json(json.loads(out))
    assert spl2.to_json_str() == out


# ---- params/constraints round trips ---------------------------------------

def test_params_idempotent():
    p = param_assign_from_json(_load(REF + "/t/io/params.json"))
    out = p.to_json_str()
    p2 = param_assign_from_json(json.loads(out))
    assert p2.to_json_str() == out
    assert out == open(REF + "/t/io/params.json").read().strip()


def test_constraints_idempotent():
    c = Constraints.from_json(_load(REF + "/t/io/constraints.json"))
    out = c.to_json_str()
    c2 = Constraints.from_json(json.loads(out))
    assert c2.to_json_str() == out


# ---- FASTA (ref testfastseq) ----------------------------------------------

def test_fastseq_roundtrip():
    seqs = read_fast_seqs(REF + "/t/tc1/CAA25498.fa")
    out = "".join(s.to_fasta(width=50) for s in seqs)
    golden = open(REF + "/t/expect/CAA25498.fa").read()
    assert out == golden


# ---- DP matrix dumps (ref testforward/testbackward/testcounts) ------------

def _dp_setup():
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    params = param_assign_from_json(_load(REF + "/t/io/params.json"))
    sp = SeqPair.from_json(_load(REF + "/t/io/tiny.json"))
    return EvaluatedMachine(m, params), sp, m


def _matrix_json(mat, ev, sp):
    from machineboss_tpu.utils.jsonfmt import cpp_double
    out = ['{\n \"input\": \"%s\",\n \"output\": \"%s\",\n \"cell\": ['
           % (sp.input.name, sp.output.name)]
    first = True
    for i in range(mat.in_len + 1):
        for o in range(mat.out_len + 1):
            for s in range(mat.n_states):
                v = mat.cell[i, o, s]
                sv = cpp_double(v, 5)
                out.append(("" if first else ",") + "\n  { \"inPos\": %d,"
                           " \"outPos\": %d, \"state\": %s, \"logLike\":"
                           " %s }" % (i, o, ev.state_name_json(s), sv))
                first = False
    out.append("\n ]\n}\n")
    return "".join(out)


def test_forward_matrix_dump():
    ev, sp, m = _dp_setup()
    fwd = ForwardMatrix(ev, sp)
    got = _matrix_json(fwd, ev, sp)
    golden = open(REF + "/t/expect/fwd-bitnoise-params-tiny.json").read()
    assert got == golden


def test_backward_matrix_dump():
    ev, sp, m = _dp_setup()
    back = BackwardMatrix(ev, sp)
    got = _matrix_json(back, ev, sp)
    golden = open(REF + "/t/expect/back-bitnoise-params-tiny.json").read()
    assert got == golden


def test_counts_dump():
    ev, sp, m = _dp_setup()
    counts = MachineCounts(ev, sp)
    golden = open(REF + "/t/expect/fwdback-bitnoise-params-tiny.json").read()
    assert counts.to_json_str() == golden


def test_nan_check_hook(monkeypatch):
    """MB_NAN_CHECK=1 turns host-boundary finiteness checks on
    (ref src/logsumexp.h:15-18 nan_debug analog, utils/debug.py)."""
    import numpy as np
    import pytest
    from machineboss_tpu.utils.debug import check_finite
    arr = np.array([0.0, -np.inf])
    # off by default: silently passes anything
    monkeypatch.delenv("MB_NAN_CHECK", raising=False)
    check_finite("x", np.array([np.nan]))
    monkeypatch.setenv("MB_NAN_CHECK", "1")
    assert check_finite("x", arr) is arr       # -inf = log zero, legal
    with pytest.raises(FloatingPointError):
        check_finite("x", np.array([np.nan]))
    with pytest.raises(FloatingPointError):
        check_finite("x", np.array([np.inf]))
    with pytest.raises(FloatingPointError):
        check_finite("x", arr, allow_neg_inf=False)
