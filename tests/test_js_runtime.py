"""Execute the js/ runtime package against the Python host engines.

The js/ package is the browser/Node runtime (SURVEY.md §2.4, layer 14
"WebGPU/JS package"). There is no JS engine in this environment, so the
modules run under the mini ES interpreter
(machineboss_tpu/utils/jsvm.py) — real semantic execution of the
package's CPU path, mirroring the reference's own JS CI
(ref Makefile:746-766, js/webgpu/test/*.mjs):

- 2D forward/backward/viterbi/posteriors vs host float64 DP matrices
- viterbi path validity (step weights re-sum to the score)
- 1D + profile variants vs host DP / PSWM engines
- fused Plan7 vs an explicit compose(profile, transducer) + host DP
  oracle (core local/global and plan7 single/multi-hit modes)
- GPU modules parse and degrade gracefully when WebGPU is absent
"""

import json
import math
import os

import numpy as np
import pytest

from conftest import REF

import jsvm
from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix, BackwardMatrix, \
    ViterbiMatrix

JS_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "js")

TOL = 1e-9


@pytest.fixture(scope="module")
def api():
    exports, interp = jsvm.load_module(os.path.join(JS_ROOT,
                                                    "machineboss.mjs"))
    return exports, interp


def make_mb(api, machine_json, params=None, options=None):
    exports, interp = api
    cls = exports["MachineBoss"]
    create = interp.get_member(cls, "create")
    return interp.call(create, [jsvm.python_to_js(machine_json),
                                jsvm.python_to_js(params or {}),
                                jsvm.python_to_js(options or {})])


def call_method(api, obj, name, *args):
    _, interp = api
    fn = interp.get_member(obj, name)
    return interp.call(fn, list(args), obj)


def _bitnoise():
    with open(REF + "/t/machine/bitnoise.json") as f:
        mj = json.load(f)
    with open(REF + "/t/io/params.json") as f:
        pj = json.load(f)
    return mj, pj


def _host_setup(machine_json, params_json):
    m = Machine.from_json(machine_json)
    ev = EvaluatedMachine(m, param_assign_from_json(params_json))
    return m, ev


def test_js_forward_backward_2d_match_host(api):
    mj, pj = _bitnoise()
    m, ev = _host_setup(mj, pj)
    mb = make_mb(api, mj, pj)
    rng = np.random.RandomState(0)
    for _ in range(4):
        li, lo = rng.randint(1, 6), rng.randint(1, 6)
        xs = "".join("01"[t] for t in rng.randint(0, 2, li))
        ys = "".join("01"[t] for t in rng.randint(0, 2, lo))
        x = call_method(api, mb, "tokenize", xs, "input")
        y = call_method(api, mb, "tokenize", ys, "output")
        ll_js = call_method(api, mb, "forward", x, y)
        bw_js = call_method(api, mb, "backward", x, y)
        sp = SeqPair(NamedSeq("x", list(xs)), NamedSeq("y", list(ys)))
        ll_host = ForwardMatrix(ev, sp).log_like()
        if math.isinf(ll_host):
            assert ll_js == -math.inf
        else:
            assert abs(ll_js - ll_host) < TOL, (xs, ys)
            assert abs(bw_js - ll_host) < TOL, (xs, ys)


def test_js_viterbi_2d_score_and_path(api):
    mj, pj = _bitnoise()
    m, ev = _host_setup(mj, pj)
    mb = make_mb(api, mj, pj)
    machine = jsvm.js_to_python(
        api[1].get_member(mb, "_machine"))
    log_trans = machine["logTrans"]
    n_out = int(machine["nOutputTokens"])
    S = int(machine["nStates"])
    rng = np.random.RandomState(1)
    for _ in range(4):
        li, lo = rng.randint(1, 6), rng.randint(1, 6)
        xs = "".join("01"[t] for t in rng.randint(0, 2, li))
        ys = "".join("01"[t] for t in rng.randint(0, 2, lo))
        x = call_method(api, mb, "tokenize", xs, "input")
        y = call_method(api, mb, "tokenize", ys, "output")
        res = jsvm.js_to_python(call_method(api, mb, "viterbi", x, y))
        sp = SeqPair(NamedSeq("x", list(xs)), NamedSeq("y", list(ys)))
        host = ViterbiMatrix(ev, sp).log_like()
        if math.isinf(host):
            assert res["score"] == -math.inf
            continue
        assert abs(res["score"] - host) < TOL, (xs, ys)
        # the path's step weights must re-sum to the score, consume
        # exactly (xs, ys), start at state 0 and end at state S-1
        total = 0.0
        xi = yi = 0
        cur = 0
        for step in res["path"]:
            assert int(step["from"]) == cur
            it, ot = int(step["inTok"]), int(step["outTok"])
            if it:
                assert x[xi] == it
                xi += 1
            if ot:
                assert y[yi] == ot
                yi += 1
            idx = ((it * n_out + ot) * S + int(step["from"])) * S \
                + int(step["to"])
            total += log_trans[idx]
            cur = int(step["to"])
        assert xi == li and yi == lo
        assert cur == S - 1
        assert abs(total - res["score"]) < 1e-6


def test_js_posteriors_2d(api):
    mj, pj = _bitnoise()
    m, ev = _host_setup(mj, pj)
    mb = make_mb(api, mj, pj)
    x = call_method(api, mb, "tokenize", "1011", "input")
    y = call_method(api, mb, "tokenize", "1001", "output")
    res = jsvm.js_to_python(call_method(api, mb, "posteriors", x, y))
    sp = SeqPair(NamedSeq("x", list("1011")), NamedSeq("y", list("1001")))
    fwd = ForwardMatrix(ev, sp)
    ll = fwd.log_like()
    assert abs(res["logLikelihood"] - ll) < TOL
    post = np.array(res["posteriors"])
    assert np.all(post >= -1e-12) and np.all(post <= 1 + 1e-9)
    # host cross-check: posterior = exp(f + b - ll) per (cell, state)
    bwd = BackwardMatrix(ev, sp)
    S = ev.n_states()
    pj_arr = post.reshape(5, 5, S)
    for i in range(5):
        for o in range(5):
            for s in range(S):
                f = fwd.get(i, o, s)
                b = bwd.get(i, o, s)
                expect = 0.0 if (f == -np.inf or b == -np.inf) else \
                    math.exp(f + b - ll)
                assert abs(pj_arr[i, o, s] - expect) < 1e-9


def _generator_json():
    """Tiny generator (output-only) machine with a silent branch."""
    return {
        "state": [
            {"id": "s0", "trans": [
                {"out": "A", "to": "s1", "weight": 0.4},
                {"out": "B", "to": "s1", "weight": 0.3},
                {"to": "s1", "weight": 0.3},
            ]},
            {"id": "s1", "trans": [
                {"out": "A", "to": "s1", "weight": 0.2},
                {"out": "B", "to": "s2", "weight": 0.5},
                {"to": "s2", "weight": 0.3},
            ]},
            {"id": "s2", "trans": []},
        ],
    }


def test_js_forward_1d_matches_host(api):
    mj = _generator_json()
    m = Machine.from_json(mj)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    mb = make_mb(api, mj)
    for ys in ("AB", "BAB", "A", "", "ABAB"):
        y = call_method(api, mb, "tokenize", ys, "output")
        ll_js = call_method(api, mb, "forward", None, y)
        sp = SeqPair(NamedSeq("x", []), NamedSeq("y", list(ys)))
        host = ForwardMatrix(ev, sp).log_like()
        if math.isinf(host):
            assert ll_js == -math.inf
        else:
            assert abs(ll_js - host) < TOL, ys
        vres = jsvm.js_to_python(call_method(api, mb, "viterbi", None, y))
        vhost = ViterbiMatrix(ev, sp).log_like()
        if math.isinf(vhost):
            assert vres["score"] == -math.inf
        else:
            assert abs(vres["score"] - vhost) < TOL, ys
        bw = call_method(api, mb, "backward", None, y)
        if not math.isinf(host):
            assert abs(bw - host) < TOL
        post = jsvm.js_to_python(call_method(api, mb, "posteriors",
                                             None, y))
        if not math.isinf(host):
            assert abs(post["logLikelihood"] - host) < TOL


def test_js_profile_one_hot_equals_tokens(api):
    mj = _generator_json()
    mb = make_mb(api, mj)
    ys = "AAB"
    y = call_method(api, mb, "tokenize", ys, "output")
    ll_tok = call_method(api, mb, "forward", None, y)
    n_alpha = call_method(api, mb, "nAlpha", "output")
    assert n_alpha == 2
    prof = []
    for c in ys:
        for k, sym in enumerate("AB"):
            prof.append(0.0 if sym == c else -math.inf)
    ll_prof = call_method(api, mb, "forwardProfile",
                          jsvm.python_to_js(prof), "output")
    assert abs(ll_tok - ll_prof) < TOL
    v_prof = call_method(api, mb, "viterbiProfile",
                         jsvm.python_to_js(prof), "output")
    v_tok = jsvm.js_to_python(call_method(api, mb, "viterbi", None, y))
    assert abs(v_prof - v_tok["score"]) < TOL
    post = jsvm.js_to_python(call_method(api, mb, "posteriorsProfile",
                                         jsvm.python_to_js(prof),
                                         "output"))
    assert abs(post["logLikelihood"] - ll_tok) < TOL


def test_js_backend_detection_and_errors(api):
    mj = _generator_json()
    mb = make_mb(api, mj)
    assert api[1].get_member(mb, "backend") == "cpu"
    with pytest.raises(jsvm.JSThrow, match="WebGPU is not available"):
        make_mb(api, mj, None, {"backend": "webgpu"})
    with pytest.raises(jsvm.JSThrow, match="Unknown symbol"):
        call_method(api, mb, "tokenize", "AZ", "output")
    with pytest.raises(jsvm.JSThrow, match="not defined"):
        make_mb(api, {"state": [
            {"id": "a", "trans": [{"out": "x", "to": "b",
                                   "weight": "mystery"}]},
            {"id": "b", "trans": []}]})


TOY_HMM = """HMMER3/f [3.1b2 | February 2015]
NAME  toy
LENG  3
ALPH  DNA
HMM          A        C        G        T
            m->m     m->i     m->d     i->m     i->i     d->m     d->d
  COMPO   1.38629  1.38629  1.38629  1.38629
          1.38629  1.38629  1.38629  1.38629
          0.10536  2.99573  3.50656  0.61315  0.77319  0.00000        *
      1   0.22314  2.30259  2.99573  2.99573      1 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.10536  2.99573  3.50656  0.61315  0.77319  0.33647  1.26795
      2   2.99573  0.22314  2.30259  2.99573      2 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.10536  2.99573  3.50656  0.61315  0.77319  0.33647  1.26795
      3   2.99573  2.99573  0.22314  2.30259      3 - - - -
          1.38629  1.38629  1.38629  1.38629
          0.10536  2.99573  3.50656  0.61315  0.77319  0.33647  1.26795
//
"""


def _noisy_dna_transducer():
    trans0 = []
    for a in "ACGT":
        for b in "ACGT":
            trans0.append({"in": a, "out": b, "to": "loop",
                           "weight": 0.2 if a == b else 0.01})
        trans0.append({"in": a, "to": "loop", "weight": 0.02})
    trans0.append({"out": "A", "to": "loop", "weight": 0.01})
    trans0.append({"to": "end", "weight": 0.2})
    return {"state": [{"id": "loop", "trans": trans0},
                      {"id": "end", "trans": []}]}


def _fused_oracle(hmm_text, td_json, mode, local, multihit, out_syms,
                  length=400.0):
    """Explicit compose(profile, transducer) + host 1D Forward oracle.

    NOTE: compose() eliminates silent transitions by SUMMING parallel
    silent paths (ref src/machine.cpp:1611), which preserves Forward but
    not path-level Viterbi — so Viterbi parity uses _raw_joint_viterbi
    instead."""
    from machineboss_tpu.core.hmmer import HmmerModel
    hm = HmmerModel()
    hm.read(hmm_text)
    gen = hm.machine(local) if mode == "core" else \
        hm.plan7_machine(multihit=multihit, length=length)
    td = Machine.from_json(td_json)
    comp = Machine.compose(gen, td)
    ev = EvaluatedMachine(comp, comp.get_param_defs(True))
    sp = SeqPair(NamedSeq("x", []), NamedSeq("y", list(out_syms)))
    return (ForwardMatrix(ev, sp).log_like(),
            ViterbiMatrix(ev, sp).log_like())


def _raw_joint_viterbi(hmm_text, td_json, mode, local, multihit, out_syms,
                       length=400.0):
    """Exact path-level Viterbi over the RAW (un-eliminated) joint state
    space (generator state x transducer state), by Bellman-Ford
    relaxation per output row — max-plus is idempotent, so revisiting a
    path does not change the result. Independent of the fused
    recurrence's chain structure."""
    from machineboss_tpu.core.hmmer import HmmerModel
    hm = HmmerModel()
    hm.read(hmm_text)
    gen = hm.machine(local) if mode == "core" else \
        hm.plan7_machine(multihit=multihit, length=length)
    td = Machine.from_json(td_json)

    # direct edge walk (EvaluatedMachine would reject the plan7 flank
    # loops as non-toposorted; the raw oracle does not need sorting)
    from machineboss_tpu.core import weight as W

    def edges_of(machine):
        """dict (inTok, outTok) -> [(src, dst, logw)]; 1-based tokens."""
        in_tok = {s: i + 1 for i, s in
                  enumerate(sorted(machine.input_alphabet()))}
        out_tok = {s: i + 1 for i, s in
                   enumerate(sorted(machine.output_alphabet()))}
        out = {}
        defs = machine.get_param_defs(True)
        for src, st in enumerate(machine.states):
            for tr in st.trans:
                w = W.evaluate(tr.weight, defs)
                if w <= 0:
                    continue
                key = (in_tok.get(tr.in_, 0) if tr.in_ else 0,
                       out_tok.get(tr.out, 0) if tr.out else 0)
                out.setdefault(key, []).append((src, int(tr.dest),
                                                math.log(w)))
        return out, in_tok, out_tok

    g_edges, _, g_out_tok = edges_of(gen)
    t_edges, t_in_tok, t_out_tok = edges_of(td)
    Sg, St = gen.n_states(), td.n_states()
    # gen output token -> td input token (by symbol)
    g2t = {gt: t_in_tok[sym] for sym, gt in g_out_tok.items()}
    y_toks = [t_out_tok[s] for s in out_syms]

    NEG = -np.inf

    def edge_list(d, key):
        return d.get(key, [])

    def relax_within(cell):
        changed = True
        while changed:
            changed = False
            # gen silent moves
            for gs, gd, w in edge_list(g_edges, (0, 0)):
                upd = cell[gs] + w
                better = upd > cell[gd] + 1e-12
                if better.any():
                    cell[gd] = np.maximum(cell[gd], upd)
                    changed = True
            # td silent moves
            for ts, td_, w in edge_list(t_edges, (0, 0)):
                upd = cell[:, ts] + w
                if (upd > cell[:, td_] + 1e-12).any():
                    cell[:, td_] = np.maximum(cell[:, td_], upd)
                    changed = True
            # gen emits a, td absorbs silently
            for gt, tt in g2t.items():
                for gs, gd, wg in edge_list(g_edges, (0, gt)):
                    for ts, td_, wt in edge_list(t_edges, (tt, 0)):
                        upd = cell[gs, ts] + wg + wt
                        if upd > cell[gd, td_] + 1e-12:
                            cell[gd, td_] = upd
                            changed = True
        return cell

    cell = np.full((Sg, St), NEG)
    cell[0, 0] = 0.0
    cell = relax_within(cell)
    for y in y_toks:
        nxt = np.full((Sg, St), NEG)
        # td out-only
        for ts, td_, w in edge_list(t_edges, (0, y)):
            nxt[:, td_] = np.maximum(nxt[:, td_], cell[:, ts] + w)
        # gen emits a, td consumes a and emits y
        for gt, tt in g2t.items():
            for gs, gd, wg in edge_list(g_edges, (0, gt)):
                for ts, td_, wt in edge_list(t_edges, (tt, y)):
                    nxt[gd, td_] = max(nxt[gd, td_],
                                       cell[gs, ts] + wg + wt)
        cell = relax_within(nxt)
    return float(cell[Sg - 1, St - 1])


@pytest.mark.parametrize("mode,local,multihit", [
    ("core", True, False),
    ("core", False, False),
    ("plan7", True, False),
    ("plan7", True, True),
])
def test_js_fused_plan7_matches_composed_host(api, mode, local, multihit):
    exports, interp = api
    td_json = _noisy_dna_transducer()
    cls = exports["MachineBoss"]
    create = interp.get_member(cls, "createFusedPlan7")
    opts = {"mode": mode, "local": local, "multihit": multihit,
            "length": 10.0, "backend": "cpu"}
    mb = interp.call(create, [TOY_HMM, jsvm.python_to_js(td_json),
                              jsvm.python_to_js({}),
                              jsvm.python_to_js(opts)])
    for read in ("ACG", "AG", "ACCG"):
        y = call_method(api, mb, "tokenize", read, "output")
        ll_js = call_method(api, mb, "fusedForward", y)
        v_js = call_method(api, mb, "fusedViterbi", y)
        ll_ref, v_upper = _fused_oracle(TOY_HMM, td_json, mode, local,
                                        multihit, read, length=10.0)
        v_ref = _raw_joint_viterbi(TOY_HMM, td_json, mode, local,
                                   multihit, read, length=10.0)
        # the Forward oracle's host fill uses the table-interpolated
        # logsumexp (1e-4 precision contract); multihit adds the nHit
        # fixed-point truncation on the JS side
        tol = 5e-3 if multihit else 1e-3
        assert abs(ll_js - ll_ref) < tol, (mode, local, multihit, read,
                                           ll_js, ll_ref)
        assert abs(v_js - v_ref) < 1e-6, (mode, local, multihit, read,
                                          v_js, v_ref)
        # composed-machine Viterbi (silent paths SUMMED) upper-bounds
        # the path-level score
        assert v_js <= v_upper + 1e-6
        assert v_js <= ll_js + 1e-9


def test_js_gpu_modules_parse_and_shaders_are_structural(api):
    """GPU dispatch modules must load (parse) even with no WebGPU, and
    the runtime shaders keep the reference wavefront interface: uniform
    params, storage buffers, compute entry, log-sum-exp."""
    entry_shaders = ("wavefront2d.wgsl", "wavefront2d-backward.wgsl",
                     "prefixscan1d.wgsl", "posteriors2d.wgsl",
                     "transferbuild1d.wgsl", "transferbuild1d-profile.wgsl",
                     "extract1d.wgsl", "fusedplan7-single.wgsl",
                     "fusedplan7-batch.wgsl")
    for shader in entry_shaders:
        with open(os.path.join(JS_ROOT, "shaders", shader)) as f:
            src = f.read()
        assert "@compute" in src, shader
        assert "workgroup_size" in src, shader
    for shader in ("wavefront2d.wgsl", "wavefront2d-backward.wgsl",
                   "prefixscan1d.wgsl", "posteriors2d.wgsl",
                   "transferbuild1d.wgsl", "transferbuild1d-profile.wgsl",
                   "extract1d.wgsl"):
        with open(os.path.join(JS_ROOT, "shaders", shader)) as f:
            src = f.read()
        assert "var<uniform>" in src, shader
        assert "var<storage" in src, shader
    for shader in ("wavefront2d.wgsl", "wavefront2d-backward.wgsl"):
        with open(os.path.join(JS_ROOT, "shaders", shader)) as f:
            wf = f.read()
        assert "fn lse(" in wf and "workgroupBarrier" in wf, shader
    # library blocks (prepended by gpu modules, no entry point of their own)
    with open(os.path.join(JS_ROOT, "shaders", "logmath.wgsl")) as f:
        lm = f.read()
    assert "fn lse(" in lm and "@compute" not in lm
    with open(os.path.join(JS_ROOT, "shaders",
                           "fusedplan7-common.wgsl")) as f:
        fc = f.read()
    # the common core carries the full fused contract: bindings, the row
    # solver, the advance, and the per-read driver
    for needle in ("var<uniform> P : FusedParams", "fn solveRow",
                   "fn advanceRow", "fn runRead", "binding(6)"):
        assert needle in fc, needle
    assert "@compute" not in fc
    # every entry pairs with the common block (module concatenation)
    for shader in ("fusedplan7-single.wgsl", "fusedplan7-batch.wgsl"):
        with open(os.path.join(JS_ROOT, "shaders", shader)) as f:
            src = f.read()
        assert "runRead(" in src, shader


def test_js_silent_cycles_and_composition(api):
    """Machines with silent CYCLES (geometric closure) and a live
    composition (which introduces silent transitions): JS forward/
    backward/viterbi must match the host engines, whose silent-cycle
    sums are the (I-N)^-1 reference semantics."""
    cyc = {"state": [
        {"id": "a", "trans": [
            {"out": "X", "to": "b", "weight": 0.5},
            {"to": "b", "weight": 0.2}]},
        {"id": "b", "trans": [
            {"to": "a", "weight": 0.4},          # silent cycle a->b->a
            {"out": "Y", "to": "c", "weight": 0.3},
            {"to": "c", "weight": 0.3}]},
        {"id": "c", "trans": []}]}
    m = Machine.from_json(cyc)
    # host eval needs an advancing machine; eliminate cycles by summing
    me = m.eliminate_silent_transitions()
    ev = EvaluatedMachine(me, me.get_param_defs(True))
    mb = make_mb(api, cyc)
    for ys in ("XY", "Y", "XXY", ""):
        y = call_method(api, mb, "tokenize", ys, "output")
        ll_js = call_method(api, mb, "forward", None, y)
        sp = SeqPair(NamedSeq("x", []), NamedSeq("y", list(ys)))
        host = ForwardMatrix(ev, sp).log_like()
        if math.isinf(host):
            assert ll_js == -math.inf, ys
        else:
            assert abs(ll_js - host) < 1e-6, (ys, ll_js, host)
        bw = call_method(api, mb, "backward", None, y)
        if not math.isinf(host):
            assert abs(bw - host) < 1e-6, ys

    # composition: bitstutter . bitnoise has silent transitions and all
    # three 2D transition classes
    with open(REF + "/t/machine/bitstutter.json") as f:
        a = Machine.from_json(json.load(f))
    with open(REF + "/t/machine/bitnoise.json") as f:
        b = Machine.from_json(json.load(f))
    comp = Machine.compose(a, b)
    with open(REF + "/t/io/params.json") as f:
        pj = json.load(f)
    ev2 = EvaluatedMachine(comp, param_assign_from_json(pj))
    mb2 = make_mb(api, json.loads(comp.to_json_str()), pj)
    rng = np.random.RandomState(5)
    for _ in range(3):
        li, lo = rng.randint(1, 6), rng.randint(1, 7)
        xs = "".join("01"[t] for t in rng.randint(0, 2, li))
        ys = "".join("01"[t] for t in rng.randint(0, 2, lo))
        x = call_method(api, mb2, "tokenize", xs, "input")
        y = call_method(api, mb2, "tokenize", ys, "output")
        ll_js = call_method(api, mb2, "forward", x, y)
        sp = SeqPair(NamedSeq("x", list(xs)), NamedSeq("y", list(ys)))
        host = ForwardMatrix(ev2, sp).log_like()
        if math.isinf(host):
            assert ll_js == -math.inf, (xs, ys)
        else:
            assert abs(ll_js - host) < 1e-6, (xs, ys)
        vres = jsvm.js_to_python(call_method(api, mb2, "viterbi", x, y))
        vhost = ViterbiMatrix(ev2, sp).log_like()
        if math.isinf(vhost):
            assert vres["score"] == -math.inf
        else:
            assert abs(vres["score"] - vhost) < 1e-6, (xs, ys)


def test_js_fused_plan7_gpu_shader_executes(api):
    """The fused Plan7 GPU shader chain (logmath.wgsl +
    fusedplan7-common.wgsl + batch/single entries) EXECUTES under the
    WGSL interpreter (tests/wgslvm.py): packFusedTensors — run through
    the JS interpreter, exactly what gpu/fusedplan7-gpu.mjs uploads —
    feeds the shader, and the per-read outputs equal the CPU runtime's
    fusedForward/fusedViterbi. Closes the last 'GPU-side never
    executed' gap: every shader family now computes verified numbers."""
    import numpy as np
    from wgslvm import Module as WgslModule

    exports, interp = api
    td_json = _noisy_dna_transducer()
    cls = exports["MachineBoss"]
    create = interp.get_member(cls, "createFusedPlan7")
    pf_exports = interp.load_module(
        os.path.join(JS_ROOT, "cpu", "fusedplan7.mjs"))
    pack = pf_exports["packFusedTensors"]

    shader_dir = os.path.join(JS_ROOT, "shaders")

    def chain(entry):
        parts = []
        for name in ("logmath.wgsl", "fusedplan7-common.wgsl",
                     "fusedplan7-%s.wgsl" % entry):
            with open(os.path.join(shader_dir, name)) as f:
                parts.append(f.read())
        return WgslModule("\n".join(parts))

    reads = ["ACG", "AG", "ACCG"]
    for mode, local, multihit, sr in (("plan7", True, True, "logsumexp"),
                                      ("core", True, False, "logsumexp"),
                                      ("plan7", True, False, "maxplus")):
        opts = {"mode": mode, "local": local, "multihit": multihit,
                "length": 10.0, "backend": "cpu"}
        mb = interp.call(create, [TOY_HMM, jsvm.python_to_js(td_json),
                                  jsvm.python_to_js({}),
                                  jsvm.python_to_js(opts)])
        fused = interp.get_member(mb, "_fusedPlan7")
        packed = interp.call(pack, [fused, sr])
        tens = np.asarray(jsvm.js_to_python(
            interp.get_member(packed, "tens")), np.float32)
        scal = np.asarray(jsvm.js_to_python(
            interp.get_member(packed, "scal")), np.float32)
        machine = interp.get_member(fused, "machine")
        St = int(jsvm.js_to_python(interp.get_member(machine, "nStates")))
        n_out = int(jsvm.js_to_python(
            interp.get_member(machine, "nOutputTokens")))
        hmm_obj = interp.get_member(fused, "hmm")
        K = len(jsvm.js_to_python(interp.get_member(hmm_obj, "node")))
        n_hit = int(jsvm.js_to_python(interp.get_member(fused, "nHit")))

        tok_lists = [jsvm.js_to_python(
            call_method(api, mb, "tokenize", r, "output")) for r in reads]
        max_len = max(len(t) for t in tok_lists)
        n_reads = len(reads)
        toks = np.zeros(n_reads * max_len, np.uint32)
        lens = np.zeros(n_reads, np.uint32)
        for r, tl in enumerate(tok_lists):
            lens[r] = len(tl)
            toks[r * max_len:r * max_len + len(tl)] = tl
        n_base = 5 * K + 12
        n_row = 5 * K + 17
        wpr = (2 * n_base + n_row + 2) * St
        flags = ((1 if mode == "plan7" else 0)
                 | (2 if local else 0) | (4 if multihit else 0)
                 | (8 if sr == "maxplus" else 0))
        params = {"st": St, "k": K, "nOut": n_out, "flags": flags,
                  "nHit": n_hit, "maxLen": max_len, "nReads": n_reads,
                  "workPerRead": wpr}

        work = np.zeros(n_reads * wpr, np.float32)
        out = np.zeros(n_reads, np.float32)
        chain("batch").dispatch(
            "main", {0: params, 1: tens, 2: scal, 3: toks, 4: lens,
                     5: work, 6: out},
            workgroups=(-(-n_reads // 64), 1, 1))

        meth = "fusedViterbi" if sr == "maxplus" else "fusedForward"
        for r, tl in enumerate(tok_lists):
            want = float(jsvm.js_to_python(call_method(
                api, mb, meth, jsvm.python_to_js(tl))))
            assert abs(float(out[r]) - want) < 2e-3, \
                (mode, multihit, sr, reads[r], float(out[r]), want)

        # single-read entry: one workgroup, read 0 only
        work1 = np.zeros(n_reads * wpr, np.float32)
        out1 = np.full(n_reads, -3.0e38, np.float32)
        chain("single").dispatch(
            "main", {0: params, 1: tens, 2: scal, 3: toks, 4: lens,
                     5: work1, 6: out1}, workgroups=(1, 1, 1))
        assert abs(float(out1[0]) - float(out[0])) < 1e-5
