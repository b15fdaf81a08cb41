"""SEMANTIC execution of WGSL: the generated `--wgsl` shader and the
hand-written 2D wavefront shaders must COMPUTE the right numbers, not
just parse (the reference's own bar: GPU-vs-CPU agreement tests,
ref js/webgpu/test/test-gpu-cpu-agreement.mjs, and compiler-vs-
interpreter equivalence, ref src/compiler.h:171-174). No WebGPU runtime
exists here, so the shaders run under tests/wgslvm.py — a WGSL
interpreter with WebGPU's dispatch model — against the host float64
engines and the committed golden values."""

import json
import os

import numpy as np

from conftest import REF

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.core.params import Constraints
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.algo.dp_host import ForwardMatrix, ViterbiMatrix

from wgslvm import Module

WGSL_NEG = np.float32(-3.0e38)


def _setup(machine_file="machine/bitstutter-noise.json"):
    m = Machine.from_file(REF + "/t/" + machine_file)
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    cons = Constraints.from_json(
        json.load(open(REF + "/t/io/pqcons.json")))
    params = cons.default_params().combine(params, overwrite=True)
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float32)
    return m, ev, lm


def _flat_trans(lm):
    lt = np.asarray(lm.log_trans, np.float64)
    out = np.where(lt <= -1e29, WGSL_NEG, lt).astype(np.float32)
    return np.ascontiguousarray(out).reshape(-1)


def _toks(ev, seq, side="in"):
    tk = (ev.input_tokenizer if side == "in" else
          ev.output_tokenizer).tokenize(list(seq))
    return np.array(tk, np.uint32)  # 1-based; shader uses 0 = epsilon


def test_generated_wgsl_forward_computes_golden():
    """`--wgsl` output for bitstutter-noise must COMPUTE the golden
    forward log-likelihood (expect/101-bitstutternoise-fwd-0011.json:
    -9.26 at 2dp) and match the host f64 engine."""
    import tempfile
    from machineboss_tpu.codegen_impl import compile_wgsl

    m, ev, lm = _setup()
    d = tempfile.mkdtemp()
    compile_wgsl(m, d)
    src = open(os.path.join(d, "computeForward.wgsl")).read()
    mod = Module(src)

    xs = _toks(ev, "101", "in")
    ys = _toks(ev, "0011", "out")
    S = ev.n_states()
    lx, ly = len(xs), len(ys)
    cells = np.full((lx + 1) * (ly + 1) * S, WGSL_NEG, np.float32)
    trans = _flat_trans(lm)
    for d_ in range(lx + ly + 1):
        dims = {"lx": lx, "ly": ly, "d": d_, "pad": 0}
        n_wg = (min(lx, d_) // 64) + 1
        mod.dispatch("forwardDiagonal",
                     {0: dims, 1: trans, 2: xs, 3: ys, 4: cells},
                     workgroups=(n_wg, 1, 1))
    got = float(cells[-1])

    sp = SeqPair(NamedSeq("x", list("101")), NamedSeq("y", list("0011")))
    host = ForwardMatrix(ev, sp).log_like()
    assert abs(got - host) < 2e-3, (got, host)

    with open(REF + "/t/expect/101-bitstutternoise-fwd-0011.json") as f:
        golden = json.load(f)[0][0]
    assert abs(round(got, 2) - golden) < 5e-3, (got, golden)


def _run_wavefront2d(lm, ev, x, y, mode):
    src = open(os.path.join(os.path.dirname(__file__), "..", "js",
                            "shaders", "wavefront2d.wgsl")).read()
    mod = Module(src)
    S = ev.n_states()
    Li, Lo = len(x), len(y)
    lt = np.asarray(lm.log_trans, np.float64)
    trans = np.where(lt <= -1e29, WGSL_NEG, lt).astype(np.float32) \
        .reshape(-1)
    closure = np.asarray(
        lm.closure_for("maxplus" if mode == 1 else "logsumexp"),
        np.float64)
    clo = np.where(closure <= -1e29, WGSL_NEG, closure) \
        .astype(np.float32).reshape(-1)
    lat = np.full((Li + 1) * (Lo + 1) * S, WGSL_NEG, np.float32)
    lat[:S] = clo[:S]                      # cell (0,0) = closure row 0
    xs = _toks(ev, x, "in")
    ys = _toks(ev, y, "out")
    for d in range(1, Li + Lo + 1):
        i_lo = max(0, d - Lo)
        i_hi = min(Li, d)
        params = {"s": S, "nIn": lm.n_in, "nOut": lm.n_out,
                  "li": Li, "lo": Lo, "d": d, "iLoBase": i_lo,
                  "mode": mode}
        mod.dispatch("main", {0: params, 1: trans, 2: clo, 3: xs, 4: ys,
                              5: lat}, workgroups=(i_hi - i_lo + 1, 1, 1))
    return lat.reshape(Li + 1, Lo + 1, S)


def test_wavefront2d_shader_forward_matches_host():
    m, ev, lm = _setup()
    x, y = "101", "0011"
    lat = _run_wavefront2d(lm, ev, x, y, mode=0)
    sp = SeqPair(NamedSeq("x", list(x)), NamedSeq("y", list(y)))
    host = ForwardMatrix(ev, sp)
    # final value and a sample of interior cells
    assert abs(float(lat[-1, -1, -1]) - host.log_like()) < 2e-3
    for (i, o) in ((1, 1), (2, 3), (3, 2)):
        for s in range(ev.n_states()):
            h = host.cell[i, o, s]
            g = float(lat[i, o, s])
            if h == -np.inf:
                assert g <= -1e29, (i, o, s, g)
            else:
                assert abs(g - h) < 2e-3, (i, o, s, g, h)


def test_wavefront2d_shader_viterbi_matches_host():
    m, ev, lm = _setup()
    x, y = "101", "0011"
    lat = _run_wavefront2d(lm, ev, x, y, mode=1)
    sp = SeqPair(NamedSeq("x", list(x)), NamedSeq("y", list(y)))
    host = ViterbiMatrix(ev, sp)
    assert abs(float(lat[-1, -1, -1]) - host.log_like()) < 2e-3
    with open(REF + "/t/expect/101-bitstutternoise-vit-0011.json") as f:
        golden = json.load(f)[0][0]
    assert abs(round(float(lat[-1, -1, -1]), 2) - golden) < 5e-3
    for (i, o) in ((1, 1), (2, 2), (3, 4)):
        for s in range(ev.n_states()):
            h = host.cell[i, o, s]
            g = float(lat[i, o, s])
            if h == -np.inf:
                assert g <= -1e29, (i, o, s, g)
            else:
                assert abs(g - h) < 2e-3, (i, o, s, g, h)


# ----------------------------------------------------- 1D GPU pipeline

def _gen_1d():
    """Small random generator (output-only machine) + its lowering."""
    import __graft_entry__ as ge
    m = ge._random_generator(6, "AC", seed=3)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    return m, ev, lm


def _shader(name):
    return open(os.path.join(os.path.dirname(__file__), "..", "js",
                             "shaders", name)).read()


def _clamp32(a):
    a = np.asarray(a, np.float64)
    return np.where(a <= -1e29, WGSL_NEG, a).astype(np.float32)


def _pipeline_1d(lm, toks, mode, revT, start):
    """Mirror js/gpu/dp1d-gpu.mjs run1D/backward1DGPU dispatch-for-
    dispatch under the WGSL interpreter: build (revT optional) -> scan
    -> extract. toks are 1-based output tokens; start is the extract
    start vector. Returns the (L, S) extract output."""
    S = lm.n_states
    L = len(toks)
    closure = lm.closure_for("maxplus" if mode == 1 else "logsumexp")
    trans = _clamp32(lm.log_trans).reshape(-1)
    clo = _clamp32(closure).reshape(-1)

    build = Module(_shader("transferbuild1d.wgsl"))
    mats = np.zeros(L * S * S, np.float32)
    params = {"s": S, "nIn": lm.n_in, "nOut": lm.n_out, "l": L,
              "isInput": 0, "mode": mode, "revT": revT, "pad1": 0}
    build.dispatch("main", {0: params, 1: trans, 2: clo,
                            3: np.asarray(toks, np.uint32), 4: mats},
                   workgroups=(-(-(L * S * S) // 64), 1, 1))

    scan = Module(_shader("prefixscan1d.wgsl"))
    buf_a, buf_b = mats, np.zeros_like(mats)
    stride = 1
    while stride < L:
        scan.dispatch("main", {0: {"s": S, "l": L, "stride": stride,
                                   "mode": mode},
                               1: buf_a, 2: buf_b},
                      workgroups=(-(-(L * S) // 64), 1, 1))
        buf_a, buf_b = buf_b, buf_a
        stride *= 2

    extract = Module(_shader("extract1d.wgsl"))
    out = np.zeros(L * S, np.float32)
    extract.dispatch("main", {0: {"s": S, "l": L, "mode": mode,
                                  "pad0": 0},
                              1: buf_a, 2: _clamp32(start), 3: out},
                     workgroups=(-(-(L * S) // 64), 1, 1))
    return out.reshape(L, S)


def _host_mats_1d(lm, toks, mode):
    """f64 closure-folded per-position transfer matrices."""
    sr = "maxplus" if mode == 1 else "logsumexp"
    trans, _ = lm.emit_matrices_1d(output_side=True, semiring=sr)
    return np.asarray(trans, np.float64)[np.asarray(toks) - 1]


def _semi_matmul(a, b, mode):
    z = a[:, :, None] + b[None, :, :]
    if mode == 1:
        return z.max(axis=1)
    with np.errstate(over="ignore"):
        m = z.max(axis=1)
        msafe = np.where(np.isfinite(m), m, 0.0)
        return np.where(
            np.isfinite(m),
            msafe + np.log(np.exp(z - msafe[:, None, :]).sum(axis=1)), m)


def test_gpu_1d_forward_and_viterbi_pipeline():
    """transferbuild1d -> prefixscan1d -> extract1d executed end-to-end
    (both semiring modes) equals the host f64 transfer-matrix fold —
    the GPU contract behind forward1DGPU and the NEW viterbi1DGPU."""
    m, ev, lm = _gen_1d()
    rng = np.random.RandomState(0)
    L = 5
    toks = rng.randint(1, lm.n_out, L)
    for mode in (0, 1):
        closure = np.asarray(
            lm.closure_for("maxplus" if mode == 1 else "logsumexp"),
            np.float64)
        out = _pipeline_1d(lm, toks, mode, revT=0, start=closure[0])
        mats = _host_mats_1d(lm, toks, mode)
        f = closure[0:1]
        for p in range(L):
            f = _semi_matmul(f, mats[p], mode)
            g = out[p]
            for s in range(lm.n_states):
                if not np.isfinite(f[0, s]) or f[0, s] <= -1e29:
                    assert g[s] <= -1e29, (mode, p, s)
                else:
                    assert abs(g[s] - f[0, s]) < 2e-3, (mode, p, s,
                                                        g[s], f[0, s])


def test_gpu_1d_backward_pipeline():
    """revT build + forward scan + end-vector extract == host f64
    SUFFIX products (the contract behind the NEW backward1DGPU):
    out[L-1-p] = b_p = M_{p+1} .. M_L e_end, and start (x) b_0 equals
    the forward log-likelihood."""
    m, ev, lm = _gen_1d()
    rng = np.random.RandomState(1)
    L = 6
    S = lm.n_states
    toks = rng.randint(1, lm.n_out, L)
    for mode in (0, 1):
        closure = np.asarray(
            lm.closure_for("maxplus" if mode == 1 else "logsumexp"),
            np.float64)
        e_end = np.full(S, -np.inf)
        e_end[S - 1] = 0.0
        out = _pipeline_1d(lm, toks, mode, revT=1, start=e_end)
        mats = _host_mats_1d(lm, toks, mode)
        b = e_end.reshape(S, 1)
        for p in range(L - 1, -1, -1):
            b = _semi_matmul(mats[p], b, mode)
            g = out[L - 1 - p]
            for s in range(S):
                if not np.isfinite(b[s, 0]) or b[s, 0] <= -1e29:
                    assert g[s] <= -1e29, (mode, p, s)
                else:
                    assert abs(g[s] - b[s, 0]) < 2e-3, (mode, p, s,
                                                        g[s], b[s, 0])
        # consistency: start (x) b_0 == forward ll
        z = closure[0] + b[:, 0]
        ll = z.max() if mode == 1 else \
            np.log(np.exp(z - z.max()).sum()) + z.max()
        fmats = _host_mats_1d(lm, toks, mode)
        f = closure[0:1]
        for p in range(L):
            f = _semi_matmul(f, fmats[p], mode)
        assert abs(ll - f[0, S - 1]) < 1e-9


def test_gpu_1d_profile_pipeline_modes():
    """transferbuild1d-profile with mode/revT: profile-marginalized
    matrices equal the host f64 marginalization (contract behind
    forward1DProfileGPU, NEW viterbi1DProfileGPU and
    backward1DProfileGPU)."""
    m, ev, lm = _gen_1d()
    rng = np.random.RandomState(2)
    L = 4
    S = lm.n_states
    n_tok = lm.n_out
    prof = np.log(rng.dirichlet(np.ones(n_tok - 1), L))    # (L, nTok-1)
    profile = np.full((L, n_tok), -np.inf)
    profile[:, 1:] = prof
    build = Module(_shader("transferbuild1d-profile.wgsl"))
    lt64 = np.asarray(lm.log_trans, np.float64)
    for mode in (0, 1):
        closure = np.asarray(
            lm.closure_for("maxplus" if mode == 1 else "logsumexp"),
            np.float64)
        for revT in (0, 1):
            mats = np.zeros(L * S * S, np.float32)
            params = {"s": S, "nIn": lm.n_in, "nOut": lm.n_out, "l": L,
                      "isInput": 0, "mode": mode, "nTok": n_tok,
                      "revT": revT}
            build.dispatch(
                "main",
                {0: params, 1: _clamp32(lt64).reshape(-1),
                 2: _clamp32(closure).reshape(-1),
                 3: _clamp32(profile).reshape(-1), 4: mats},
                workgroups=(-(-(L * S * S) // 64), 1, 1))
            got = mats.reshape(L, S, S)
            # host f64: marginalize emission over profile, fold closure
            for p in range(L):
                p_src = L - 1 - p if revT else p
                step = lt64[0, 1:]                   # (nTok-1, S, S)
                z = profile[p_src, 1:][:, None, None] + step
                if mode == 1:
                    e = z.max(axis=0)
                else:
                    mz = z.max(axis=0)
                    e = np.where(np.isfinite(mz),
                                 np.where(np.isfinite(mz), mz, 0.0)
                                 + np.log(np.exp(
                                     z - np.where(np.isfinite(mz), mz,
                                                  0.0)).sum(axis=0)), mz)
                mref = _semi_matmul(e, closure, mode)
                if revT:
                    mref = mref.T
                for s in range(S):
                    for d2 in range(S):
                        h = mref[s, d2]
                        g = float(got[p, s, d2])
                        if not np.isfinite(h) or h <= -1e29:
                            assert g <= -1e29, (mode, revT, p, s, d2)
                        else:
                            assert abs(g - h) < 2e-3, (mode, revT, p, s,
                                                       d2, g, h)


def test_gpu_module_matrix_complete():
    """Module-for-module coverage of the reference's js/webgpu/gpu 1D
    surface: the new exports exist in js/gpu/dp1d-gpu.mjs."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "js", "gpu",
                            "dp1d-gpu.mjs")).read()
    for fn in ("forward1DGPU", "viterbi1DGPU", "backward1DGPU",
               "forward1DProfileGPU", "viterbi1DProfileGPU",
               "backward1DProfileGPU"):
        assert ("export async function %s" % fn) in src, fn


# ------------------------------------------- 2D backward + posteriors

def _run_wavefront2d_backward(lm, ev, x, y, mode):
    src = open(os.path.join(os.path.dirname(__file__), "..", "js",
                            "shaders", "wavefront2d-backward.wgsl")).read()
    mod = Module(src)
    S = ev.n_states()
    Li, Lo = len(x), len(y)
    trans = _clamp32(lm.log_trans).reshape(-1)
    clo = _clamp32(lm.closure_for(
        "maxplus" if mode == 1 else "logsumexp")).reshape(-1)
    lat = np.full((Li + 1) * (Lo + 1) * S, WGSL_NEG, np.float32)
    xs = _toks(ev, x, "in")
    ys = _toks(ev, y, "out")
    for d in range(Li + Lo, -1, -1):
        i_lo = max(0, d - Lo)
        i_hi = min(Li, d)
        params = {"s": S, "nIn": lm.n_in, "nOut": lm.n_out,
                  "li": Li, "lo": Lo, "d": d, "iLoBase": i_lo,
                  "mode": mode}
        mod.dispatch("main", {0: params, 1: trans, 2: clo, 3: xs, 4: ys,
                              5: lat}, workgroups=(i_hi - i_lo + 1, 1, 1))
    return lat.reshape(Li + 1, Lo + 1, S)


def test_wavefront2d_backward_shader_matches_host():
    """The backward wavefront shader EXECUTES to the host f64
    BackwardMatrix values, and its cell (0,0,0) equals the forward
    log-likelihood (the GPU module's backward2DGPU contract)."""
    from machineboss_tpu.algo.dp_host import BackwardMatrix
    m, ev, lm = _setup()
    x, y = "101", "0011"
    lat = _run_wavefront2d_backward(lm, ev, x, y, mode=0)
    sp = SeqPair(NamedSeq("x", list(x)), NamedSeq("y", list(y)))
    host = BackwardMatrix(ev, sp)
    assert abs(float(lat[0, 0, 0]) - host.log_like()) < 2e-3
    fwd_ll = ForwardMatrix(ev, sp).log_like()
    assert abs(float(lat[0, 0, 0]) - fwd_ll) < 2e-3
    for (i, o) in ((1, 1), (2, 2), (3, 3)):
        for s in range(ev.n_states()):
            h = host.cell[i, o, s]
            g = float(lat[i, o, s])
            if h == -np.inf or h <= -1e29:
                assert g <= -1e29, (i, o, s, g)
            else:
                assert abs(g - h) < 2e-3, (i, o, s, g, h)


def test_posteriors2d_shader_matches_host():
    """Forward fill + backward fill + the elementwise posteriors shader
    == host f64 visiting-state posteriors (fwd post-closure x bwd
    leading-closure split — each path counted once per visit)."""
    m, ev, lm = _setup()
    x, y = "101", "0011"
    S = ev.n_states()
    fwd = _run_wavefront2d(lm, ev, x, y, mode=0).reshape(-1)
    bwd = _run_wavefront2d_backward(lm, ev, x, y, mode=0).reshape(-1)
    n = fwd.size
    ll = float(fwd[-1])
    src = open(os.path.join(os.path.dirname(__file__), "..", "js",
                            "shaders", "posteriors2d.wgsl")).read()
    mod = Module(src)
    post = np.zeros(n, np.float32)
    mod.dispatch("main", {0: {"n": n, "logLike": np.float32(ll),
                              "pad0": 0, "pad1": 0},
                          1: fwd, 2: bwd, 3: post},
                 workgroups=(-(-n // 64), 1, 1))
    # host posteriors: fwd_host + bwd_host - ll, exp'd
    from machineboss_tpu.algo.dp_host import BackwardMatrix
    sp = SeqPair(NamedSeq("x", list(x)), NamedSeq("y", list(y)))
    hf = ForwardMatrix(ev, sp)
    hb = BackwardMatrix(ev, sp)
    ll_h = hf.log_like()
    post = post.reshape(len(x) + 1, len(y) + 1, S)
    for i in range(len(x) + 1):
        for o in range(len(y) + 1):
            for s in range(S):
                hp = hf.cell[i, o, s] + hb.cell[i, o, s] - ll_h
                want = np.exp(hp) if np.isfinite(hp) else 0.0
                assert abs(float(post[i, o, s]) - want) < 2e-3, \
                    (i, o, s, float(post[i, o, s]), want)
