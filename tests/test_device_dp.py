"""Device (JAX) DP engines vs the exact host oracle.

Mirrors the reference's cross-backend agreement discipline
(ref: python/machineboss/jax/test strategy, API.md): every device variant
must agree with the interpreter within 0.01 nats.
"""

import numpy as np
import pytest

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix, ViterbiMatrix, \
    BackwardMatrix
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops import dp1d, dp2d
from machineboss_tpu.ops.semiring import LOGSUMEXP, MAXPLUS

import json

TOL = 1e-2


def _load(path):
    with open(path) as f:
        return json.load(f)


def bitnoise():
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    params = param_assign_from_json(_load(REF + "/t/io/params.json"))
    return m, params


def stutter_noise():
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    params = param_assign_from_json(_load(REF + "/t/io/params.json"))
    return m, params


def _sp(in_seq, out_seq):
    return SeqPair(NamedSeq("in", list(in_seq)), NamedSeq("out", list(out_seq)))


CASES_2D = [
    ("101", "001"), ("101", "0011"), ("", ""), ("1101", "1"),
    ("10101110", "01101011"),
]


@pytest.mark.parametrize("in_seq,out_seq", CASES_2D)
@pytest.mark.parametrize("mfn", [bitnoise, stutter_noise])
@pytest.mark.parametrize("assoc", [False, True])
def test_forward_2d(mfn, in_seq, out_seq, assoc):
    m, params = mfn()
    ev = EvaluatedMachine(m, params)
    host = ForwardMatrix(ev, _sp(in_seq, out_seq)).log_like()
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = lm.matrices_2d()
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in in_seq],
                        dtype=jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in out_seq],
                         dtype=jnp.int32)
    dev = dp2d.forward_2d(jnp.array(a_diag), jnp.array(a_left),
                          jnp.array(a_up), jnp.array(closure),
                          in_toks, out_toks, len(in_seq), len(out_seq),
                          sr=LOGSUMEXP, assoc=assoc)
    dev = float(dev)
    if host == -np.inf:
        assert dev < -1e20
    else:
        assert abs(dev - host) < TOL, (host, dev)


@pytest.mark.parametrize("in_seq,out_seq", CASES_2D)
@pytest.mark.parametrize("mfn", [bitnoise, stutter_noise])
def test_viterbi_2d(mfn, in_seq, out_seq):
    m, params = mfn()
    ev = EvaluatedMachine(m, params)
    host = ViterbiMatrix(ev, _sp(in_seq, out_seq)).log_like()
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = lm.matrices_2d("maxplus")
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in in_seq],
                        dtype=jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in out_seq],
                         dtype=jnp.int32)
    dev = float(dp2d.forward_2d(jnp.array(a_diag), jnp.array(a_left),
                                jnp.array(a_up), jnp.array(closure),
                                in_toks, out_toks, len(in_seq), len(out_seq),
                                sr=MAXPLUS))
    if host == -np.inf:
        assert dev < -1e20
    else:
        assert abs(dev - host) < TOL, (host, dev)


def test_backward_2d_matches_host():
    m, params = stutter_noise()
    ev = EvaluatedMachine(m, params)
    sp = _sp("101", "0011")
    host = BackwardMatrix(ev, sp)
    lm = LoweredMachine(ev, dtype=np.float64)
    a_diag, a_left, a_up, closure = lm.matrices_2d()
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                        dtype=jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "0011"],
                         dtype=jnp.int32)
    b = np.array(dp2d.backward_2d_lattice(
        jnp.array(a_diag), jnp.array(a_left), jnp.array(a_up),
        jnp.array(closure), in_toks, out_toks))
    for i in range(4):
        for o in range(5):
            for s in range(ev.n_states()):
                hv = host.cell[i, o, s]
                dv = b[o, i, s]
                if hv == -np.inf:
                    assert dv < -1e20, (i, o, s, hv, dv)
                else:
                    assert abs(dv - hv) < TOL, (i, o, s, hv, dv)


def _recognizer_1d():
    """bitnoise composed with a recognizer: input-only machine."""
    m, params = bitnoise()
    rec = Machine.recognizer(list("001"))
    comp = Machine.compose(m, rec)
    comp2 = comp.silence_output() if comp.output_alphabet() else comp
    return comp2, params


def test_forward_1d_generator():
    # CSV profile generator (output only)
    from machineboss_tpu.core.csvprof import CSVProfile
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    params = param_assign_from_json({})
    ev = EvaluatedMachine(gen, params)
    out_seq = ["A", "C"]
    host = ForwardMatrix(ev, _sp("", out_seq)).log_like()
    lm = LoweredMachine(ev, dtype=np.float32)
    trans, closure = lm.emit_matrices_1d(output_side=True)
    toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in out_seq],
                     dtype=jnp.int32)
    for fn in (dp1d.forward_1d_scan, dp1d.forward_1d_assoc):
        dev = float(fn(jnp.array(trans), jnp.array(closure), toks,
                       len(out_seq), sr=LOGSUMEXP))
        assert abs(dev - host) < TOL, (fn.__name__, host, dev)


def test_forward_1d_viterbi_generator():
    from machineboss_tpu.core.csvprof import CSVProfile
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    params = param_assign_from_json({})
    ev = EvaluatedMachine(gen, params)
    out_seq = ["A", "C"]
    host = ViterbiMatrix(ev, _sp("", out_seq)).log_like()
    lm = LoweredMachine(ev, dtype=np.float32)
    trans, closure = lm.emit_matrices_1d(output_side=True, semiring="maxplus")
    toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in out_seq],
                     dtype=jnp.int32)
    dev = float(dp1d.forward_1d_scan(jnp.array(trans), jnp.array(closure),
                                     toks, len(out_seq), sr=MAXPLUS))
    assert abs(dev - host) < TOL, (host, dev)


def test_1d_padding_mask():
    """Padded positions must not change the result."""
    from machineboss_tpu.core.csvprof import CSVProfile
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    params = param_assign_from_json({})
    ev = EvaluatedMachine(gen, params)
    out_seq = ["A", "C"]
    lm = LoweredMachine(ev, dtype=np.float32)
    trans, closure = lm.emit_matrices_1d(output_side=True)
    toks = [ev.output_tokenizer.sym2tok[c] - 1 for c in out_seq]
    padded = jnp.array(toks + [0, 0, 0], dtype=jnp.int32)
    exact = jnp.array(toks, dtype=jnp.int32)
    for fn in (dp1d.forward_1d_scan, dp1d.forward_1d_assoc):
        a = float(fn(jnp.array(trans), jnp.array(closure), exact, 2))
        b = float(fn(jnp.array(trans), jnp.array(closure), padded, 2))
        assert abs(a - b) < 1e-5, (fn.__name__, a, b)


def test_banded_forward_matches_host_envelope():
    """Envelope-banded device DP == host banded DP (path-area envelope)."""
    from machineboss_tpu.ops.dp2d import forward_2d_banded
    from machineboss_tpu.core.seqpair import Envelope

    m, params = stutter_noise()
    ev = EvaluatedMachine(m, params)
    sp = _sp("10101", "011010")
    sp.alignment = [("1", "0"), ("0", "1"), ("1", "1"), ("", "0"),
                    ("0", "1"), ("1", "0")]
    env = Envelope(sp, width=1)
    host = ForwardMatrix(ev, sp, env).log_like()
    lm = LoweredMachine(ev, dtype=np.float64)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1
                         for c in sp.input.seq], jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1
                          for c in sp.output.seq], jnp.int32)
    dev = float(forward_2d_banded(
        a_diag, a_left, a_up, closure, in_toks, out_toks,
        jnp.array(env.in_start), jnp.array(env.in_end),
        len(sp.input.seq), len(sp.output.seq)))
    if host == -np.inf:
        assert dev < -1e20
    else:
        assert abs(dev - host) < TOL, (host, dev)
    # banded must be <= full
    full = ForwardMatrix(ev, sp, Envelope.full(sp)).log_like()
    assert host <= full + 1e-9


def test_forward_1d_scan_probs_batch_matches_scan():
    """The batch-major prob-space scan (one-hot wide matmul + Kahan
    scale) equals the per-sequence log-space scan, incl. ragged lengths,
    empty sequences and dead (impossible) lanes."""
    import numpy as np
    import jax.numpy as jnp
    from machineboss_tpu.ops.dp1d import (forward_1d_scan,
                                          forward_1d_scan_probs_batch)
    rng = np.random.RandomState(3)
    n_tok, S = 4, 10
    with np.errstate(divide="ignore"):
        trans = np.log(np.where(rng.uniform(0, 1, (n_tok, S, S)) < 0.4,
                                rng.uniform(0.05, 1.0, (n_tok, S, S)),
                                0.0))
    closure = np.where(np.eye(S) > 0, 0.0, -np.inf)
    tj = jnp.array(trans, jnp.float32)
    cj = jnp.array(closure, jnp.float32)
    B, L = 9, 41
    toks = rng.randint(0, n_tok, (B, L)).astype(np.int32)
    lens = np.array([41, 30, 1, 0, 41, 7, 23, 2, 41], np.int32)
    ref = np.array([forward_1d_scan(tj, cj, jnp.array(toks[b]),
                                    jnp.int32(lens[b]))
                    for b in range(B)])
    got = np.array(forward_1d_scan_probs_batch(
        tj, cj, jnp.array(toks), jnp.array(lens)))
    live = ref > -1e29
    assert np.all((got > -1e29) == live)
    assert np.abs(ref[live] - got[live]).max() < 1e-4


def test_forward_1d_blocked_matches_scan():
    """Blocked engine (host-f64 k-token transfer table + device fold)
    equals the per-sequence scan, incl. ragged lengths and padding."""
    import jax.numpy as jnp
    from machineboss_tpu.ops.dp1d import (make_forward_1d_blocked,
                                          forward_1d_scan)
    rng = np.random.RandomState(3)
    S, n_tok = 24, 4
    p = rng.dirichlet(np.ones(S), size=(n_tok, S)).transpose(0, 2, 1)
    trans = np.log(p).astype(np.float32)
    closure = np.where(np.eye(S, dtype=bool), 0.0, -1e30).astype(np.float32)
    B, L = 7, 301
    toks = rng.randint(0, n_tok, (B, L)).astype(np.int32)
    lens = np.array([301, 300, 256, 17, 1, 0, 128], np.int32)
    tj, cj = jnp.array(trans), jnp.array(closure)
    fn = make_forward_1d_blocked(tj, cj)
    got = np.array(fn(jnp.array(toks), jnp.array(lens)))
    for b in range(B):
        want = float(forward_1d_scan(tj, cj, jnp.array(toks[b]),
                                     int(lens[b])))
        if want < -1e29:
            assert got[b] < -1e29
        else:
            assert abs(got[b] - want) < 1e-3, (b, want, got[b])


def test_token_block_table_exact():
    """The host f64 block table equals explicit chained products."""
    from machineboss_tpu.ops.dp1d import (build_token_block_table,
                                          _np_log_matmul_batch)
    rng = np.random.RandomState(5)
    S, n_tok = 6, 3
    trans = np.log(rng.dirichlet(np.ones(S), size=(n_tok, S))
                   ).transpose(0, 2, 1)
    table, k = build_token_block_table(trans, k=3)
    base = n_tok + 1
    eye = np.where(np.eye(S, dtype=bool), 0.0, -1e30)
    lvl = np.concatenate([trans, eye[None]])
    for combo in ((0, 1, 2), (2, 2, 0), (n_tok, 1, n_tok), (0, 0, 0)):
        want = lvl[combo[0]]
        for t in combo[1:]:
            want = _np_log_matmul_batch(want[None], lvl[t][None])[0]
        cid = (combo[0] * base + combo[1]) * base + combo[2]
        np.testing.assert_allclose(table[cid], want, atol=1e-12)
