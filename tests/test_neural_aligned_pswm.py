"""Metamorphic invariants for the parameterized/neural, aligned, and PSWM
DP variants (mirroring the reference JAX suite's invariants):
  - neural DP with constant params == standard Forward
  - neural DP is differentiable (finite grads)
  - aligned (path-constrained) Forward <= unconstrained Forward
  - one-hot PSWM == token sequence
  - expression compiler resolves defs chains and detects cycles
"""

import json

import numpy as np
import pytest

from conftest import REF

import jax
import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops.exprjit import compile_expr, ParameterizedMachine
from machineboss_tpu.ops.dp_neural import neural_log_forward
from machineboss_tpu.ops.dp_aligned import forward_aligned, alignment_tokens
from machineboss_tpu.ops.pswm import forward_1d_pswm, pswm_from_tokens
from machineboss_tpu.ops import dp1d
from machineboss_tpu.ops.semiring import LOGSUMEXP

TOL = 1e-2


def _bitnoise():
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    return m, params


def test_compile_expr_defs_chain():
    fn = compile_expr(("*", "a", "b"), defs={"b": ("+", "c", 1)})
    v = fn({"a": jnp.float32(2.0), "c": jnp.float32(3.0)})
    assert abs(float(v) - 8.0) < 1e-6


def test_compile_expr_cycle_detection():
    with pytest.raises(ValueError):
        compile_expr("a", defs={"a": ("+", "b", 1), "b": "a"})


def test_neural_constant_params_matches_host():
    m, params = _bitnoise()
    ev = EvaluatedMachine(m, params)
    sp = SeqPair(NamedSeq("i", list("101")), NamedSeq("o", list("001")))
    host = ForwardMatrix(ev, sp).log_like()
    pm = ParameterizedMachine(m)
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                        jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "001"],
                         jnp.int32)
    pvals = {k: jnp.float32(float(params.defs[k])) for k in pm.param_names}
    dev = float(neural_log_forward(pm, in_toks, out_toks, pvals))
    assert abs(dev - host) < TOL, (host, dev)


def test_neural_position_dependent_grad():
    m, params = _bitnoise()
    ev = EvaluatedMachine(m, params)
    pm = ParameterizedMachine(m)
    in_toks = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                        jnp.int32)
    out_toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "001"],
                         jnp.int32)

    def loss(p_field):
        pvals = {"p": p_field, "q": 1.0 - p_field}
        return neural_log_forward(pm, in_toks, out_toks, pvals)

    p_field = jnp.full((4, 4), 0.9, jnp.float32)
    ll, grad = jax.value_and_grad(loss)(p_field)
    assert np.isfinite(float(ll))
    g = np.array(grad)
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)


def test_aligned_le_unconstrained():
    m, params = _bitnoise()
    ev = EvaluatedMachine(m, params)
    sp = SeqPair(NamedSeq("i", list("101")), NamedSeq("o", list("001")))
    host = ForwardMatrix(ev, sp).log_like()
    lm = LoweredMachine(ev, dtype=np.float32)
    alignment = [("1", "0"), ("0", "0"), ("1", "1")]
    ci, co = alignment_tokens(ev, alignment)
    aligned = float(forward_aligned(jnp.array(lm.log_trans),
                                    jnp.array(lm.log_closure),
                                    jnp.array(ci), jnp.array(co),
                                    len(alignment)))
    assert aligned <= host + 1e-6
    # bitnoise is an aligning machine: the single path sum must be finite
    assert aligned > -1e20


def test_pswm_onehot_equals_tokens():
    from machineboss_tpu.core.csvprof import CSVProfile
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    trans, closure = lm.emit_matrices_1d(output_side=True)
    emit = lm.log_trans[0, 1:]  # (n_out-1, S, S) without closure
    toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "AC"],
                     jnp.int32)
    tok_ll = float(dp1d.forward_1d_scan(jnp.array(trans), jnp.array(closure),
                                        toks, 2, sr=LOGSUMEXP))
    pswm = pswm_from_tokens(toks, emit.shape[0])
    pswm_ll = float(forward_1d_pswm(jnp.array(emit), jnp.array(closure),
                                    pswm, 2))
    assert abs(tok_ll - pswm_ll) < TOL, (tok_ll, pswm_ll)


def test_pswm_2d_onehot_equals_tokens():
    from machineboss_tpu.ops.pswm import forward_2d_pswm, pswm_from_tokens
    from machineboss_tpu.ops import dp2d
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())
    it = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                   jnp.int32)
    ot = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "0011"],
                   jnp.int32)
    tok_ll = float(dp2d.forward_2d(a_diag, a_left, a_up, closure, it, ot,
                                   3, 4))
    in_pswm = pswm_from_tokens(it, a_diag.shape[0])
    out_pswm = pswm_from_tokens(ot, a_diag.shape[1])
    pswm_ll = float(forward_2d_pswm(a_diag, a_left, a_up, closure,
                                    in_pswm, out_pswm, 3, 4))
    assert abs(tok_ll - pswm_ll) < TOL, (tok_ll, pswm_ll)


def test_posterior_lattice_sums_to_one():
    from machineboss_tpu.ops.fwdback import posterior_lattice
    m, params = _bitnoise()
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float64)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())
    it = jnp.array([ev.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                   jnp.int32)
    ot = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "001"],
                   jnp.int32)
    post = np.array(posterior_lattice(a_diag, a_left, a_up, closure, it, ot))
    # bitnoise is a single-state aligning machine: every diagonal cell on
    # the alignment path has posterior 1
    for k in range(4):
        assert abs(np.exp(post[k, k, 0]) - 1.0) < 1e-6, (k, post[k, k, 0])


def test_pswm_backward_equals_forward():
    from machineboss_tpu.ops.pswm import (forward_1d_pswm, backward_1d_pswm,
                                          forward_2d_pswm, backward_2d_pswm,
                                          pswm_from_tokens)
    from machineboss_tpu.core.csvprof import CSVProfile
    from machineboss_tpu.ops.semiring import MAXPLUS
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    emit = lm.log_trans[0, 1:]
    _, closure = lm.emit_matrices_1d(output_side=True)
    toks = jnp.array([ev.output_tokenizer.sym2tok[c] - 1 for c in "AC"],
                     jnp.int32)
    pswm = pswm_from_tokens(toks, emit.shape[0])
    for sr in (LOGSUMEXP, MAXPLUS):
        f = float(forward_1d_pswm(jnp.array(emit), jnp.array(closure),
                                  pswm, 2, sr=sr))
        b = float(backward_1d_pswm(jnp.array(emit), jnp.array(closure),
                                   pswm, 2, sr=sr))
        assert abs(f - b) < TOL, (sr.name, f, b)

    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f2:
        params = param_assign_from_json(json.load(f2))
    ev2 = EvaluatedMachine(m, params)
    lm2 = LoweredMachine(ev2, dtype=np.float32)
    a_diag, a_left, a_up, closure2 = (jnp.array(x) for x in lm2.matrices_2d())
    it = jnp.array([ev2.input_tokenizer.sym2tok[c] - 1 for c in "101"],
                   jnp.int32)
    ot = jnp.array([ev2.output_tokenizer.sym2tok[c] - 1 for c in "0011"],
                   jnp.int32)
    ip = pswm_from_tokens(it, a_diag.shape[0])
    op = pswm_from_tokens(ot, a_diag.shape[1])
    for sr in (LOGSUMEXP, MAXPLUS):
        f = float(forward_2d_pswm(a_diag, a_left, a_up, closure2, ip, op,
                                  3, 4, sr=sr))
        b = float(backward_2d_pswm(a_diag, a_left, a_up, closure2, ip, op,
                                   3, 4, sr=sr))
        assert abs(f - b) < TOL, (sr.name, f, b)
