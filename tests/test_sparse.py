"""Sparse COO device engine vs host oracle on a large profile machine."""

import numpy as np

from conftest import REF

from machineboss_tpu.core.hmmer import HmmerModel
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.sparse import SparseMachine, forward_2d_sparse

TOL = 1e-2


def test_sparse_fn3_profile():
    h = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    gen = h.machine(False)
    ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    out_seq = list("ACDEFGHIK")
    host = ForwardMatrix(ev, SeqPair(NamedSeq("i", []),
                                     NamedSeq("o", out_seq))).log_like()
    sm = SparseMachine(ev)
    out_toks = [ev.output_tokenizer.sym2tok[c] for c in out_seq]
    dev = forward_2d_sparse(sm, [], out_toks)
    assert abs(dev - host) < TOL, (host, dev)


def test_sparse_transducer_pair():
    from machineboss_tpu.core.machine import Machine
    import json
    from machineboss_tpu.core.params import param_assign_from_json
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    sp = SeqPair(NamedSeq("i", list("101")), NamedSeq("o", list("0011")))
    host = ForwardMatrix(ev, sp).log_like()
    sm = SparseMachine(ev)
    it = [ev.input_tokenizer.sym2tok[c] for c in "101"]
    ot = [ev.output_tokenizer.sym2tok[c] for c in "0011"]
    dev = forward_2d_sparse(sm, it, ot)
    assert abs(dev - host) < TOL, (host, dev)


def test_sparse_1d_forward_backward_viterbi():
    from machineboss_tpu.ops.sparse import (forward_1d_sparse,
                                            backward_1d_sparse)
    from machineboss_tpu.algo.dp_host import ViterbiMatrix
    h = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    gen = h.machine(False)
    ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    out_seq = list("ACDEFG")
    sp = SeqPair(NamedSeq("i", []), NamedSeq("o", out_seq))
    host_f = ForwardMatrix(ev, sp).log_like()
    host_v = ViterbiMatrix(ev, sp).log_like()
    sm = SparseMachine(ev)
    toks = [ev.output_tokenizer.sym2tok[c] for c in out_seq]
    assert abs(forward_1d_sparse(sm, toks) - host_f) < TOL
    assert abs(backward_1d_sparse(sm, toks) - host_f) < TOL
    assert abs(forward_1d_sparse(sm, toks, viterbi=True) - host_v) < TOL
    assert abs(backward_1d_sparse(sm, toks, viterbi=True) - host_v) < TOL


def test_sparse_2d_backward_viterbi():
    from machineboss_tpu.core.machine import Machine
    import json
    from machineboss_tpu.core.params import param_assign_from_json
    from machineboss_tpu.ops.sparse import (backward_2d_sparse,
                                            viterbi_2d_sparse)
    from machineboss_tpu.algo.dp_host import ViterbiMatrix
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    sp = SeqPair(NamedSeq("i", list("101")), NamedSeq("o", list("0011")))
    host_f = ForwardMatrix(ev, sp).log_like()
    host_v = ViterbiMatrix(ev, sp).log_like()
    sm = SparseMachine(ev)
    it = [ev.input_tokenizer.sym2tok[c] for c in "101"]
    ot = [ev.output_tokenizer.sym2tok[c] for c in "0011"]
    assert abs(backward_2d_sparse(sm, it, ot) - host_f) < TOL
    assert abs(viterbi_2d_sparse(sm, it, ot) - host_v) < TOL


def test_sparse_pswm_invariants():
    """PSWM x SPARSE grid (ops/sparse.py forward/backward_1d_sparse_pswm,
    forward_2d_sparse_pswm): (1) one-hot PSWM == TOK sparse engines,
    (2) backward == forward, (3) viterbi <= forward, (4) random PSWMs
    match the DENSE PSWM engine (ref variant grid API.md:6-29)."""
    import numpy as np
    import jax.numpy as jnp
    from machineboss_tpu.core.machine import Machine
    import json
    from machineboss_tpu.core.params import param_assign_from_json
    from machineboss_tpu.ops.sparse import (
        SparseMachine, forward_1d_sparse, forward_2d_sparse,
        forward_1d_sparse_pswm, backward_1d_sparse_pswm,
        forward_2d_sparse_pswm, backward_2d_sparse_pswm)
    from machineboss_tpu.ops.pswm import forward_2d_pswm, pswm_from_tokens
    from machineboss_tpu.ops.lowering import LoweredMachine

    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    sm = SparseMachine(ev)
    Ti = ev.input_tokenizer.n_tokens() - 1
    To = ev.output_tokenizer.n_tokens() - 1

    it = [ev.input_tokenizer.sym2tok[c] for c in "101"]
    ot = [ev.output_tokenizer.sym2tok[c] for c in "0011"]
    in_oh = pswm_from_tokens(jnp.array([t - 1 for t in it]), Ti)
    out_oh = pswm_from_tokens(jnp.array([t - 1 for t in ot]), To)

    # (1) one-hot PSWM reduces exactly to the token sparse engines
    tok2d = forward_2d_sparse(sm, it, ot)
    assert abs(forward_2d_sparse_pswm(sm, in_oh, out_oh) - tok2d) < 1e-4

    rng = np.random.RandomState(17)

    def rand_pswm(L, T):
        w = rng.dirichlet(np.ones(T + 1), size=L)
        return jnp.log(jnp.array(w, jnp.float32))

    in_p = rand_pswm(3, Ti)
    out_p = rand_pswm(4, To)

    # (2) backward == forward (1D over the output tape of a generator
    # view: feed the output-side profile with an empty input profile)
    f2 = forward_2d_sparse_pswm(sm, in_p, out_p)
    # (4) dense PSWM engine agreement on the same random profiles
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = (jnp.array(x) for x in lm.matrices_2d())
    dense = float(forward_2d_pswm(ad, al, au, cl, in_p, out_p,
                                  in_p.shape[0], out_p.shape[0]))
    assert abs(f2 - dense) < 1e-3, (f2, dense)

    # (2b) 2D backward == 2D forward on the same random profiles — the
    # last cell of the reference variant grid (backward_2d_sparse_pswm)
    b2 = backward_2d_sparse_pswm(sm, in_p, out_p)
    assert abs(b2 - f2) < 1e-3, (b2, f2)
    b2_oh = backward_2d_sparse_pswm(sm, in_oh, out_oh)
    assert abs(b2_oh - tok2d) < 1e-4, (b2_oh, tok2d)
    bv = backward_2d_sparse_pswm(sm, in_p, out_p, viterbi=True)
    assert bv <= f2 + 1e-5

    # (3) viterbi <= forward
    v2 = forward_2d_sparse_pswm(sm, in_p, out_p, viterbi=True)
    assert v2 <= f2 + 1e-5

    # 1D variants on a generator (output-only machine)
    h = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    gen = h.machine(False)
    gev = EvaluatedMachine(gen, gen.get_param_defs(True))
    gsm = SparseMachine(gev)
    Tg = gev.output_tokenizer.n_tokens() - 1
    toks = [gev.output_tokenizer.sym2tok[c] for c in "ACDEF"]
    oh = pswm_from_tokens(jnp.array([t - 1 for t in toks]), Tg)
    tok1d = forward_1d_sparse(gsm, toks)
    f1_oh = forward_1d_sparse_pswm(gsm, oh)
    assert abs(f1_oh - tok1d) < 1e-4, (f1_oh, tok1d)
    gp = rand_pswm(4, Tg)
    f1 = forward_1d_sparse_pswm(gsm, gp)
    b1 = backward_1d_sparse_pswm(gsm, gp)
    assert abs(f1 - b1) < 1e-3, (f1, b1)
    v1 = forward_1d_sparse_pswm(gsm, gp, viterbi=True)
    assert v1 <= f1 + 1e-5
