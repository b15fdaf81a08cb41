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
