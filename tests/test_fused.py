"""Fused generator(x)transducer DP vs materialized composition."""

import numpy as np

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.core.csvprof import CSVProfile
from machineboss_tpu.core.presets import make_preset
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.fused import fused_forward, fused_tensors

TOL = 1e-2


def test_fused_equals_composed():
    gen = CSVProfile.from_file(REF + "/t/csv/test.csv").machine()
    td = make_preset("dna2rna")
    composed = Machine.compose(gen, td)
    ev_c = EvaluatedMachine(composed, composed.get_param_defs(True))
    out_seq = ["A", "C"]
    host = ForwardMatrix(ev_c, SeqPair(NamedSeq("i", []),
                                       NamedSeq("o", out_seq))).log_like()

    gen_ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    g_emit, g_cl, t_tensor, t_cl = fused_tensors(gen_ev, td_ev)
    out_toks = jnp.array([td_ev.output_tokenizer.sym2tok[c] - 1
                          for c in out_seq], jnp.int32)
    dev = float(fused_forward(jnp.array(g_emit), jnp.array(g_cl),
                              jnp.array(t_tensor), jnp.array(t_cl),
                              out_toks, len(out_seq)))
    assert abs(dev - host) < TOL, (host, dev)


def test_fused_hmmer_profile():
    """Plan7-style profile generator fused with a noisy channel."""
    from machineboss_tpu.core.hmmer import HmmerModel
    h = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    gen = h.machine(False)  # glocal core profile
    # simple substitution transducer over the AA alphabet: identity echo
    td = Machine.wild_echo(gen.output_alphabet())
    composed = Machine.compose(gen, td)
    ev_c = EvaluatedMachine(composed, composed.get_param_defs(True))
    out_seq = list("ACDEF")
    host = ForwardMatrix(ev_c, SeqPair(NamedSeq("i", []),
                                       NamedSeq("o", out_seq))).log_like()
    gen_ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    g_emit, g_cl, t_tensor, t_cl = fused_tensors(gen_ev, td_ev)
    out_toks = jnp.array([td_ev.output_tokenizer.sym2tok[c] - 1
                          for c in out_seq], jnp.int32)
    dev = float(fused_forward(jnp.array(g_emit), jnp.array(g_cl),
                              jnp.array(t_tensor), jnp.array(t_cl),
                              out_toks, len(out_seq), n_pair_iters=4))
    if host == -np.inf:
        assert dev < -1e20
    else:
        assert abs(dev - host) < TOL, (host, dev)


def test_fused_interleaving_canonicalization():
    """Generator silent moves + transducer insertions: commuting move
    pairs must be counted once (regression: close() used to apply the
    generator closure to T-only-move arrivals, overcounting)."""
    import jax.numpy as jnp
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
    from machineboss_tpu.algo.dp_host import ForwardMatrix
    from machineboss_tpu.ops.fused import fused_forward, fused_tensors

    gen = Machine.from_json({"state": [
        {"id": "s0", "trans": [
            {"out": "a", "to": "s0", "weight": 0.3},
            {"to": "s1", "weight": 0.55},
            {"out": "b", "to": "s1", "weight": 0.15}]},
        {"id": "s1", "trans": [
            {"out": "b", "to": "s1", "weight": 0.4},
            {"to": "end", "weight": 0.6}]},
        {"id": "end", "trans": []}]})
    td = Machine.from_json({"state": [
        {"id": "t", "trans": [
            {"in": "a", "out": "a", "to": "t", "weight": 0.5},
            {"in": "a", "out": "b", "to": "t", "weight": 0.1},
            {"in": "b", "out": "b", "to": "t", "weight": 0.55},
            {"in": "a", "to": "t", "weight": 0.1},
            {"in": "b", "to": "t", "weight": 0.15},
            {"out": "a", "to": "t", "weight": 0.08},
            {"to": "tend", "weight": 0.2}]},
        {"id": "tend", "trans": []}]})
    gen_ev = EvaluatedMachine(gen, gen.get_param_defs(True))
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    ge, gc, tt, tc = fused_tensors(gen_ev, td_ev)
    comp = Machine.compose(gen, td)
    ev = EvaluatedMachine(comp, comp.get_param_defs(True))
    for seq in ("a", "b", "ab", "ba", "aab"):
        want = ForwardMatrix(ev, SeqPair(
            NamedSeq("i", []), NamedSeq("o", list(seq)))).log_like()
        toks = jnp.array([td_ev.output_tokenizer.sym2tok[c] - 1
                          for c in seq], jnp.int32)
        got = float(fused_forward(jnp.array(ge), jnp.array(gc),
                                  jnp.array(tt), jnp.array(tc), toks,
                                  len(seq), n_pair_iters=8))
        assert abs(got - want) < 1e-4, (seq, want, got)
