"""Chain-specialized fused Plan7 engine vs composed-machine host oracle."""

import numpy as np

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.hmmer import HmmerModel
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.fused_plan7 import Plan7Fused

# tiny 3-node DNA profile; HMMER3 stores -ln(p), '*' = impossible
_HMM = """\
HMMER3/f [3.1b2 | February 2015]
NAME  toy
LENG  3
ALPH  DNA
HMM          A        C        G        T
            m->m     m->i     m->d     i->m     i->i     d->m     d->d
  COMPO   1.38629  1.38629  1.38629  1.38629
          1.38629  1.38629  1.38629  1.38629
          0.10536  2.35388  2.99573  0.61519  0.77653  0.00000  *
      1   0.22314  2.30259  2.99573  2.99573      1 a - - -
          1.38629  1.38629  1.38629  1.38629
          0.16252  2.30259  2.99573  0.51083  0.91629  0.35667  1.20397
      2   2.99573  0.35667  2.30259  1.89712      2 c - - -
          1.09861  1.60944  1.60944  1.38629
          0.22314  1.89712  2.99573  0.40048  1.10866  0.30111  1.35667
      3   2.30259  2.99573  0.28768  1.89712      3 g - - -
          1.38629  1.38629  1.38629  1.38629
          0.01005  4.60517  *        0.45676  1.00239  0.00000  *
//
"""

_TD = {"state": [
    {"id": "loop", "trans": [
        {"in": "A", "out": "A", "to": "loop", "weight": 0.5},
        {"in": "A", "out": "C", "to": "loop", "weight": 0.1},
        {"in": "C", "out": "C", "to": "loop", "weight": 0.5},
        {"in": "C", "out": "G", "to": "loop", "weight": 0.1},
        {"in": "G", "out": "G", "to": "loop", "weight": 0.5},
        {"in": "G", "out": "T", "to": "loop", "weight": 0.1},
        {"in": "T", "out": "T", "to": "loop", "weight": 0.5},
        {"in": "T", "out": "A", "to": "loop", "weight": 0.1},
        {"in": "A", "to": "loop", "weight": 0.08},
        {"in": "C", "to": "loop", "weight": 0.08},
        {"in": "G", "to": "loop", "weight": 0.06},
        {"in": "T", "to": "loop", "weight": 0.06},
        {"out": "A", "to": "loop", "weight": 0.03},
        {"out": "G", "to": "loop", "weight": 0.02},
        {"to": "end", "weight": 0.12}]},
    {"id": "end", "trans": []}]}


# noisy protein identity transducer (fn3 alphabet)
_TD_PROT = {"state": [
    {"id": "loop", "trans": [{'in': 'A', 'out': 'A', 'to': 'loop', 'weight': 0.03}, {'in': 'A', 'to': 'loop', 'weight': 0.005}, {'in': 'C', 'out': 'C', 'to': 'loop', 'weight': 0.03}, {'in': 'C', 'to': 'loop', 'weight': 0.005}, {'in': 'D', 'out': 'D', 'to': 'loop', 'weight': 0.03}, {'in': 'D', 'to': 'loop', 'weight': 0.005}, {'in': 'E', 'out': 'E', 'to': 'loop', 'weight': 0.03}, {'in': 'E', 'to': 'loop', 'weight': 0.005}, {'in': 'F', 'out': 'F', 'to': 'loop', 'weight': 0.03}, {'in': 'F', 'to': 'loop', 'weight': 0.005}, {'in': 'G', 'out': 'G', 'to': 'loop', 'weight': 0.03}, {'in': 'G', 'to': 'loop', 'weight': 0.005}, {'in': 'H', 'out': 'H', 'to': 'loop', 'weight': 0.03}, {'in': 'H', 'to': 'loop', 'weight': 0.005}, {'in': 'I', 'out': 'I', 'to': 'loop', 'weight': 0.03}, {'in': 'I', 'to': 'loop', 'weight': 0.005}, {'in': 'K', 'out': 'K', 'to': 'loop', 'weight': 0.03}, {'in': 'K', 'to': 'loop', 'weight': 0.005}, {'in': 'L', 'out': 'L', 'to': 'loop', 'weight': 0.03}, {'in': 'L', 'to': 'loop', 'weight': 0.005}, {'in': 'M', 'out': 'M', 'to': 'loop', 'weight': 0.03}, {'in': 'M', 'to': 'loop', 'weight': 0.005}, {'in': 'N', 'out': 'N', 'to': 'loop', 'weight': 0.03}, {'in': 'N', 'to': 'loop', 'weight': 0.005}, {'in': 'P', 'out': 'P', 'to': 'loop', 'weight': 0.03}, {'in': 'P', 'to': 'loop', 'weight': 0.005}, {'in': 'Q', 'out': 'Q', 'to': 'loop', 'weight': 0.03}, {'in': 'Q', 'to': 'loop', 'weight': 0.005}, {'in': 'R', 'out': 'R', 'to': 'loop', 'weight': 0.03}, {'in': 'R', 'to': 'loop', 'weight': 0.005}, {'in': 'S', 'out': 'S', 'to': 'loop', 'weight': 0.03}, {'in': 'S', 'to': 'loop', 'weight': 0.005}, {'in': 'T', 'out': 'T', 'to': 'loop', 'weight': 0.03}, {'in': 'T', 'to': 'loop', 'weight': 0.005}, {'in': 'V', 'out': 'V', 'to': 'loop', 'weight': 0.03}, {'in': 'V', 'to': 'loop', 'weight': 0.005}, {'in': 'W', 'out': 'W', 'to': 'loop', 'weight': 0.03}, {'in': 'W', 'to': 'loop', 'weight': 0.005}, {'in': 'Y', 'out': 'Y', 'to': 'loop', 'weight': 0.03}, {'in': 'Y', 'to': 'loop', 'weight': 0.005}, {'out': 'A', 'to': 'loop', 'weight': 0.01}, {'out': 'G', 'to': 'loop', 'weight': 0.01}, {'to': 'end', 'weight': 0.28}]},
    {"id": "end", "trans": []}]}


def _oracle(gen, td, out_seq):
    comp = Machine.compose(gen, td)
    ev = EvaluatedMachine(comp, comp.get_param_defs(True))
    return ForwardMatrix(ev, SeqPair(NamedSeq("i", []),
                                     NamedSeq("o", list(out_seq)))).log_like()


def _setup():
    hmm = HmmerModel()
    hmm.read(_HMM)
    td = Machine.from_json(_TD)
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    return hmm, td, td_ev


def test_fused_core_global():
    hmm, td, td_ev = _setup()
    fused = Plan7Fused(hmm, td_ev, mode="core", local=False)
    for seq in ("ACG", "AACGT", "", "GT"):
        want = _oracle(hmm.machine(local=False), td, seq)
        got = fused.forward(list(seq))
        if want == -np.inf:
            assert got < -1e20, (seq, got)
        else:
            assert abs(got - want) < 2e-3, (seq, want, got)


def test_fused_core_local():
    hmm, td, td_ev = _setup()
    fused = Plan7Fused(hmm, td_ev, mode="core", local=True)
    for seq in ("ACG", "AC", "CGT", "A"):
        want = _oracle(hmm.machine(local=True), td, seq)
        got = fused.forward(list(seq))
        if want == -np.inf:
            assert got < -1e20, (seq, got)
        else:
            assert abs(got - want) < 2e-3, (seq, want, got)


def test_fused_plan7_single_multihit():
    hmm, td, td_ev = _setup()
    for multihit in (False, True):
        fused = Plan7Fused(hmm, td_ev, mode="plan7", multihit=multihit,
                           length=10.0, n_hit=4)
        for seq in ("ACG", "TTACGACGTT"):
            want = _oracle(hmm.plan7_machine(multihit=multihit, length=10.0),
                           td, seq)
            got = fused.forward(list(seq))
            assert abs(got - want) < 5e-3, (multihit, seq, want, got)


def test_fused_plan7_forward_batch():
    hmm, td, td_ev = _setup()
    fused = Plan7Fused(hmm, td_ev, mode="plan7", multihit=False,
                       length=10.0)
    seqs = [list("ACG"), list("TTACG"), list("A"), list("GATTACA")]
    batch = fused.forward_batch(seqs)
    for n, s in enumerate(seqs):
        single = fused.forward(s)
        assert abs(batch[n] - single) < 1e-4, (n, single, batch[n])


def test_fused_prefix_solver_matches_scan_fn3():
    """The prefix-product row solver (one dense semiring matmul against
    the precomputed lower-block-triangular transfer matrix) equals the
    associative_scan solver on a real 86-node profile (fn3.hmm)."""
    from conftest import REF
    hmm = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    td = Machine.from_json(_TD_PROT)
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    seq = "ACDEFGHIKLMNPQRSTVWYACDEFG"
    for mode, multihit in (("plan7", False), ("plan7", True),
                           ("core", False)):
        f_scan = Plan7Fused(hmm, td_ev, mode=mode, multihit=multihit,
                            solver="scan")
        f_pref = Plan7Fused(hmm, td_ev, mode=mode, multihit=multihit,
                            solver="prefix")
        a = f_scan.forward(seq)
        b = f_pref.forward(seq)
        assert abs(a - b) < 2e-3, (mode, multihit, a, b)


def test_fused_flat_batch_matches_vmap():
    """The batch-major flat solver (merged per-class ops + EXACT
    multihit re-entry closure) equals the per-read vmapped path in all
    modes; multihit differs only by the vmap path's n_hit truncation."""
    hmm, td, td_ev = _setup()
    rng = np.random.RandomState(0)
    reads = [["ACGT"[i] for i in rng.randint(0, 4, rng.randint(1, 9))]
             for _ in range(10)]
    for mode, local, multihit in (("core", True, False),
                                  ("core", False, False),
                                  ("plan7", True, False),
                                  ("plan7", True, True)):
        f = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                       multihit=multihit, length=10.0, solver="prefix")
        flat = f.forward_batch(reads, impl="flat")
        legacy = f.forward_batch(reads, impl="vmap")
        # the flat solver executes in scaled-probability space
        # (ops/semiring.ProbSemiring): a few-ulp f32 difference vs the
        # log-space vmap path is expected; multihit additionally differs
        # by the vmap path's n_hit truncation
        tol = 1e-3 if multihit else 1e-5
        assert np.abs(flat - legacy).max() < tol, (mode, local, multihit)
        if multihit:
            # flat's re-entry closure is exact; vmap truncates at n_hit,
            # so the flat value can only be (epsilon-)higher
            assert (flat >= legacy - 1e-5).all()
        # and against the composed-machine oracle
        gen = hmm.machine(local) if mode == "core" else \
            hmm.plan7_machine(multihit=multihit, length=10.0)
        for n in (0, 3, 7):
            want = _oracle(gen, td, "".join(reads[n]))
            assert abs(flat[n] - want) < 5e-3, (mode, local, multihit, n)


# ---------------------------------------------------------------- Viterbi

def _vit_oracle(gen, td, out_seq):
    from machineboss_tpu.algo.dp_host import ViterbiMatrix
    comp = Machine.compose(gen, td)
    ev = EvaluatedMachine(comp, comp.get_param_defs(True))
    return ViterbiMatrix(ev, SeqPair(NamedSeq("i", []),
                                     NamedSeq("o", list(out_seq)))).log_like()


_COMBOS = (("core", True, False), ("core", False, False),
           ("plan7", True, False), ("plan7", True, True))


def test_fused_viterbi_modes_toy():
    """Semiring-parameterized fused Viterbi (MAXPLUS), all four
    mode x multihit combos (the reference's fused Plan7 is likewise
    semiring-parameterized, ref python/machineboss/jax/fused_plan7.py:
    636-645, and like the reference's the fused max never reproduces the
    silent-path sums compose() folds in before the host Viterbi runs —
    see ops/fused_plan7.loop_closure). Asserted exactly:
      - device == the f64 product-graph oracle (algo/fused_align.py)
      - the sandwich vit_fused <= vit_composed <= fwd_fused"""
    from machineboss_tpu.algo.fused_align import FusedViterbiAligner
    hmm, td, td_ev = _setup()
    for mode, local, multihit in _COMBOS:
        fused = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                           multihit=multihit, length=10.0, n_hit=4,
                           semiring="maxplus")
        fwd = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                         multihit=multihit, length=10.0, n_hit=4)
        gen = hmm.machine(local) if mode == "core" else \
            hmm.plan7_machine(multihit=multihit, length=10.0)
        oracle = FusedViterbiAligner(gen, td)
        for seq in ("A", "ACG", "TTACGACGTT", "GT"):
            got = fused.forward(list(seq))
            want = oracle.score(seq)
            if want == -np.inf:
                assert got < -1e20, (mode, multihit, seq, got)
                continue
            assert abs(got - want) < 1e-4, (mode, local, multihit, seq,
                                            want, got)
            comp_v = _vit_oracle(gen, td, seq)
            f = fwd.forward(list(seq))
            assert got <= comp_v + 1e-4, (mode, local, multihit, seq)
            assert comp_v <= f + 5e-3, (mode, local, multihit, seq)


def test_fused_viterbi_fn3():
    """fn3.hmm (86 nodes) fused Viterbi, all four combos, per-read and
    batch-major flat solver, against the f64 product-graph oracle."""
    from conftest import REF
    from machineboss_tpu.algo.fused_align import FusedViterbiAligner
    hmm = HmmerModel.from_file(REF + "/t/hmmer/fn3.hmm")
    td = Machine.from_json(_TD_PROT)
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))
    seq = "ACDEFGHIKLMNPQRSTVWYACDEFG"
    for mode, local, multihit in _COMBOS:
        fused = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                           multihit=multihit, length=10.0, n_hit=4,
                           semiring="maxplus")
        gen = hmm.machine(local) if mode == "core" else \
            hmm.plan7_machine(multihit=multihit, length=10.0)
        oracle = FusedViterbiAligner(gen, td)
        want = oracle.score(seq)
        got = fused.forward(list(seq))
        assert abs(got - want) < 2e-4, (mode, local, multihit, want, got)
        flat = fused.forward_batch([list(seq), list(seq[:7])], impl="flat")
        assert abs(flat[0] - want) < 2e-4, (mode, local, multihit)
        want7 = oracle.score(seq[:7])
        assert abs(flat[1] - want7) < 2e-4, (mode, local, multihit)


def test_fused_viterbi_le_forward():
    """Metamorphic: Viterbi <= Forward through the fused engine."""
    hmm, td, td_ev = _setup()
    fwd = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True, length=10.0)
    vit = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True, length=10.0,
                     semiring="maxplus")
    for seq in ("ACG", "TTACGACGTT"):
        assert vit.forward(list(seq)) <= fwd.forward(list(seq)) + 1e-6


def test_forward_stream_matches_blocking():
    """Pipelined stream dispatch returns the same scores as blocking
    per-batch calls (the floor-hiding serving path, PERF.md)."""
    hmm, td, td_ev = _setup()
    f = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True, length=10.0,
                   solver="prefix")
    rng = np.random.RandomState(7)
    batches = []
    for _ in range(3):
        toks = rng.randint(1, 5, (4, 8)).astype(np.int32)
        lens = rng.randint(1, 9, 4).astype(np.int32)
        batches.append((toks, lens))
    streamed = f.forward_stream(batches)
    for (toks, lens), got in zip(batches, streamed):
        want = f.forward_batch_tokens(toks, lens)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_prob_space_execution_matches_log():
    """The scaled-probability execution semiring (Plan7Fused
    prob_space=True; ops/semiring.ProbSemiring) must reproduce the
    log-space flat solver: same recurrence, different arithmetic
    (kept as a documented-negative perf mode — PERF.md round 5)."""
    hmm, td, td_ev = _setup()
    rng = np.random.RandomState(4)
    reads = [["ACGT"[i] for i in rng.randint(0, 4, rng.randint(2, 9))]
             for _ in range(8)]
    for mode, local, multihit in (("core", True, False),
                                  ("plan7", True, False),
                                  ("plan7", True, True)):
        f_log = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                           multihit=multihit, length=10.0,
                           solver="prefix", prob_space=False)
        f_prob = Plan7Fused(hmm, td_ev, mode=mode, local=local,
                            multihit=multihit, length=10.0,
                            solver="prefix", prob_space=True)
        a = f_log.forward_batch(reads, impl="flat")
        b = f_prob.forward_batch(reads, impl="flat")
        assert np.abs(a - b).max() < 1e-4, (mode, local, multihit)


def test_pallas_fused_plan7_kernel_matches_flat():
    """The VMEM-resident Pallas fused-Plan7 kernel (interpret mode)
    equals the XLA flat solver on ragged batches, multihit on and off
    (ops/pallas/fused_plan7_kernel.py; 155k reads/s vs 29k on chip —
    PERF.md round 5)."""
    from machineboss_tpu.ops.pallas.fused_plan7_kernel import \
        make_fused_plan7_pallas

    hmm, td, td_ev = _setup()
    rng = np.random.RandomState(1)
    B, L = 8, 7
    for multihit in (False, True):
        f = Plan7Fused(hmm, td_ev, mode="plan7", multihit=multihit,
                       length=10.0, solver="prefix")
        toks = rng.randint(1, f.n_out, (B, L)).astype(np.int32)
        lens = rng.randint(1, L + 1, B).astype(np.int32)
        want = f.forward_batch_tokens(toks, lens, impl="flat")
        k = make_fused_plan7_pallas(f, B, L, interpret=True)
        got = k(toks, lens)
        assert np.abs(got - want).max() < 2e-3, (multihit, want, got)
        # the public auto-routing entry (interpret on CPU backends)
        got2 = f.forward_batch_tokens(toks, lens, impl="pallas")
        assert np.abs(got2 - want).max() < 2e-3, multihit
        # the streamed entry must also serve off-TPU (interpret mode)
        outs = f.forward_stream([(toks, lens)] * 2, impl="pallas")
        for o in outs:
            assert np.abs(o - want).max() < 2e-3, multihit
