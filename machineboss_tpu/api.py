"""High-level convenience API (ref: src/api.{h,cpp}, include/machineboss.h).

Free functions mirroring the reference C API surface, plus device-engine
variants for batched TPU execution. All machine/params/seq arguments accept
either loaded objects or file paths.
"""

import json

from .core.machine import Machine
from .core.params import Params, Constraints, param_assign_from_json
from .core.seqpair import SeqPair, SeqPairList, NamedSeq, Envelope
from .core.eval import EvaluatedMachine
from .algo.dp_host import ForwardMatrix, ViterbiMatrix, RollingForward
from .algo.counts import MachineCounts
from .algo.fitter import MachineFitter
from .algo.beam import BeamSearchMatrix, DEFAULT_BEAM_WIDTH
from .algo.ctc import PrefixTree


def _machine(m):
    if isinstance(m, Machine):
        return m
    if isinstance(m, dict):
        return Machine.from_json(m)
    return Machine.from_file(m)


def _params(p, machine=None, use_defaults=True):
    if isinstance(p, dict):
        p = param_assign_from_json(p)
    elif isinstance(p, str):
        with open(p) as f:
            p = param_assign_from_json(json.load(f))
    if p is None:
        return machine.get_param_defs(use_defaults) if machine is not None \
            else Params()
    if machine is not None:
        # fill in the machine's own defs and constraint defaults; explicit
        # user params win (same merge as the CLI, ref target/boss.cpp
        # params handling)
        p = machine.get_param_defs(use_defaults).combine(p, True)
    return p


def _seq(s):
    if isinstance(s, NamedSeq):
        return s
    if isinstance(s, str):
        return NamedSeq(s, list(s))
    return NamedSeq("seq", list(s))


def load_machine(path_or_json):
    """Load a machine from a file path or JSON value."""
    return _machine(path_or_json)


def save_machine(machine, path):
    with open(path, "w") as f:
        machine.write_json(f)


def forward_loglike(machine, input_seq, output_seq, params=None):
    """Forward log-likelihood of an (input, output) pair."""
    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    sp = SeqPair(_seq(input_seq), _seq(output_seq))
    return RollingForward(ev, sp).log_like()


def viterbi_loglike(machine, input_seq, output_seq, params=None):
    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    sp = SeqPair(_seq(input_seq), _seq(output_seq))
    return ViterbiMatrix(ev, sp).log_like()


def viterbi_align(machine, input_seq, output_seq, params=None):
    """Most likely alignment path; returns (loglike, MachinePath)."""
    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    sp = SeqPair(_seq(input_seq), _seq(output_seq))
    vit = ViterbiMatrix(ev, sp)
    return vit.log_like(), vit.path(m)


def forward_backward_counts(machine, input_seq, output_seq, params=None):
    """Posterior expected transition counts (E-step) for one pair."""
    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    sp = SeqPair(_seq(input_seq), _seq(output_seq))
    return MachineCounts(ev, sp)


def baum_welch_fit(machine, seq_pairs, constraints=None, seed=None,
                   engine="host"):
    """EM parameter fit over a training set of (input, output) pairs."""
    m = _machine(machine)
    if isinstance(seq_pairs, SeqPairList):
        spl = seq_pairs
    else:
        spl = SeqPairList([SeqPair(_seq(i), _seq(o)) for i, o in seq_pairs])
    cons = constraints if isinstance(constraints, Constraints) \
        else (Constraints.from_json(constraints) if constraints
              else Constraints())
    fitter = MachineFitter(machine=m, constraints=cons, engine=engine)
    fitter.seed = fitter.all_constraints().default_params().combine(
        _params(seed) if seed else fitter.seed, True)
    return fitter.fit(spl)


def beam_decode(machine, output_seq, params=None,
                beam_width=DEFAULT_BEAM_WIDTH):
    """Most likely input for an output, by beam search."""
    m = _machine(machine).decode_sort()
    ev = EvaluatedMachine(m, _params(params, m))
    return BeamSearchMatrix(ev, list(output_seq), beam_width).best_seq()


def beam_encode(machine, input_seq, params=None,
                beam_width=DEFAULT_BEAM_WIDTH):
    """Most likely output for an input, by beam search on the transpose."""
    m = _machine(machine).transpose().advance_sort().advancing_machine() \
                         .decode_sort()
    ev = EvaluatedMachine(m, _params(params, m))
    return BeamSearchMatrix(ev, list(input_seq), beam_width).best_seq()


def prefix_decode(machine, output_seq, params=None, max_backtrack=None):
    """Most likely input, by CTC prefix search."""
    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    return PrefixTree(ev, list(output_seq), max_backtrack).do_prefix_search()


def prefix_encode(machine, input_seq, params=None, max_backtrack=None):
    m = _machine(machine).transpose().advance_sort().advancing_machine()
    ev = EvaluatedMachine(m, _params(params, m))
    return PrefixTree(ev, list(input_seq), max_backtrack).do_prefix_search()


# ---------------------------------------------------------------------------
# batched device API


def device_forward_batch(machine, seq_pairs, params=None, dtype=None):
    """Batched Forward log-likelihoods on the accelerator.

    seq_pairs: list of (input_seq, output_seq). Returns numpy array (B,)."""
    import numpy as np
    import jax.numpy as jnp
    from .ops.fwdback import CountModel, tokenize_batch
    from .ops import dp2d
    from .ops.semiring import LOGSUMEXP
    import jax

    m = _machine(machine)
    ev = EvaluatedMachine(m, _params(params, m))
    from .ops.lowering import LoweredMachine
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())
    pairs = [SeqPair(_seq(i), _seq(o)) for i, o in seq_pairs]
    it, ot, il, ol = tokenize_batch(ev, pairs)

    def one(i, o, li, lo):
        return dp2d.forward_2d(a_diag, a_left, a_up, closure, i, o, li, lo,
                               sr=LOGSUMEXP)

    return np.array(jax.jit(jax.vmap(one))(it, ot, il, ol))


def device_counts_batch(machine, seq_pairs, params=None, mesh=None):
    """Batched (optionally multi-chip) E-step counts."""
    from .parallel.em import device_counts
    m = _machine(machine)
    pairs = SeqPairList([SeqPair(_seq(i), _seq(o)) for i, o in seq_pairs])
    return device_counts(m, _params(params, m), pairs, mesh=mesh)


def fused_plan7_forward(hmm_path_or_model, transducer, out_seqs,
                        params=None, mode="plan7", local=True,
                        multihit=False, length=400.0):
    """Forward log-likelihoods of output sequences under (profile HMM
    generator) (x) (transducer), fused — no composite state space
    (ref python/machineboss/jax/fused_plan7.py; API.md:205-223).

    hmm_path_or_model: HMMER3 .hmm path or core.hmmer.HmmerModel;
    transducer: machine/file/JSON whose input alphabet covers the HMM's.
    Returns a list of floats (one per sequence in out_seqs)."""
    from .core.hmmer import HmmerModel
    from .ops.fused_plan7 import Plan7Fused
    hmm = hmm_path_or_model if isinstance(hmm_path_or_model, HmmerModel) \
        else HmmerModel.from_file(hmm_path_or_model)
    td = _machine(transducer)
    ev = EvaluatedMachine(td, _params(params, td))
    fused = Plan7Fused(hmm, ev, mode=mode, local=local, multihit=multihit,
                       length=length)
    return [fused.forward(list(s)) for s in out_seqs]
