"""Pallas wavefront kernel (interpret mode) vs host oracle."""

import json

import numpy as np

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops.pallas.wavefront_kernel import make_wavefront_forward

TOL = 1e-2


def test_pallas_wavefront_interpret():
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = lm.matrices_2d()
    B, Li, Lo = 8, 6, 7
    rng = np.random.RandomState(0)
    in_seqs = [["01"[c] for c in rng.randint(0, 2, rng.randint(1, Li + 1))]
               for _ in range(B)]
    out_seqs = [["01"[c] for c in rng.randint(0, 2, rng.randint(1, Lo + 1))]
                for _ in range(B)]
    it = np.zeros((B, Li), np.int32)
    ot = np.zeros((B, Lo), np.int32)
    il = np.zeros(B, np.int32)
    ol = np.zeros(B, np.int32)
    hosts = []
    for n, (i_s, o_s) in enumerate(zip(in_seqs, out_seqs)):
        ti = [ev.input_tokenizer.sym2tok[c] - 1 for c in i_s]
        to = [ev.output_tokenizer.sym2tok[c] - 1 for c in o_s]
        it[n, :len(ti)] = ti
        ot[n, :len(to)] = to
        il[n] = len(ti)
        ol[n] = len(to)
        hosts.append(ForwardMatrix(ev, SeqPair(
            NamedSeq("i", i_s), NamedSeq("o", o_s))).log_like())
    for merged, variant in ((False, None), (True, None),
                            (False, "seqscale")):
        for split in (False, True):
            if variant == "seqscale" and not split:
                continue
            fwd = make_wavefront_forward(ad, al, au, cl, B, Li, Lo,
                                         interpret=True, split=split,
                                         merged=merged, variant=variant)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot), jnp.array(il),
                               jnp.array(ol)))
            for n in range(B):
                if hosts[n] == -np.inf:
                    assert dev[n] < -1e20, (merged, split, n)
                else:
                    assert abs(dev[n] - hosts[n]) < TOL, \
                        (merged, split, n, hosts[n], dev[n])


def test_pallas_wavefront_chained_interpret():
    """Chained (sequence-packed) variant vs host oracle, uniform lengths."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import build_random_transducer
    alphabet = list("ACGT")
    m = build_random_transducer(6, alphabet, seed=7)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    ad, al, au, cl = lm.matrices_2d()
    for chain, nw, L in ((3, 4, 6), (1, 6, 5), (5, 1, 7)):
        B = chain * nw
        rng = np.random.RandomState(chain)
        it = rng.randint(0, 4, (B, L)).astype(np.int32)
        ot = rng.randint(0, 4, (B, L)).astype(np.int32)
        hosts = []
        for n in range(B):
            sp = SeqPair(NamedSeq("i", [alphabet[t] for t in it[n]]),
                         NamedSeq("o", [alphabet[t] for t in ot[n]]))
            hosts.append(ForwardMatrix(ev, sp).log_like())
        il = np.full(B, L, np.int32)
        ol = np.full(B, L, np.int32)
        for split in (False, True):
            fwd = make_wavefront_forward(ad, al, au, cl, B, L, L,
                                         interpret=True, split=split,
                                         variant="chained", chain=chain)
            dev = np.array(fwd(jnp.array(it), jnp.array(ot),
                               jnp.array(il), jnp.array(ol)))
            err = np.abs(dev - np.array(hosts)).max()
            assert err < TOL, (chain, split, err)
