"""Wavefront engines (log-domain and scaled-probability) vs the row-scan
engine and host oracle."""

import json

import numpy as np
import pytest

from conftest import REF

import jax.numpy as jnp

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.core.params import param_assign_from_json
from machineboss_tpu.core.eval import EvaluatedMachine
from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
from machineboss_tpu.algo.dp_host import ForwardMatrix
from machineboss_tpu.ops.lowering import LoweredMachine
from machineboss_tpu.ops.wavefront import forward_2d_wavefront
from machineboss_tpu.ops.wavefront_fast import forward_2d_wavefront_fast
from machineboss_tpu.ops.semiring import LOGSUMEXP

TOL = 1e-2


def _machine():
    m = Machine.from_file(REF + "/t/machine/bitstutter-noise.json")
    with open(REF + "/t/io/params.json") as f:
        params = param_assign_from_json(json.load(f))
    return m, params


@pytest.mark.parametrize("engine", [forward_2d_wavefront,
                                    forward_2d_wavefront_fast])
def test_wavefront_vs_host(engine):
    m, params = _machine()
    ev = EvaluatedMachine(m, params)
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())

    rng = np.random.RandomState(1)
    B, Li, Lo = 5, 9, 11
    in_seqs, out_seqs = [], []
    for _ in range(B):
        il = rng.randint(1, Li + 1)
        ol = rng.randint(1, Lo + 1)
        in_seqs.append(["01"[c] for c in rng.randint(0, 2, il)])
        out_seqs.append(["01"[c] for c in rng.randint(0, 2, ol)])

    hosts = []
    for i_s, o_s in zip(in_seqs, out_seqs):
        sp = SeqPair(NamedSeq("i", i_s), NamedSeq("o", o_s))
        hosts.append(ForwardMatrix(ev, sp).log_like())

    in_toks = np.zeros((B, Li), np.int32)
    out_toks = np.zeros((B, Lo), np.int32)
    il_arr = np.zeros(B, np.int32)
    ol_arr = np.zeros(B, np.int32)
    for n, (i_s, o_s) in enumerate(zip(in_seqs, out_seqs)):
        toks_i = [ev.input_tokenizer.sym2tok[c] - 1 for c in i_s]
        toks_o = [ev.output_tokenizer.sym2tok[c] - 1 for c in o_s]
        in_toks[n, :len(toks_i)] = toks_i
        out_toks[n, :len(toks_o)] = toks_o
        il_arr[n] = len(toks_i)
        ol_arr[n] = len(toks_o)

    if engine is forward_2d_wavefront:
        dev = engine(a_diag, a_left, a_up, closure, jnp.array(in_toks),
                     jnp.array(out_toks), jnp.array(il_arr),
                     jnp.array(ol_arr), sr=LOGSUMEXP)
    else:
        dev = engine(a_diag, a_left, a_up, closure, jnp.array(in_toks),
                     jnp.array(out_toks), jnp.array(il_arr),
                     jnp.array(ol_arr))
    dev = np.array(dev)
    for n in range(B):
        if hosts[n] == -np.inf:
            assert dev[n] < -1e20, (n, hosts[n], dev[n])
        else:
            assert abs(dev[n] - hosts[n]) < TOL, (n, hosts[n], dev[n])
