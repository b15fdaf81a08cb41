#!/usr/bin/env python3
"""Benchmark grid harness (equivalent of the reference's
benchmarks/run_benchmarks.py grid): random DNA machines, 1D and 2D Forward/
Viterbi across S x L, timed per backend. Results are written as JSON rows
compatible with cross-run comparison.

Backends:
  host_interp       exact float64 host DP (the oracle)
  device_scan       jnp sequential scan engines
  device_assoc      jnp associative-scan engines (1D)
  device_wavefront  jnp anti-diagonal engine (2D, batched)
  pallas            Pallas VMEM-resident wavefront kernel (2D, batched)

Usage: python benchmarks/run_benchmarks.py [--quick] [--backends a,b,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

GRID_1D = {"L": [100, 500, 2000, 10000], "S": [4, 16, 64]}
GRID_2D = {"L": [10, 50, 200], "S": [4, 16, 64]}
ALPHABET = list("ACGT")


def random_generator_machine(n_states, rng):
    from machineboss_tpu.core.machine import Machine
    states = []
    for s in range(n_states + 1):
        if s == n_states:
            states.append({"id": "End", "trans": []})
            continue
        trans = []
        for sym in ALPHABET:
            dest = int(rng.randint(0, n_states - 1))
            trans.append({"out": sym, "to": dest,
                          "weight": round(float(rng.uniform(0.1, 1.0)), 4)})
        trans.append({"to": n_states,
                      "weight": round(float(rng.uniform(0.01, 0.1)), 4)})
        states.append({"id": "S%d" % s, "trans": trans})
    return Machine.from_json({"state": states})


def random_transducer_machine(n_states, rng):
    from bench import build_random_transducer
    return build_random_transducer(n_states, ALPHABET,
                                   seed=int(rng.randint(0, 1 << 30)))


def time_call(fn, reps=3):
    fn()  # warmup / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backends", default="host_interp,device_scan,"
                    "device_assoc,device_wavefront")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    backends = args.backends.split(",")

    import jax.numpy as jnp
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.core.seqpair import SeqPair, NamedSeq
    from machineboss_tpu.algo.dp_host import ForwardMatrix, ViterbiMatrix
    from machineboss_tpu.ops.lowering import LoweredMachine
    from machineboss_tpu.ops import dp1d, dp2d
    from machineboss_tpu.ops.semiring import LOGSUMEXP, MAXPLUS

    rng = np.random.RandomState(42)
    results = []
    grid_1d = {"L": [100, 500], "S": [4, 16]} if args.quick else GRID_1D
    grid_2d = {"L": [10, 50], "S": [4, 16]} if args.quick else GRID_2D

    # ---- 1D -------------------------------------------------------------
    for S in grid_1d["S"]:
        m = random_generator_machine(S, rng)
        ev = EvaluatedMachine(m, m.get_param_defs(True))
        lm = LoweredMachine(ev, dtype=np.float32)
        for algo, sr, sr_name in (("Forward", LOGSUMEXP, "logsumexp"),
                                  ("Viterbi", MAXPLUS, "maxplus")):
            trans, closure = lm.emit_matrices_1d(
                output_side=True, semiring=sr_name)
            transj, closj = jnp.array(trans), jnp.array(closure)
            for L in grid_1d["L"]:
                seq = rng.randint(0, len(ALPHABET), L)
                toks = jnp.array(seq, jnp.int32)
                syms = [ALPHABET[c] for c in seq]
                sp = SeqPair(NamedSeq("i", []), NamedSeq("o", syms))
                cells = (L + 1) * (S + 1)
                if "host_interp" in backends and L <= 2000:
                    mat_cls = (ForwardMatrix if algo == "Forward"
                               else ViterbiMatrix)
                    t = time_call(lambda: mat_cls(ev, sp).log_like())
                    results.append(dict(problem="1D", algo=algo, S=S, L=L,
                                        backend="host_interp", time=t,
                                        cells_per_s=cells / t))
                if "device_scan" in backends:
                    def run_scan():
                        dp1d.forward_1d_scan(transj, closj, toks, L,
                                             sr=sr).block_until_ready()
                    t = time_call(run_scan)
                    results.append(dict(problem="1D", algo=algo, S=S, L=L,
                                        backend="device_scan", time=t,
                                        cells_per_s=cells / t))
                if "device_assoc" in backends and algo == "Forward":
                    def run_assoc():
                        dp1d.forward_1d_assoc(transj, closj, toks, L,
                                              sr=sr).block_until_ready()
                    t = time_call(run_assoc)
                    results.append(dict(problem="1D", algo=algo, S=S, L=L,
                                        backend="device_assoc", time=t,
                                        cells_per_s=cells / t))
                print(json.dumps(results[-1]), flush=True)

    # ---- 2D -------------------------------------------------------------
    for S in grid_2d["S"]:
        m = random_transducer_machine(S, rng)
        ev = EvaluatedMachine(m, m.get_param_defs(True))
        lm = LoweredMachine(ev, dtype=np.float32)
        for algo, sr, sr_name in (("Forward", LOGSUMEXP, "logsumexp"),
                                  ("Viterbi", MAXPLUS, "maxplus")):
            a_diag, a_left, a_up, closure = lm.matrices_2d(sr_name)
            tensors = tuple(jnp.array(x)
                            for x in (a_diag, a_left, a_up, closure))
            for L in grid_2d["L"]:
                in_seq = rng.randint(0, len(ALPHABET), L)
                out_seq = rng.randint(0, len(ALPHABET), L)
                it = jnp.array(in_seq, jnp.int32)
                ot = jnp.array(out_seq, jnp.int32)
                cells = (L + 1) * (L + 1) * (S + 1)
                if "host_interp" in backends and L <= 50:
                    sp = SeqPair(NamedSeq("i", [ALPHABET[c] for c in in_seq]),
                                 NamedSeq("o", [ALPHABET[c] for c in out_seq]))
                    mat_cls = (ForwardMatrix if algo == "Forward"
                               else ViterbiMatrix)
                    t = time_call(lambda: mat_cls(ev, sp).log_like())
                    results.append(dict(problem="2D", algo=algo, S=S, L=L,
                                        backend="host_interp", time=t,
                                        cells_per_s=cells / t))
                if "device_scan" in backends:
                    def run2():
                        dp2d.forward_2d(*tensors, it, ot, L, L,
                                        sr=sr).block_until_ready()
                    t = time_call(run2)
                    results.append(dict(problem="2D", algo=algo, S=S, L=L,
                                        backend="device_scan", time=t,
                                        cells_per_s=cells / t))
                if "device_wavefront" in backends and algo == "Forward":
                    from machineboss_tpu.ops.wavefront_fast import \
                        forward_2d_wavefront_fast
                    B = 8
                    itb = jnp.tile(it[None], (B, 1))
                    otb = jnp.tile(ot[None], (B, 1))
                    lens = jnp.full((B,), L, jnp.int32)

                    def runw():
                        forward_2d_wavefront_fast(
                            *tensors, itb, otb, lens,
                            lens).block_until_ready()
                    t = time_call(runw)
                    results.append(dict(problem="2D", algo=algo, S=S, L=L,
                                        backend="device_wavefront", time=t,
                                        cells_per_s=B * cells / t))
                print(json.dumps(results[-1]), flush=True)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
