#!/usr/bin/env python3
"""Benchmark: Forward DP state-cell throughput per chip.

Workload mirrors the reference benchmark grid's largest 2D config
(ref: benchmarks/run_benchmarks.py:699-740): random dense DNA transducer,
S=64, 200x200 sequence pairs, Forward algorithm — run batched on one TPU
chip through the wavefront engine.

Baseline anchor: the reference's compiled-C++ single-core throughput on the
same config, 201*201*64 cells / 0.0134 s = 193e6 state-cells/s
(BASELINE.md). Target: >= 50x per chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_S = 193e6  # compiled C++, single core, S=64 200x200


def build_random_transducer(n_states, alphabet, seed=42):
    """Random dense transducer in the reference benchmark's shape."""
    from machineboss_tpu.core.machine import Machine
    rng = np.random.RandomState(seed)
    states = []
    for s in range(n_states + 1):
        if s == n_states:
            states.append({"id": "End", "trans": []})
            continue
        trans = []
        for in_sym in alphabet:
            for out_sym in alphabet:
                dest = int(rng.randint(0, n_states - 1))
                w = round(float(rng.uniform(0.1, 1.0)), 4)
                trans.append({"in": in_sym, "out": out_sym, "to": dest,
                              "weight": w})
        trans.append({"to": n_states,
                      "weight": round(float(rng.uniform(0.01, 0.1)), 4)})
        states.append({"id": "S%d" % s, "trans": trans})
    return Machine.from_json({"state": states})


def main():
    import jax
    # persistent compilation cache: the pallas kernel's first compile is
    # minutes; cached runs start in seconds
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine
    from machineboss_tpu.ops.semiring import LOGSUMEXP

    S = int(os.environ.get("BENCH_S", "64"))
    L = int(os.environ.get("BENCH_L", "200"))
    B = int(os.environ.get("BENCH_B", "512"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    alphabet = list("ACGT")

    machine = build_random_transducer(S, alphabet)
    ev = EvaluatedMachine(machine, machine.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    a_diag, a_left, a_up, closure = (jnp.array(x) for x in lm.matrices_2d())

    rng = np.random.RandomState(0)
    in_toks = jnp.array(rng.randint(0, len(alphabet), (B, L)), jnp.int32)
    out_toks = jnp.array(rng.randint(0, len(alphabet), (B, L)), jnp.int32)
    in_lens = jnp.full((B,), L, jnp.int32)
    out_lens = jnp.full((B,), L, jnp.int32)

    engine = os.environ.get("BENCH_ENGINE", "pallas")
    merged = os.environ.get("BENCH_MERGED", "1") == "1"
    n_chunks = int(os.environ.get("BENCH_NCHUNKS", "0")) or None
    split = os.environ.get("BENCH_SPLIT", "1") == "1"
    variant = os.environ.get("BENCH_VARIANT") or None
    chain = int(os.environ.get("BENCH_CHAIN", "8"))
    run = None
    if engine == "pallas":
        try:
            from machineboss_tpu.ops.pallas.wavefront_kernel import \
                make_wavefront_forward
            fwd = make_wavefront_forward(np.array(a_diag),
                                         np.array(a_left),
                                         np.array(a_up), np.array(closure),
                                         B, L, L, merged=merged,
                                         n_chunks=n_chunks, split=split,
                                         variant=variant, chain=chain)

            def run():
                return fwd(in_toks, out_toks, in_lens, out_lens)

            run().block_until_ready()
        except Exception as e:  # pragma: no cover - fallback path
            import sys
            sys.stderr.write("pallas engine unavailable (%s); falling back"
                             " to jnp wavefront\n" % e)
            run = None
    if run is None:
        from machineboss_tpu.ops.wavefront_fast import \
            forward_2d_wavefront_fast

        def run():
            return forward_2d_wavefront_fast(a_diag, a_left, a_up, closure,
                                             in_toks, out_toks, in_lens,
                                             out_lens)

    # warmup/compile
    out = run()
    out.block_until_ready()
    lls = np.array(out)
    assert np.all(np.isfinite(lls)), "non-finite benchmark log-likelihoods"

    times = []
    from machineboss_tpu.utils.profiling import trace_if
    with trace_if(os.environ.get("BENCH_PROFILE")):
        for _ in range(reps):
            t0 = time.perf_counter()
            run().block_until_ready()
            times.append(time.perf_counter() - t0)
    t = min(times)

    # state-cells: the reference counts (L+1)^2 * S per pair
    cells = B * (L + 1) * (L + 1) * (S + 1)
    cells_per_s = cells / t
    result = {
        "metric": "forward_dp_state_cells_per_s_per_chip",
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
