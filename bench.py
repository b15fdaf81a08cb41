#!/usr/bin/env python3
"""Benchmark: Forward DP state-cell throughput per chip.

Workloads (BENCH_WORKLOAD):
  dense    — mirrors the reference benchmark grid's largest 2D
           config (ref benchmarks/run_benchmarks.py:699-740): random dense
           DNA transducer, S=64, 200x200 pairs, batched on one chip.
  prot2dna (default) — the flagship BASELINE.json metric workload: the GeneWise-style
           prot2dna preset (S=132, 20 aa inputs x 4 nt outputs) scoring
           protein/DNA pairs (ref Makefile:228-232 preset build;
           BASELINE.md "DP cells/s/chip (Forward, prot2dna composed)").
  dense1d  — 1D Forward, the reference grid's largest 1D config (S=64,
           L=10000) where the reference's jax path took 200 s
           (ref benchmarks/results/wideboy.local.json); renormalized
           Kahan-scale scan, gated vs a float64 host oracle.
  viterbi  — Pallas MAXPLUS wavefront lattice fill + HBM write-back (the
           --align --engine device fill path, algo/viterbi_device.py),
           gated against a float64 max-plus host oracle.
  plan7    — fused Plan7 reads/s: fn3.hmm (86 nodes) x a batch of protein
           reads through a noisy identity transducer, scored WITHOUT
           materializing the composition (ref js/webgpu shaders/
           fused-plan7-batch.wgsl capability). vs_baseline reports the
           speedup of the prefix-product row solver over the
           associative_scan solver measured in the same run.

Every run gates accuracy: a subsample of the batch is re-scored by the
float64 host oracle (ops/host_oracle.py) and the device kernel must agree
within 0.01 nats (the reference's own cross-backend tolerance,
ref python/machineboss/jax/API.md:396-421) — a numerical regression fails
the bench loudly instead of silently reporting fast wrong numbers.

Baseline anchor: the reference's compiled-C++ single-core throughput,
201*201*64 cells / 0.0134 s = 193e6 state-cells/s (BASELINE.md).
Target: >= 50x per chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_S = 193e6  # compiled C++, single core, S=64 200x200

# standard genetic code (for sampling plausible DNA against prot2dna)
CODONS = {
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
    "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTG",
    "M": "ATG", "N": "AAT", "P": "CCG", "Q": "CAA", "R": "CGT",
    "S": "TCT", "T": "ACT", "V": "GTG", "W": "TGG", "Y": "TAT",
}


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


def _ragged_lens(rng, B, L):
    """Realistic read-batch raggedness: uniform in [L/2, L]."""
    return rng.randint(max(L // 2, 1), L + 1, B).astype(np.int32)


def dense_workload(S, L, B, ragged=False):
    """(lowered tensors, token batch, Li, Lo) for the dense DNA config."""
    import jax.numpy as jnp
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine

    alphabet = list("ACGT")
    machine = build_random_transducer(S, alphabet)
    ev = EvaluatedMachine(machine, machine.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    tensors = tuple(np.asarray(x) for x in lm.matrices_2d())

    rng = np.random.RandomState(0)
    in_toks = rng.randint(0, len(alphabet), (B, L)).astype(np.int32)
    out_toks = rng.randint(0, len(alphabet), (B, L)).astype(np.int32)
    # the dense grid machine is diag-only (every transition consumes one
    # input AND one output symbol), so a scoreable pair needs il == ol
    il = _ragged_lens(rng, B, L) if ragged else np.full(B, L, np.int32)
    return tensors, (jnp.array(in_toks), jnp.array(out_toks),
                     jnp.array(il), jnp.array(il)), L, L


def prot2dna_workload(Lp, B, mutate=0.0, ragged=False):
    """prot2dna preset scoring random proteins against codon-translated DNA.

    mutate > 0 substitutes bases at that rate — prot2dna models sequencing
    INDEL errors, not substitutions, so mutated pairs may be impossible
    (-inf); the default keeps every pair scoreable."""
    import jax.numpy as jnp
    from machineboss_tpu.core.presets import make_preset
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine

    m = make_preset("prot2dna")
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    tensors = tuple(np.asarray(x) for x in lm.matrices_2d())

    aas = sorted(CODONS)
    in_tok = {a: ev.input_tokenizer.sym2tok[a] - 1 for a in aas}
    out_tok = {c: ev.output_tokenizer.sym2tok[c] - 1 for c in "ACGT"}
    rng = np.random.RandomState(0)
    Lo = 3 * Lp
    it = np.zeros((B, Lp), np.int32)
    ot = np.zeros((B, Lo), np.int32)
    il = _ragged_lens(rng, B, Lp) if ragged else np.full(B, Lp, np.int32)
    for b in range(B):
        prot = [aas[i] for i in rng.randint(0, len(aas), Lp)]
        dna = list("".join(CODONS[a] for a in prot))
        muts = rng.random_sample(Lo) < mutate
        for i in np.where(muts)[0]:
            dna[i] = "ACGT"[rng.randint(0, 4)]
        it[b] = [in_tok[a] for a in prot]
        ot[b] = [out_tok[c] for c in dna]
    return tensors, (jnp.array(it), jnp.array(ot),
                     jnp.array(il), jnp.array(3 * il)), Lp, Lo


def plan7_workload_run(B, Lr, reps):
    """Fused Plan7 batch scoring: returns (reads_per_s, speedup_vs_scan)."""
    import time as _time
    from machineboss_tpu.core.hmmer import HmmerModel
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.fused_plan7 import Plan7Fused

    hmm = HmmerModel.from_file("/root/reference/t/hmmer/fn3.hmm")
    trans = []
    for a in hmm.alph:
        trans.append({"in": a, "out": a, "to": "loop", "weight": 0.03})
        trans.append({"in": a, "to": "loop", "weight": 0.005})
    trans.append({"out": hmm.alph[0], "to": "loop", "weight": 0.01})
    trans.append({"to": "end", "weight": 0.28})
    td = Machine.from_json({"state": [
        {"id": "loop", "trans": trans}, {"id": "end", "trans": []}]})
    td_ev = EvaluatedMachine(td, td.get_param_defs(True))

    rng = np.random.RandomState(0)
    reads = ["".join(hmm.alph[i] for i in rng.randint(0, len(hmm.alph), Lr))
             for _ in range(B)]
    from machineboss_tpu.ops.fwdback import pad_bucket
    s2t = td_ev.output_tokenizer.sym2tok
    Lo_pad = pad_bucket(Lr, base=16)     # same bucket forward_batch uses
    toks = np.ones((B, Lo_pad), np.int32)
    toks[:, :Lr] = np.array([[s2t[c] for c in r] for r in reads],
                            np.int32)
    lens = np.full(B, Lr, np.int32)

    prob = os.environ.get("BENCH_PLAN7_PROB", "0") != "0"

    def run(solver):
        f = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True,
                       solver=solver, prob_space=prob)
        impl = "flat" if solver == "prefix" else "vmap"
        out = f.forward_batch_tokens(toks, lens, impl=impl)
        assert np.all(np.isfinite(out)), "non-finite plan7 scores"
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            out2 = f.forward_batch_tokens(toks, lens, impl=impl)
            ts.append(_time.perf_counter() - t0)
        return out, min(ts)

    out_p, t_prefix = run("prefix")
    out_s, t_scan = run("scan")
    err = np.abs(out_p - out_s).max()
    sys.stderr.write("plan7 gate: max |prefix - scan| = %.2e nats; "
                     "prefix %.4fs scan %.4fs\n" % (err, t_prefix, t_scan))
    if err > 0.01:
        raise SystemExit("PLAN7 GATE FAILED: %.3e nats" % err)

    # steady-state serving throughput: pipeline a stream of batches so
    # the ~24 ms per-invocation floor overlaps with device compute
    # (Plan7Fused.forward_stream); BENCH_PLAN7_STREAM=0 restores the
    # blocking single-batch metric
    n_stream = int(os.environ.get("BENCH_PLAN7_STREAM", "8"))
    if n_stream > 1:
        f = Plan7Fused(hmm, td_ev, mode="plan7", multihit=True,
                       solver="prefix", prob_space=prob)
        # the stream metric uses impl='auto' — on TPU backends that is
        # the VMEM-resident Pallas kernel (PERF.md round 5); gate it
        # against the prefix solver within the 0.01-nat contract
        out_k = f.forward_batch_tokens(toks, lens)
        errk = np.abs(out_k - out_p).max()
        sys.stderr.write("plan7 kernel gate: max |auto-impl - prefix| "
                         "= %.2e nats\n" % errk)
        if errk > 0.01:
            raise SystemExit("PLAN7 KERNEL GATE FAILED: %.3e" % errk)
        batches = [(toks, lens)] * n_stream
        outs = f.forward_stream(batches)           # warmup + compile
        assert np.allclose(outs[0], out_p, atol=1e-2)
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            f.forward_stream(batches)
            ts.append(_time.perf_counter() - t0)
        t_stream = min(ts) / n_stream
        sys.stderr.write("plan7 stream: %.4fs/batch over %d pipelined "
                         "(blocking %.4fs)\n"
                         % (t_stream, n_stream, t_prefix))
        return B / t_stream, t_scan / t_stream
    return B / t_prefix, t_scan / t_prefix


def dense1d_workload_run(S, L, B, reps, n_check):
    """1D Forward over a random dense generator — the reference grid's
    LARGEST 1D config (S=64, L=10000), where the reference's own jax
    1D-optimal path pathologically took 200 s on CPU (ref
    benchmarks/results/wideboy.local.json; SURVEY.md §6). Baseline:
    compiled C++ 1D, 10000*64 / 0.0042 s = 152 M cells/s single-core.
    Returns (cells/s, baseline_cells_per_s)."""
    import jax
    import jax.numpy as jnp
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine
    from machineboss_tpu.ops.dp1d import forward_1d_scan

    rng = np.random.RandomState(42)
    states = []
    for s in range(S):
        trans = [{"out": c, "to": int(rng.randint(0, S - 1)),
                  "weight": round(float(rng.uniform(0.1, 1.0)), 4)}
                 for c in "ACGT" for _ in range(1)]
        trans.append({"to": S, "weight": 0.05})
        states.append({"id": "S%d" % s, "trans": trans})
    states.append({"id": "End", "trans": []})
    m = Machine.from_json({"state": states})
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    trans, closure = (np.asarray(x) for x in
                      lm.emit_matrices_1d(output_side=True))

    toks = rng.randint(0, trans.shape[0], (B, L)).astype(np.int32)
    lens = np.full(B, L, np.int32)
    tj, cj = jnp.array(trans), jnp.array(closure)

    # default = the Pallas VMEM-resident scan kernel (ops/pallas/
    # scan1d_kernel.py). BENCH_1D=blocked selects the host-exact k-token
    # block-table engine (gate-clean but XLA gather-bound — PERF.md);
    # BENCH_1D=scan the per-sequence log-space scan; BENCH_1D=probs the
    # known-biased wide-matmul engine (see its docstring).
    engine_1d = os.environ.get("BENCH_1D", "pallas")
    if engine_1d == "pallas":
        from machineboss_tpu.ops.pallas.scan1d_kernel import \
            make_forward_1d_pallas
        fwd = make_forward_1d_pallas(
            trans, closure, B, L,
            unroll=int(os.environ.get("BENCH_1D_UNROLL", "8")),
            renorm_every=int(os.environ.get("BENCH_1D_RENORM", "4")))
    elif engine_1d == "probs":
        from machineboss_tpu.ops.dp1d import forward_1d_scan_probs_batch
        fwd = jax.jit(lambda t, ln: forward_1d_scan_probs_batch(
            tj, cj, t, ln))
    elif engine_1d == "blocked":
        from machineboss_tpu.ops.dp1d import make_forward_1d_blocked
        fwd = make_forward_1d_blocked(tj, cj)
    else:
        fwd = jax.jit(jax.vmap(lambda t, ln: forward_1d_scan(tj, cj, t,
                                                             ln)))
    # the pallas engine's final f64 combine runs on host and returns
    # numpy; jnp engines return device arrays — normalize
    lls = np.asarray(fwd(jnp.array(toks), jnp.array(lens)))
    assert np.all(np.isfinite(lls)), "non-finite 1D log-likelihoods"

    # float64 host oracle on a subsample
    t64, c64 = (np.asarray(x, np.float64) for x in (trans, closure))
    errs = []
    for b in range(min(n_check, B)):
        f = np.full(t64.shape[-1], -np.inf)
        f[0] = 0.0
        f = _np_lse_vecmat(f, c64)
        for p in range(L):
            f = _np_lse_vecmat(f, t64[toks[b, p]])
        errs.append(abs(float(f[-1]) - float(lls[b])))
    max_err = max(errs)
    sys.stderr.write("1d gate: max |device - f64 oracle| = %.2e nats "
                     "over %d seqs\n" % (max_err, len(errs)))
    if max_err > 0.01:
        raise SystemExit("1D GATE FAILED: %.3e nats" % max_err)

    times = []
    tj_, lj_ = jnp.array(toks), jnp.array(lens)
    stream = (os.environ.get("BENCH_1D_STREAM", "1") != "0"
              and hasattr(fwd, "device_call"))
    if stream:
        # steady-state pipelined throughput: enqueue every rep before
        # blocking, so the ~15-24 ms per-invocation dispatch floor of
        # this runtime overlaps with device compute — the same
        # measurement the plan7 workload reports (PERF.md round 4);
        # BENCH_1D_STREAM=0 restores the per-call blocking metric
        np.asarray(fwd(tj_, lj_))                       # warm
        t0 = time.perf_counter()
        outs = [fwd.device_call(tj_, lj_) for _ in range(max(reps, 4))]
        jax.block_until_ready(outs[-1])
        times = [(time.perf_counter() - t0) / max(reps, 4)]
    else:
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fwd(tj_, lj_))
            times.append(time.perf_counter() - t0)
    S_real = trans.shape[-1]
    return B * L * S_real / min(times), 10000 * 64 / 0.0042


def _np_lse_vecmat(f, m):
    fm = f.max()
    if not np.isfinite(fm):
        return np.full(m.shape[-1], -np.inf)
    p = np.exp(f - fm) @ np.where(np.isfinite(m), np.exp(m), 0.0)
    with np.errstate(divide="ignore"):
        return np.where(p > 0, np.log(p) + fm, -np.inf)


def viterbi_workload_run(S, L, B, reps, n_check):
    """Pallas MAXPLUS wavefront lattice fill: returns (cells/s, gate_err).

    Unlike the Forward bench (scalar readout per pair), the Viterbi kernel
    returns the FULL value lattice (the host traceback needs it, see
    algo/viterbi_device.py), so throughput includes the HBM lattice
    write-back — the honest cost of `--align --engine device`."""
    import jax.numpy as jnp
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine
    from machineboss_tpu.ops.pallas.viterbi_kernel import \
        make_wavefront_viterbi
    from machineboss_tpu.ops.wavefront import lattice_from_diagonals
    from machineboss_tpu.ops.host_oracle import viterbi_2d_f64

    machine = build_random_transducer(S, list("ACGT"))
    ev = EvaluatedMachine(machine, machine.get_param_defs(True))
    lm = LoweredMachine(ev, dtype=np.float32)
    mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))

    rng = np.random.RandomState(0)
    it = jnp.array(rng.randint(0, 4, (B, L)).astype(np.int32))
    ot = jnp.array(rng.randint(0, 4, (B, L)).astype(np.int32))
    vit = make_wavefront_viterbi(*mats, B, L, L)
    out = vit(it, ot)
    out.block_until_ready()

    S_real = mats[3].shape[0]
    lat = lattice_from_diagonals(np.asarray(out), L, L)  # (B, L+1, L+1, S)
    errs = []
    for b in range(min(n_check, B)):
        ref = viterbi_2d_f64(*mats, np.asarray(it[b]), np.asarray(ot[b]))
        dev = float(lat[b, L, L, S_real - 1])
        if ref > -1e29:
            errs.append(abs(dev - ref))
        else:
            # oracle says impossible: agreement = device also log-zero
            errs.append(0.0 if dev < -1e29 else float("inf"))
    max_err = max(errs) if errs else 0.0
    sys.stderr.write("viterbi gate: max |device - f64 oracle| = %.2e nats "
                     "over %d pairs\n" % (max_err, len(errs)))
    if not np.isfinite(max_err) or max_err > 0.01:
        raise SystemExit("VITERBI GATE FAILED: %.3e nats" % max_err)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        vit(it, ot).block_until_ready()
        times.append(time.perf_counter() - t0)
    return B * (L + 1) * (L + 1) * S_real / min(times)


def accuracy_gate(tensors, batch, lls, n_check, tol=0.01):
    """Device log-likelihoods must match the float64 host oracle."""
    from machineboss_tpu.ops.host_oracle import forward_2d_f64
    a_diag, a_left, a_up, closure = (np.asarray(t, np.float64)
                                     for t in tensors)
    it, ot, il, ol = (np.asarray(x) for x in batch)
    errs = []
    for b in range(min(n_check, len(lls))):
        ref = forward_2d_f64(a_diag, a_left, a_up, closure,
                             it[b][:il[b]], ot[b][:ol[b]])
        dev = float(lls[b])
        if ref <= -1e29 or dev <= -1e29:
            # impossible pair: both sides must agree it is impossible
            errs.append(0.0 if (ref <= -1e29 and dev <= -1e29)
                        else float("inf"))
        else:
            errs.append(abs(dev - ref))
    max_err = max(errs)
    sys.stderr.write("accuracy gate: max |device - f64 oracle| = %.2e nats "
                     "over %d pairs (tol %.2g)\n"
                     % (max_err, len(errs), tol))
    if not np.isfinite(max_err) or max_err > tol:
        raise SystemExit("ACCURACY GATE FAILED: %.3e nats > %.2g"
                         % (max_err, tol))


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

    # default = the flagship BASELINE.json metric ("Forward, prot2dna
    # composed"); dense/plan7/ragged variants via BENCH_WORKLOAD
    workload = os.environ.get("BENCH_WORKLOAD", "prot2dna")
    S = int(os.environ.get("BENCH_S", "64"))
    L = int(os.environ.get("BENCH_L", "200"))
    B = int(os.environ.get("BENCH_B", "512"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    n_check = int(os.environ.get("BENCH_CHECK", "8"))

    if workload == "dense1d":
        L1 = int(os.environ.get("BENCH_L", "10000"))
        B1 = int(os.environ.get("BENCH_B", "256"))
        cells_per_s, base = dense1d_workload_run(S, L1, B1, reps, n_check)
        result = {"metric": "forward_1d_state_cells_per_s_per_chip",
                  "value": round(cells_per_s, 1), "unit": "cells/s",
                  "vs_baseline": round(cells_per_s / base, 3)}
        print(json.dumps(result))
        return result

    if workload == "viterbi":
        # MAXPLUS lattice fill incl. HBM write-back (the --align device
        # path); smaller B/L defaults keep the returned lattice in memory
        Lv = int(os.environ.get("BENCH_L", "128"))
        Bv = int(os.environ.get("BENCH_B", "64"))
        cells_per_s = viterbi_workload_run(S, Lv, Bv, reps, n_check)
        result = {"metric": "viterbi_dp_state_cells_per_s_per_chip",
                  "value": round(cells_per_s, 1), "unit": "cells/s",
                  "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S,
                                       3)}
        print(json.dumps(result))
        return result

    if workload == "plan7":
        Lr = int(os.environ.get("BENCH_LR", "90"))
        # measured: 256 -> 7.0k, 1024 -> 13.3k, 4096 -> 16.0k reads/s;
        # 1024 balances throughput against the B=4096 compile time
        B = int(os.environ.get("BENCH_B", "1024"))
        reads_per_s, speedup = plan7_workload_run(B, Lr, reps)
        result = {"metric": "fused_plan7_reads_per_s_per_chip",
                  "value": round(reads_per_s, 1), "unit": "reads/s",
                  "vs_baseline": round(speedup, 3)}
        print(json.dumps(result))
        return result

    ragged = os.environ.get("BENCH_RAGGED", "0") == "1"
    if workload == "prot2dna":
        Lp = int(os.environ.get("BENCH_LP", "64"))
        # measured (PERF.md): 256 -> 11.0 G, 512 -> 18.0 G cells/s; the
        # per-step scheduling cost amortizes over lanes until VMEM limits
        B = int(os.environ.get("BENCH_B", "512"))
        tensors, batch, Li, Lo = prot2dna_workload(Lp, B, ragged=ragged)
        S_real = tensors[3].shape[0]
        metric = "forward_dp_state_cells_per_s_per_chip_prot2dna"
    else:
        tensors, batch, Li, Lo = dense_workload(S, L, B, ragged=ragged)
        S_real = tensors[3].shape[0]
        metric = "forward_dp_state_cells_per_s_per_chip"
    if ragged:
        metric += "_ragged"

    a_diag, a_left, a_up, closure = tensors
    in_toks, out_toks, in_lens, out_lens = batch

    engine = os.environ.get("BENCH_ENGINE", "pallas")
    merged = os.environ.get("BENCH_MERGED", "1") == "1"
    n_chunks = int(os.environ.get("BENCH_NCHUNKS", "0")) or None
    split = os.environ.get("BENCH_SPLIT", "1") == "1"
    variant = os.environ.get("BENCH_VARIANT") or None
    if "BENCH_VARIANT" not in os.environ:
        # measured defaults (PERF.md): lowrank (closure-folded, pruned,
        # min-rank factored) is the flagship prot2dna kernel; chained
        # packs ~2x lane occupancy on the uniform-length dense grid but
        # requires uniform lengths, so ragged dense falls back to merged
        if workload == "prot2dna":
            variant = "lowrank"
        else:
            # round-4: the RAGGED chained kernel (per-chain stagger,
            # streamed metadata) lifts ragged dense off the merged
            # fallback — uniform batches keep the plain chained kernel
            variant = "chained_ragged" if ragged else "chained"
    chain = int(os.environ.get("BENCH_CHAIN", "0")) or None
    if chain is None and variant in ("chained", "chained_ragged"):
        chain = 8
    if ragged:
        assert variant != "chained" and not (
            variant == "lowrank" and chain), \
            "the uniform chained variant needs uniform lengths"
    n_buckets = int(os.environ.get("BENCH_BUCKETS", "1"))
    run = None
    if engine == "pallas":
        try:
            from machineboss_tpu.ops.pallas.wavefront_kernel import \
                make_wavefront_forward
            if ragged and n_buckets >= 2:
                # length-bucketed ragged batching: one kernel per length
                # quantile group, so short pairs stop paying for the
                # longest pair's lattice (API analog:
                # dispatch.log_forward_batch(bucket=True))
                il_h = np.asarray(in_lens)
                ol_h = np.asarray(out_lens)
                it_h = np.asarray(in_toks)
                ot_h = np.asarray(out_toks)
                qs = np.quantile(il_h,
                                 np.linspace(0, 1, n_buckets + 1)[1:-1])
                assign = np.searchsorted(qs, il_h, side="left")
                groups = []
                for g in range(n_buckets):
                    idx = np.where(assign == g)[0]
                    if not len(idx):
                        continue
                    li_g = int(il_h[idx].max())
                    lo_g = int(ol_h[idx].max())
                    nb = -(-len(idx) // 64) * 64    # pad group to x64
                    pad = np.concatenate(
                        [idx, np.repeat(idx[-1], nb - len(idx))])
                    hint_g = None
                    if variant == "chained_ragged":
                        from machineboss_tpu.ops.pallas                             .wavefront_kernel import ragged_span
                        hint_g = ragged_span(il_h[pad], ol_h[pad],
                                             chain)
                    fwd_g = make_wavefront_forward(
                        a_diag, a_left, a_up, closure, nb, li_g, lo_g,
                        merged=merged, n_chunks=n_chunks, split=split,
                        variant=variant, chain=chain,
                        n_abs_hint=hint_g)
                    args = (jnp.array(it_h[pad][:, :li_g]),
                            jnp.array(ot_h[pad][:, :lo_g]),
                            jnp.array(il_h[pad]),
                            jnp.array(ol_h[pad]))
                    groups.append((idx, len(idx), fwd_g, args))
                sys.stderr.write(
                    "buckets: %s\n" % [(len(i), a[0].shape[1],
                                        a[1].shape[1])
                                       for i, _, _, a in groups])

                def run():
                    # enqueue every group's device call before pulling
                    # any result (one batched device_get): the groups
                    # otherwise serialize on the per-invocation floor
                    devs = [(idx, n_real, fwd_g(*args))
                            for idx, n_real, fwd_g, args in groups]
                    host = jax.device_get([d for _, _, d in devs])
                    out = np.empty(B, np.float32)
                    for (idx, n_real, _), vals in zip(devs, host):
                        out[idx] = np.asarray(vals)[:n_real]
                    return jnp.array(out)
            else:
                hint = None
                if variant == "chained_ragged":
                    from machineboss_tpu.ops.pallas.wavefront_kernel \
                        import ragged_span
                    hint = ragged_span(np.asarray(in_lens),
                                       np.asarray(out_lens), chain)
                    sys.stderr.write("ragged span: %d (worst case %d)\n"
                                     % (hint, (Lo + 2) * (chain - 1)
                                        + Li + Lo + 1))
                fwd = make_wavefront_forward(a_diag, a_left, a_up,
                                             closure, B, Li, Lo,
                                             merged=merged,
                                             n_chunks=n_chunks,
                                             split=split,
                                             variant=variant, chain=chain,
                                             rescale_every=int(os.environ.get(
                                                 "BENCH_RESCALE", "4")),
                                             n_abs_hint=hint)

                def run():
                    return fwd(in_toks, out_toks, in_lens, out_lens)

            run().block_until_ready()
        except Exception as e:  # pragma: no cover - fallback path
            sys.stderr.write("pallas engine unavailable (%s); falling back"
                             " to jnp wavefront\n" % e)
            run = None
    if run is None:
        from machineboss_tpu.ops.wavefront_fast import \
            forward_2d_wavefront_fast
        td = (jnp.array(a_diag), jnp.array(a_left), jnp.array(a_up),
              jnp.array(closure))

        def run():
            return forward_2d_wavefront_fast(*td, in_toks, out_toks,
                                             in_lens, out_lens)

    # warmup/compile
    out = run()
    out.block_until_ready()
    lls = np.array(out)
    assert np.all(np.isfinite(lls)), "non-finite benchmark log-likelihoods"
    assert np.all(lls > -1e29), "impossible pairs in benchmark batch"
    if n_check:
        accuracy_gate(tensors, batch, lls, n_check)

    times = []
    from machineboss_tpu.utils.profiling import trace_if
    with trace_if(os.environ.get("BENCH_PROFILE")):
        for _ in range(reps):
            t0 = time.perf_counter()
            run().block_until_ready()
            times.append(time.perf_counter() - t0)
    t = min(times)

    # state-cells: the reference counts (Li+1)(Lo+1) * S per pair; ragged
    # batches count only each pair's REAL lattice (no padding credit)
    if ragged:
        il_h = np.asarray(in_lens, np.int64)
        ol_h = np.asarray(out_lens, np.int64)
        cells = int(((il_h + 1) * (ol_h + 1)).sum()) * S_real
    else:
        cells = B * (Li + 1) * (Lo + 1) * S_real
    cells_per_s = cells / t
    result = {
        "metric": metric,
        "value": round(cells_per_s, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
