#!/usr/bin/env python3
"""Measure engine crossover points and emit dispatch_table.json.

The reference documents its auto-strategy pathologies (ref
python/machineboss/jax/API.md:87-91 — e.g. jax_1d_optimal taking 200 s at
S=64, L=10000 on CPU because closure matmuls dominate). Our dispatch
thresholds must be measured, not guessed: this script times the competing
engines on the CURRENT backend over a small (S, L) grid and writes
machineboss_tpu/dispatch_table.json with the winning engine per cell plus
derived thresholds. CompiledMachine._strategy consults the table when its
backend matches; otherwise it falls back to the checked-in defaults.

Run: python scripts/autotune_dispatch.py   (~10-30 min on TPU, dominated
by compiles; re-run after kernel changes that shift the boundaries).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _time(fn, reps=3):
    """fn must RETURN the result array; timing forces a host readback
    (np.asarray) — on the axon remote runtime, block_until_ready alone
    returned ~0.1 ms for every workload regardless of size (measured:
    an 8192-step scan cannot take 0.1 ms), so readback is the only
    trustworthy completion barrier here."""
    np.asarray(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_random_transducer
    from machineboss_tpu.core.machine import Machine
    from machineboss_tpu.core.eval import EvaluatedMachine
    from machineboss_tpu.ops.lowering import LoweredMachine
    from machineboss_tpu.ops import dp1d, dp2d
    from machineboss_tpu.ops.wavefront_fast import forward_2d_wavefront_fast

    backend = jax.default_backend()
    rng = np.random.RandomState(0)
    table = {"backend": backend, "one_d": [], "two_d": []}

    # ---- 1D: assoc (log-depth transfer-matrix scan) vs sequential scan
    for S in (4, 16, 64, 128):
        gen = {"state": [
            {"id": "S%d" % s, "trans": [
                {"out": c, "to": int(rng.randint(0, S)),
                 "weight": round(float(rng.uniform(0.1, 0.5)), 4)}
                for c in "ACGT"] + [{"to": S, "weight": 0.05}]}
            for s in range(S)] + [{"id": "End", "trans": []}]}
        m = Machine.from_json(gen)
        ev = EvaluatedMachine(m, m.get_param_defs(True))
        lm = LoweredMachine(ev, dtype=np.float32)
        trans, closure = (jnp.array(x) for x in
                          lm.emit_matrices_1d(output_side=True))
        for L in (128, 512, 2048, 8192):
            toks = jnp.array(rng.randint(0, 4, L), jnp.int32)
            t_scan = _time(lambda: dp1d.forward_1d_scan(
                trans, closure, toks, L))
            t_assoc = _time(lambda: dp1d.forward_1d_assoc(
                trans, closure, toks, L))
            win = "assoc" if t_assoc < t_scan else "scan"
            table["one_d"].append({"S": S, "L": L, "scan_s": t_scan,
                                   "assoc_s": t_assoc, "winner": win})
            print("1D S=%d L=%d scan %.4fs assoc %.4fs -> %s"
                  % (S, L, t_scan, t_assoc, win), flush=True)

    # ---- 2D single pair: row scan vs jnp wavefront
    for S in (4, 16, 64):
        m = build_random_transducer(S, list("ACGT"))
        ev = EvaluatedMachine(m, m.get_param_defs(True))
        lm = LoweredMachine(ev, dtype=np.float32)
        a_diag, a_left, a_up, closure = (jnp.array(x) for x in
                                         lm.matrices_2d())
        for L in (16, 64, 256):
            it = jnp.array(rng.randint(0, 4, L), jnp.int32)
            ot = jnp.array(rng.randint(0, 4, L), jnp.int32)
            itb = it[None, :]
            otb = ot[None, :]
            lens = jnp.full((1,), L, jnp.int32)
            t_rows = _time(lambda: dp2d.forward_2d(
                a_diag, a_left, a_up, closure, it, ot, L, L))
            t_wave = _time(lambda: forward_2d_wavefront_fast(
                a_diag, a_left, a_up, closure, itb, otb, lens, lens))
            win = "wavefront" if t_wave < t_rows else "rows"
            table["two_d"].append({"S": S, "L": L, "rows_s": t_rows,
                                   "wavefront_s": t_wave, "winner": win})
            print("2D S=%d L=%d rows %.4fs wave %.4fs -> %s"
                  % (S, L, t_rows, t_wave, win), flush=True)

    # derived thresholds: smallest L where assoc wins per S (1D), and
    # whether wavefront dominates 2D on this backend
    assoc_min_l = {}
    for row in table["one_d"]:
        if row["winner"] == "assoc":
            s = str(row["S"])
            assoc_min_l[s] = min(assoc_min_l.get(s, 10**9), row["L"])
    wave_wins = [r["winner"] == "wavefront" for r in table["two_d"]]
    table["derived"] = {
        "assoc_min_L_by_S": assoc_min_l,
        "wavefront_2d": (sum(wave_wins) > len(wave_wins) // 2),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "machineboss_tpu", "dispatch_table.json")
    doc = {"backends": {}}
    if os.path.exists(out):
        try:
            with open(out) as f:
                prev = json.load(f)
            if "backends" in prev:
                doc = prev
            elif "backend" in prev:
                # migrate a legacy single-backend table instead of
                # dropping its measurements
                doc["backends"][prev["backend"]] = {
                    k: v for k, v in prev.items() if k != "backend"}
        except Exception:
            pass
    doc["backends"][backend] = table
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print("wrote", out, "backend", backend)


if __name__ == "__main__":
    main()
