"""End-to-end device alignment timing (the PERF.md banded-align metric).

Measures `--align --engine device`-equivalent wall time for one long pair:
fill + traceback + MachinePath construction, with the round-5 sparse
device traceback (default) vs the round-4 full-lattice readback
(SPARSE=0). Knobs: ALIGN_L (default 1500), ALIGN_S (64), ALIGN_WIDTH (16),
ALIGN_FULL=1 to also run the full-lattice (non-banded) align.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import build_random_transducer                    # noqa: E402
from machineboss_tpu.core.eval import EvaluatedMachine       # noqa: E402
from machineboss_tpu.core.seqpair import (SeqPair, NamedSeq,  # noqa: E402
                                          Envelope)
from machineboss_tpu.algo.viterbi_device import \
    device_viterbi_matrices                                   # noqa: E402


def main():
    L = int(os.environ.get("ALIGN_L", "1500"))
    S = int(os.environ.get("ALIGN_S", "64"))
    width = int(os.environ.get("ALIGN_WIDTH", "16"))
    sparse = os.environ.get("SPARSE", "1") != "0"
    m = build_random_transducer(S, list("ACGT"), seed=3)
    ev = EvaluatedMachine(m, m.get_param_defs(True))
    rng = np.random.RandomState(11)
    xs = [("ACGT")[c] for c in rng.randint(0, 4, L)]
    ys = list(xs)
    # mutate ~10% so the guide alignment is realistic but non-trivial
    for k in rng.choice(L, L // 10, replace=False):
        ys[k] = ("ACGT")[rng.randint(0, 4)]
    align = [(a, b) for a, b in zip(xs, ys)]
    spa = SeqPair(NamedSeq("x", xs), NamedSeq("y", ys), align)
    env = Envelope(spa, width=width)

    def run(envs, label):
        t0 = time.time()
        mat = device_viterbi_matrices(ev, [spa], envelopes=envs,
                                      sparse_traceback=sparse)[0]
        t1 = time.time()
        ll = mat.log_like()
        path = mat.path(m)
        t2 = time.time()
        fell_back = getattr(mat, "_full", None) is not None
        print("%s: fill+walk %.2fs traceback %.2fs TOTAL %.2fs  "
              "ll=%.4f steps=%d sparse=%s fallback=%s"
              % (label, t1 - t0, t2 - t1, t2 - t0, ll, len(path.trans),
                 sparse, fell_back), flush=True)
        return t2 - t0

    # warm-up compile on a small pair so timings exclude compilation
    xs0 = xs[:32]
    ys0 = ys[:32]
    sp0 = SeqPair(NamedSeq("x", xs0), NamedSeq("y", ys0),
                  [(a, b) for a, b in zip(xs0, ys0)])
    t0 = time.time()
    device_viterbi_matrices(ev, [sp0], envelopes=[Envelope(sp0, width)],
                            sparse_traceback=sparse)[0].path(m)
    print("warmup (L=32): %.1fs" % (time.time() - t0), flush=True)

    # twice: first timing includes any L-sized compiles, second is warm
    run([env], "banded L=%d width=%d (cold)" % (L, width))
    run([env], "banded L=%d width=%d (warm)" % (L, width))
    if os.environ.get("ALIGN_FULL", "0") == "1":
        run(None, "full-lattice L=%d (cold)" % L)
        run(None, "full-lattice L=%d (warm)" % L)


if __name__ == "__main__":
    main()
