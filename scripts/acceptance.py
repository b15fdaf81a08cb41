#!/usr/bin/env python3
"""Acceptance runs for the five BASELINE.json workload configs:

1. casino two-state HMM: Forward log-likelihood + Viterbi decode
2. PROSITE PS00001 aa-regex recognizer composed with a protein sequence
3. protpsw BLOSUM-style affine-gap pairwise protein alignment + traceback
4. GeneWise-style prot2dna composition: protein-to-DNA alignment
5. EM fitting + nanopore CTC-style decoding on examples/nanopore_test.csv

Each step prints PASS/FAIL with the key quantity. Exit code 0 iff all pass.
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

REF = "/root/reference"
RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        detail = fn()
        RESULTS.append((name, True, detail, time.time() - t0))
        print("PASS %-28s %6.1fs  %s" % (name, time.time() - t0, detail))
    except Exception as e:
        RESULTS.append((name, False, str(e), time.time() - t0))
        print("FAIL %-28s %6.1fs  %s" % (name, time.time() - t0, e))


def run_cli(args):
    from machineboss_tpu.cli import main
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        status = main(args)
    finally:
        sys.stdout = old
    if status != 0:
        raise RuntimeError("CLI failed: %s\n%s" % (args, out.getvalue()))
    return out.getvalue()


def casino():
    roll = "154233314562365566666655661521246"
    out = run_cli([REF + "/tutorial/casino.json", "--output-chars", roll,
                   "-L"])
    ll = float(out.strip()[2:-2].split(",")[-1])
    out_v = run_cli([REF + "/tutorial/casino.json", "--output-chars", roll,
                     "-A"])
    assert '"alignment"' in out_v
    return "forward LL %.3f, alignment produced" % ll


def prosite_regex():
    # PROSITE-style motifs as aa regexes scored against trp-cage:
    # PS00001 N-glycosylation N-{P}-[ST]-{P} (absent -> -inf) and
    # PS00005 PKC phosphorylation [ST]-x-[RK] (present -> finite)
    from machineboss_tpu.core.fastseq import read_fast_seqs
    seqs = read_fast_seqs(REF + "/examples/trp-cage.fa")
    seq = seqs[0].seq
    absent = run_cli(["--aa-regex", "N[^P][ST][^P]", "--input-chars", seq,
                      "-L"]).strip()
    present = run_cli(["--aa-regex", "[ST].[RK]", "--input-chars", seq,
                       "-L"]).strip()
    assert "-Infinity" in absent
    assert "-Infinity" not in present
    return "PS00001 absent (-inf), PS00005 present: %s" % \
        present.splitlines()[0][:36]


def protpsw():
    from machineboss_tpu.core.fastseq import read_fast_seqs
    seqs = read_fast_seqs(REF + "/examples/gp120.fa")
    a = seqs[0].seq[:80]
    b = seqs[0].seq[120:200]  # align two segments of gp120
    out = run_cli(["--preset", "protpsw", "-U", "--input-chars", a,
                   "--output-chars", b, "-L"])
    ll = float(out.strip()[1:-1].split(",")[-1].rstrip("]"))
    out_a = run_cli(["--preset", "protpsw", "-U", "--input-chars", a,
                     "--output-chars", b, "-A"])
    assert '"alignment"' in out_a
    return "protpsw 80aa pair LL %.2f + traceback" % ll


def prot2dna():
    out = run_cli(["--preset", "prot2dna", "-U", "--input-chars", "MKV",
                   "--output-chars", "ATGAAAGTG", "-L"])
    ll = float(out.strip()[1:-1].split(",")[-1].rstrip("]"))
    assert ll > -100
    return "GeneWise MKV->ATGAAAGTG LL %.2f" % ll


def nanopore_em():
    # small EM fit on the bitnoise channel (tkf91-style params fitting) and
    # a CTC-style beam decode through the nanopore CSV profile
    out = run_cli([REF + "/t/machine/bitnoise.json", "-N",
                   REF + "/t/io/pqcons.json", "-D",
                   REF + "/t/io/seqpairlist.json", "-T"])
    assert '"p":' in out
    decode = run_cli(["--recognize-csv", REF + "/examples/nanopore_test.csv",
                      "--beam-decode"])
    assert '"input"' in decode
    return "EM fit params + nanopore beam decode ok"


def main():
    check("casino-hmm", casino)
    check("prosite-regex", prosite_regex)
    check("protpsw-align", protpsw)
    check("prot2dna-genewise", prot2dna)
    check("nanopore-em-decode", nanopore_em)
    failed = [r for r in RESULTS if not r[1]]
    print("%d/%d workloads pass" % (len(RESULTS) - len(failed),
                                    len(RESULTS)))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
