"""Golden-file CLI tests mirroring the reference `make test` suite
(ref: Makefile:247-743). Each case runs the boss-compatible CLI in-process
and diffs stdout against the reference's committed expected outputs."""

import io
import json
import re
import sys

import pytest

from conftest import REF

from machineboss_tpu.cli import main


def run_cli(args):
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        status = main(args)
    finally:
        sys.stdout = old
    return status, out.getvalue()


def roundfloats(text, precision):
    pattern = re.compile(r"\d+\.\d{%d,}" % precision)
    return pattern.sub(lambda m: "%.*g" % (precision, float(m.group())),
                       text)


def stripnames(text):
    data = json.loads(text)
    return json.dumps([[t[2]] for t in data], separators=(",", ":"))


def T(*parts):
    return REF + "/t/" + "/".join(parts)


# (name, args, expectation) where expectation is 'fail', 'idem', or a golden
# path; opts: round=N applies roundfloats, strip=True applies stripnames
CASES = [
    # invalid schema
    ("not-json", [T("invalid/not_json.txt")], "fail", {}),
    ("no-state", [T("invalid/no_state.json")], "fail", {}),
    ("bad-state", [T("invalid/bad_state.json")], "fail", {}),
    ("bad-trans", [T("invalid/bad_trans.json")], "fail", {}),
    ("bad-weight", [T("invalid/bad_weight.json")], "fail", {}),
    ("cyclic", [T("invalid/cyclic.json")], "fail", {}),
    # valid schema idempotency
    ("echo-valid", [T("expect/bitecho.json")], "idem", {}),
    ("unitindel2-valid", ["--show-params",
                          T("expect/unitindel-unitindel.json")], "idem", {}),
    # compose
    ("echo", [T("machine/bitecho.json")], T("expect/bitecho.json"), {}),
    ("echo2", [T("machine/bitecho.json"), T("machine/bitecho.json")],
     T("expect/bitecho-bitecho.json"), {}),
    ("echo2-expr", [T("machine/compose-bitecho-bitecho.json")],
     T("expect/bitecho-bitecho.json"), {}),
    ("echo-stutter", [T("machine/bitecho.json"), T("machine/bitstutter.json")],
     T("expect/bitecho-bitstutter.json"), {}),
    ("stutter2", [T("machine/bitstutter.json"), T("machine/bitstutter.json")],
     T("expect/bitstutter-bitstutter.json"), {}),
    ("noise2", [T("machine/bitnoise.json"), T("machine/bitnoise.json"),
                "--show-params"], T("expect/bitnoise-bitnoise.json"), {}),
    ("unitindel2", [T("machine/unitindel.json"), T("machine/unitindel.json"),
                    "--show-params"], T("expect/unitindel-unitindel.json"), {}),
    ("machine-params", [T("machine/params.json")], "idem", {}),
    # construction
    ("generator", ["--generate-json", T("io/seq101.json")],
     T("expect/generator101.json"), {}),
    ("recognizer", ["--recognize-json", T("io/seq001.json")],
     T("expect/recognizer001.json"), {}),
    ("wild-generator", ["--generate-wild", "ACGT"],
     T("expect/ACGT_generator.json"), {}),
    ("wild-generator-dna", ["--generate-wild-dna"],
     T("expect/ACGT_generator.json"), {}),
    ("wild-recognizer", ["--recognize-wild", "ACGT"],
     T("expect/ACGT_recognizer.json"), {}),
    ("wild-recognizer-dna", ["--recognize-wild-dna"],
     T("expect/ACGT_recognizer.json"), {}),
    ("union", ["--generate-json", T("io/seq001.json"), "-u",
               T("expect/generator101.json")],
     T("expect/generate-101-or-001.json"), {}),
    ("intersection", [T("machine/bitnoise.json"), "-m",
                      "--recognize-json", T("io/seq001.json"), "-i",
                      "--recognize-json", T("io/seq101.json")],
     T("expect/noise-001-and-101.json"), {}),
    ("brackets", ["--begin", T("machine/bitnoise.json"),
                  "--recognize-json", T("io/seq001.json"), "--end", "-i",
                  "--recognize-json", T("io/seq101.json")],
     T("expect/noise-001-and-101.json"), {}),
    ("kleene", ["--generate-json", T("io/seq001.json"), "-K"],
     T("expect/generate-multiple-001.json"), {}),
    ("loop", ["--recognize-json", T("io/seq101.json"), "-o",
              "--recognize-json", T("io/seq001.json")],
     T("expect/101-loop-001.json"), {}),
    ("noisy-loop", [T("machine/bitnoise.json"), "--begin",
                    "--recognize-json", T("io/seq101.json"), "-o",
                    "--recognize-json", T("io/seq001.json"), "--end"],
     T("expect/noisy-101-loop-001.json"), {}),
    ("concat", ["--generate-json", T("io/seq001.json"), "-c",
                T("expect/generator101.json")],
     T("expect/concat-001-101.json"), {}),
    ("eliminate-1", [T("machine/silent.json"), "-n"],
     T("expect/silent-elim.json"), {}),
    ("eliminate-2", [T("machine/silent2.json"), "-n"],
     T("expect/silent2-elim.json"), {}),
    ("eliminate-3", [T("machine/silent3.json"), "-n"],
     T("expect/silent3-elim.json"), {}),
    ("eliminate-4", [T("machine/single-silent-incoming.json"),
                     "--eliminate-states"],
     T("expect/single-silent-incoming.json"), {}),
    ("eliminate-5", [T("machine/single-silent-outgoing.json"),
                     "--eliminate-states"],
     T("expect/single-silent-outgoing.json"), {}),
    ("merge-parallel", [T("machine/merge-parallel.json"), "--merge-states"],
     T("expect/merge-parallel.json"), {}),
    ("merge-bubble", [T("machine/merge-bubble.json"), "--merge-states"],
     T("expect/merge-bubble.json"), {}),
    ("merge-noop", [T("machine/merge-noop.json"), "--merge-states"],
     T("expect/merge-noop.json"), {}),
    ("merge-chain", [T("machine/merge-chain.json"), "--merge-states"],
     T("expect/merge-chain.json"), {}),
    ("reverse", ["--generate-json", T("io/seq001.json"), "-e"],
     T("expect/generator001-reversed.json"), {}),
    ("revcomp", ["--generate-json", T("io/seqAGC.json"), "-r"],
     T("expect/generatorAGC-revcomp.json"), {}),
    ("transpose", ["--generate-json", T("io/seq001.json"), "-t"],
     T("expect/recognizer001.json"), {}),
    # --weight expressions
    ("weight-p", ["-w", "$p"], T("expect/null-p.json"), {}),
    ("weight-2", ["-w", "2"], T("expect/null-2.json"), {}),
    ("weight-half", ["-w", ".5"], T("expect/null-0.5.json"), {}),
    ("weight-pq", ["-w", "$p*$q"], T("expect/null-pq.json"), {}),
    ("weight-1x2", ["-w", "1*2"], T("expect/null-2.json"), {}),
    ("weight-1div2", ["-w", "1/2"], T("expect/null-1div2.json"), {}),
    ("weight-recip", ["--recognize-wild", "ACGT", "--weight-input", "$p%",
                      "--reciprocal"], T("expect/null-weight-recip.json"), {}),
    ("weight-recip2", ["--recognize-wild", "ACGT", "--weight-input",
                       "1/$p%"], T("expect/null-weight-recip.json"), {}),
    ("shorthand", ["(", T("machine/bitnoise.json"), ">>", "101", ")", "&&",
                   ">>", "001", ".", ">>", "AGC", "#", "$x"],
     T("expect/shorthand.json"), {}),
    # importers
    ("hmmer", ["--hmmer-global", T("hmmer/fn3.hmm")],
     T("expect/fn3.json"), {"round": 3}),
    ("hmmer-plan7", ["--hmmer-plan7", T("hmmer/fn3.hmm")],
     T("expect/fn3-plan7.json"), {"round": 3}),
    ("hmmer-multihit", ["--hmmer-multihit", T("hmmer/fn3.hmm")],
     T("expect/fn3-multihit.json"), {"round": 3}),
    ("jphmm", ["--jphmm", T("seq/jphmmtest.fa")],
     T("expect/jphmmtest.json"), {}),
    ("csv", ["--generate-csv", T("csv/test.csv")],
     T("expect/csvtest.json"), {}),
    ("csv-norm", ["--generate-csv", T("csv/test.csv"), "--cond-norm"],
     T("expect/normcsvtest.json"), {}),
    ("csv-t", ["--recognize-csv", T("csv/test.csv"), "--transpose"],
     T("expect/csvtest.json"), {}),
    ("csv-t-norm", ["--recognize-csv", T("csv/test.csv"), "--transpose",
                    "--joint-norm"], T("expect/normcsvtest.json"), {}),
    ("csv-tiny", ["-L", "--generate-json", T("io/tiny_uc.json"),
                  "--recognize-csv", T("csv/tiny_uc.csv")],
     T("expect/tiny_uc.json"), {"strip": True}),
    ("csv-tiny-fail", ["-L", "--generate-json", T("io/tiny_lc.json"),
                       "--recognize-csv", T("csv/tiny_uc.csv")],
     T("expect/tiny_uc_fail.json"), {"strip": True}),
    ("csv-tiny-empty", ["-L", "--generate-json", T("io/empty.json"),
                        "--recognize-csv", T("csv/tiny_uc.csv")],
     T("expect/tiny_empty.json"), {"strip": True}),
    ("nanopore", ["-L", "--generate-json", T("io/nanopore_test_seq.json"),
                  "--recognize-csv", T("csv/nanopore_test.csv")],
     T("expect/nanopore_test.json"), {"strip": True}),
    ("nanopore-prefix", ["-L", "--generate-json",
                         T("io/nanopore_test_seq.json"), "--concat",
                         T("machine/acgt_wild.json"),
                         "--recognize-csv", T("csv/nanopore_test.csv")],
     T("expect/nanopore_test_prefix.json"), {"strip": True}),
    ("nanopore-decode", ["--recognize-csv", T("csv/nanopore_test.csv"),
                         "--beam-decode"],
     T("expect/nanopore_beam_decode.json"), {}),
    ("dnastore", [T("machine/dnastore4.json")],
     T("expect/dnastore4.json"), {}),
    ("dnastore-stats", [T("machine/dnastore4.json"), "--stats"],
     T("expect/dnastore4-stats.txt"), {}),
    ("dnastore-encode", [T("machine/dnastore4.json"), "--input-json",
                         T("io/dnastore-input.json"), "--beam-encode"],
     T("expect/dnastore-encode.json"), {}),
    ("dnastore-decode", [T("machine/dnastore4.json"), "--output-chars",
                         "AGTAGTAG", "--beam-decode"],
     T("expect/dnastore-decode.json"), {}),
    # invalid construction
    ("unmatched-begin", ["--begin"], "fail", {}),
    ("unmatched-end", ["--end"], "fail", {}),
    ("empty-brackets", ["--begin", "--end"], "fail", {}),
    ("missing-machine", [T("machine/bitnoise.json"), "-m", "-m",
                         T("machine/bitnoise.json"),
                         T("machine/bitnoise.json")], "fail", {}),
    ("impossible-intersect", [T("machine/bitnoise.json"), "--begin",
                              "--recognize-json", T("io/seq001.json"), "-i",
                              "--recognize-json", T("io/seq101.json"),
                              "--end"], T("expect/zero.json"), {}),
    # DOT output
    ("dot", [T("machine/bitnoise.json"), "--graphviz"],
     T("expect/bitnoise.dot"), {}),
    ("dot2", [T("machine/bitnoise.json"), T("machine/bitnoise.json"),
              "--graphviz"], T("expect/bitnoise2.dot"), {}),
    ("dot-no-merge", [T("machine/bitnoise.json"), "--graphviz",
                      "--dot-no-merge"], T("expect/bitnoise-no-merge.dot"), {}),
    ("dot-show-io", [T("machine/bitnoise.json"), "--graphviz",
                     "--dot-show-io"], T("expect/bitnoise-show-io.dot"), {}),
    ("dot-metalhead", [REF + "/tutorial/metalhead.json", "--graphviz"],
     T("expect/metalhead.dot"), {}),
    # DP / EM
    ("fit-bitnoise", [T("machine/bitnoise.json"), "-N", T("io/pqcons.json"),
                      "-D", T("io/seqpairlist.json"), "-T"],
     T("expect/fit-bitnoise-seqpairlist.json"), {"round": 4}),
    ("fit-bitnoise-path", [T("machine/bitnoise.json"), "-N",
                           T("io/pqcons.json"), "-D", T("io/pathlist.json"),
                           "-T"],
     T("expect/fit-bitnoise-seqpairlist.json"), {"round": 4}),
    ("funcs", ["-F", T("io/e=0.json"), T("machine/bitnoise.json"),
               T("machine/bsc.json"), "-N", T("io/pqcons.json"), "-D",
               T("io/seqpairlist.json"), "-T"],
     T("expect/test-funcs.json"), {"round": 4}),
    ("single-param", [T("machine/bitnoise.json"), T("machine/bsc.json"),
                      "-N", T("io/econs.json"), "-D",
                      T("io/seqpairlist.json"), "-T", "-F",
                      T("io/params.json")],
     T("expect/single-param.json"), {"round": 4}),
    ("align-stutter-noise", [T("machine/bitstutter.json"),
                             T("machine/bitnoise.json"), "-P",
                             T("io/params.json"), "-D", T("io/difflen.json"),
                             "-A"],
     T("expect/align-stutter-noise-difflen.json"), {}),
    ("counts", ["--generate-chars", "101", "-m", T("machine/bitnoise.json"),
                "--recognize-chars", "001", "-P", T("io/params.json"), "-N",
                T("io/pqcons.json"), "-C"], T("expect/counts.json"), {}),
    ("counts2", [T("machine/bitnoise.json"), "--input-chars", "101",
                 "--output-chars", "001", "-P", T("io/params.json"), "-N",
                 T("io/pqcons.json"), "-C"], T("expect/counts.json"), {}),
    ("counts3a", [T("machine/counter.json"), "--output-chars", "xxx", "-C"],
     T("expect/counter.json"), {}),
    ("counts3b", ["--generate-one", "x", "--count-copies", "p",
                  "--output-chars", "xxx", "-C"],
     T("expect/counter.json"), {}),
    ("count-motif", ["--generate-uniform", "ACGT", "--concat",
                     "--generate-chars", "CATCAG", "--concat", "--begin",
                     "--generate-one", "A", "--count-copies", "n", "--end",
                     "--concat", "--generate-chars", "TATA", "--concat",
                     "--generate-uniform", "ACGT", "--recognize-json",
                     T("io/nanopore_test_seq.json"), "-C"],
     T("expect/count11.json"), {}),
    ("count9", ["--generate-uniform", "ACGT", "--concat",
                "--generate-chars", "CATCAG", "--concat", "--begin",
                "--generate-one", "A", "--count-copies", "n", "--end",
                "--concat", "--generate-chars", "TATA", "--concat",
                "--generate-uniform", "ACGT", "--recognize-csv",
                T("csv/nanopore_test.csv"), "-C"],
     T("expect/count9.json"), {"round": 1}),
    ("count4", ["--generate-uniform", "ACGT", "--concat",
                "--generate-chars", "CAT", "--concat", "--begin",
                "--generate-one", "T", "--count-copies", "n", "--end",
                "--concat", "--generate-chars", "GG", "--concat",
                "--generate-uniform", "ACGT", "--recognize-csv",
                T("csv/nanopore_test.csv"), "-C"],
     T("expect/count4.json"), {"round": 1}),
    ("loglike-101-bitnoise-001",
     ["--generate-json", T("io/seq101.json"), "-m",
      T("machine/bitnoise.json"), "--recognize-json", T("io/seq001.json"),
      "-P", T("io/params.json"), "-N", T("io/pqcons.json"), "-L"],
     T("expect/101-bitnoise-001.json"), {"round": 4, "strip": True}),
    ("fwd-101-bitstutternoise-0011",
     ["--generate-json", T("io/seq101.json"), "-m",
      T("machine/bitstutter-noise.json"), "--recognize-chars", "0011",
      "-P", T("io/params.json"), "-N", T("io/pqcons.json"), "-L"],
     T("expect/101-bitstutternoise-fwd-0011.json"), {"round": 3,
                                                     "strip": True}),
    ("vit-101-bitstutternoise-0011",
     ["--generate-json", T("io/seq101.json"), "-m",
      T("machine/bitstutter-noise.json"), "--recognize-chars", "0011",
      "-P", T("io/params.json"), "-N", T("io/pqcons.json"), "-V"],
     T("expect/101-bitstutternoise-vit-0011.json"), {"round": 3,
                                                     "strip": True}),
    # encode/decode
    ("encode-g101-bintern", ["--generate-chars", "101",
                             T("machine/bintern.json"), "--prefix-encode"],
     T("expect/encode-g101-bintern.json"), {}),
    ("encode-i101-bintern", ["--input-chars", "101",
                             T("machine/bintern.json"), "--prefix-encode"],
     T("expect/encode-i101-bintern.json"), {}),
    ("decode-a12222-prefix", [T("machine/bintern.json"),
                              "--recognize-chars", "12222",
                              "--prefix-decode"],
     T("expect/decode-a12222-bintern.json"), {}),
    ("decode-o12222-prefix", [T("machine/bintern.json"), "--output-chars",
                              "12222", "--prefix-decode"],
     T("expect/decode-o12222-bintern.json"), {}),
    ("decode-a12222-beam", [T("machine/bintern.json"), "--recognize-chars",
                            "12222", "--beam-decode"],
     T("expect/decode-a12222-bintern.json"), {}),
    ("decode-o12222-beam", [T("machine/bintern.json"), "--output-chars",
                            "12222", "--beam-decode"],
     T("expect/decode-o12222-bintern.json"), {}),
    ("hamming-viterbi", ["--preset", "hamming74", "--viterbi-encode",
                         "--input-chars",
                         "0000000100100011010001010110011110001001"
                         "101010111100110111101111"],
     T("expect/hamming74.json"), {}),
    ("hamming-prefix", ["--preset", "hamming74", "--prefix-encode",
                        "--input-chars",
                        "0000000100100011010001010110011110001001"
                        "101010111100110111101111"],
     T("expect/hamming74.json"), {}),
    ("hamming-beam", ["--preset", "hamming74", "--beam-encode",
                      "--input-chars",
                      "0000000100100011010001010110011110001001"
                      "101010111100110111101111"],
     T("expect/hamming74.json"), {}),
    ("viterbi-decode-bitecho", [T("machine/bitecho.json"),
                                "--recognize-chars", "101",
                                "--viterbi-decode"],
     T("expect/decode-bitecho-101.json"), {}),
    ("cool-decode-bitecho", [T("machine/bitecho.json"), "--recognize-chars",
                             "101", "--cool-decode", "--seed", "42"],
     T("expect/decode-bitecho-101.json"), {}),
    ("mcmc-decode-bitecho", [T("machine/bitecho.json"), "--recognize-chars",
                             "101", "--mcmc-decode", "--seed", "42"],
     T("expect/decode-bitecho-101.json"), {}),
    ("random-encode-bitecho", [T("machine/bitecho.json"), "--input-chars",
                               "101", "--random-encode", "--seed", "42"],
     T("expect/random-encode-bitecho-101.json"), {}),
    ("evaluate", [T("machine/bitnoise.json"), "-P", T("io/params.json"),
                  "--evaluate"], T("expect/evaluate-bitnoise.json"), {}),
    ("regex", ["--regex", "[01]+"], T("expect/regex-01plus.json"), {}),
    # expression parser
    ("expr-exp", ["-w", "exp(0)"], T("expect/null-1.json"), {}),
    ("expr-log", ["-w", "exp(log(2))"], T("expect/null-2.json"), {}),
    ("expr-power", ["-w", "2^3"], T("expect/null-8.json"), {}),
    ("expr-unary-neg", ["-w", "-(-(2))"],
     T("expect/null-neg-neg-2.json"), {}),
    ("expr-parens", ["-w", "(1+1)"], T("expect/null-2.json"), {}),
    ("expr-scinotation", ["-w", "2e0"], T("expect/null-2.json"), {}),
    # JSON API operations
    ("json-concat", [T("machine/concat-001-101.json")],
     T("expect/json-concat.json"), {}),
    ("json-union", [T("machine/union-001-101.json")],
     T("expect/json-union.json"), {}),
    ("json-intersect", [T("machine/intersect-r001-r101.json")],
     T("expect/json-intersect.json"), {}),
    ("json-intersect-sum", [T("machine/intersect-sum-r001-r101.json")],
     T("expect/json-intersect-sum.json"), {}),
    ("json-intersect-unsort", [T("machine/intersect-unsort-r001-r101.json")],
     T("expect/json-intersect-unsort.json"), {}),
    ("json-compose-sum", [T("machine/compose-sum-bitecho.json")],
     T("expect/json-compose-sum.json"), {}),
    ("json-compose-unsort", [T("machine/compose-unsort-bitecho.json")],
     T("expect/json-compose-unsort.json"), {}),
    ("json-loop", [T("machine/loop-gen1.json")],
     T("expect/json-loop.json"), {}),
    ("json-opt", [T("machine/opt-gen1.json")], T("expect/json-opt.json"), {}),
    ("json-star", [T("machine/star-gen1.json")],
     T("expect/json-star.json"), {}),
    ("json-plus", [T("machine/plus-gen1.json")],
     T("expect/json-plus.json"), {}),
    ("json-eliminate", [T("machine/eliminate-silent.json")],
     T("expect/json-eliminate.json"), {}),
    ("json-merge", [T("machine/merge-json.json")],
     T("expect/merge-json.json"), {}),
    ("json-reverse", [T("machine/reverse-gen001.json")],
     T("expect/json-reverse.json"), {}),
    ("json-revcomp", [T("machine/revcomp-genAGC.json")],
     T("expect/json-revcomp.json"), {}),
    ("json-transpose", [T("machine/transpose-gen001.json")],
     T("expect/json-transpose.json"), {}),
]

PRESETS = ["null", "compdna", "comprna", "dnapsw", "protpsw", "translate",
           "prot2dna", "psw2dna", "iupacdna", "iupacaa", "dna2rna",
           "rna2dna", "bintern", "terndna", "jukescantor", "dnapswnbr",
           "tkf91root", "tkf91branch", "tolower", "toupper", "hamming31",
           "hamming74"]


@pytest.mark.parametrize("name,args,expect,opts",
                         CASES, ids=[c[0] for c in CASES])
def test_golden(name, args, expect, opts, tmp_path):
    status, out = run_cli(list(args))
    if expect == "fail":
        assert status != 0, "expected failure but got success:\n" + out
        return
    assert status == 0, "CLI failed (status %d):\n%s" % (status, out)
    if opts.get("round"):
        out = roundfloats(out, opts["round"])
    if opts.get("strip"):
        out = stripnames(out)
        golden = open(expect).read().rstrip("\n")
        assert out == golden, "mismatch vs %s:\n%s\n--- expected:\n%s" % (
            expect, out, golden)
        return
    if expect == "idem":
        # output must re-parse to itself
        src = args[-1]
        golden = open(src).read()
        assert out == golden, "not idempotent vs %s" % src
        return
    golden = open(expect).read()
    assert out == golden, _diff(golden, out, expect)


def test_presets_idempotent(tmp_path):
    for preset in PRESETS:
        status, out = run_cli(["--preset", preset])
        assert status == 0, preset
        p = tmp_path / (preset + ".json")
        p.write_text(out)
        status2, out2 = run_cli([str(p)])
        assert status2 == 0 and out2 == out, "preset %s not idempotent" % preset


def _diff(golden, out, path):
    import difflib
    d = "".join(list(difflib.unified_diff(
        golden.splitlines(True), out.splitlines(True),
        "expected(%s)" % path, "actual"))[:40])
    return "golden mismatch:\n" + d
