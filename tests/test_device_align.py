"""Device-engine alignment/counts parity: `--engine device` must reproduce
the reference golden outputs byte-for-byte (Viterbi fill + E-step run on
the device engines; traceback and JSON emission on host).

Golden anchors: ref Makefile:515-516 (align-stutter-noise) and the counts
suite; device capability anchor: ref js/webgpu/machineboss-gpu.mjs:63
(GPU viterbi+path / posteriors)."""

from test_golden_cli import run_cli, T


def _expect(path):
    with open(path) as f:
        return f.read()


def test_device_align_matches_golden():
    status, out = run_cli([T("machine/bitstutter.json"),
                           T("machine/bitnoise.json"), "-P",
                           T("io/params.json"), "-D", T("io/difflen.json"),
                           "--engine", "device", "-A"])
    assert status == 0
    assert out == _expect(T("expect/align-stutter-noise-difflen.json"))


def test_device_align_matches_host_engine():
    args = [T("machine/bitstutter.json"), T("machine/bitnoise.json"), "-P",
            T("io/params.json"), "-D", T("io/difflen.json"), "-A", "-V"]
    s_host, host = run_cli(args)
    s_dev, dev = run_cli(args[:-2] + ["--engine", "device", "-A", "-V"])
    assert s_host == 0 and s_dev == 0
    # Viterbi log-likes agree to f32 fill noise; alignments byte-identical
    host_align = host.split("\n", 1)
    dev_align = dev.split("\n", 1)
    assert dev_align[1] == host_align[1]


def test_device_counts_matches_golden():
    status, out = run_cli([T("machine/bitnoise.json"), "--input-chars",
                           "101", "--output-chars", "001", "-P",
                           T("io/params.json"), "-N", T("io/pqcons.json"),
                           "--engine", "device", "-C"])
    assert status == 0
    assert out == _expect(T("expect/counts.json"))
