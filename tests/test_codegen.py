"""Codegen equivalence: generated C++ must reproduce the interpreter's
golden outputs (ref Makefile:533-625 codegen tests), and generated JS/WGSL
must at least be syntactically produced."""

import json
import os
import re
import subprocess

import pytest

from conftest import REF

from machineboss_tpu.core.machine import Machine
from machineboss_tpu.codegen_impl import (CPlusPlusCompiler,
                                          JavaScriptCompiler, compile_wgsl,
                                          SEQ_STRING, SEQ_PROFILE)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SEQ = r"""
#include <fstream>
#include <iostream>
#include <sstream>
#include "computeForward.h"
#include "%s/native/mbjson.hpp"

int main(int argc, char** argv) {
  std::string inStr(argv[1]), outStr(argv[2]);
  std::map<std::string, double> params;
  if (argc > 3) {
    std::ifstream f(argv[3]);
    std::stringstream ss;
    ss << f.rdbuf();
    mb::Json j = mb::Json::parse(ss.str());
    for (const auto& kv : j.obj()) params[kv.first] = kv.second.as_double();
  }
  printf("[[\"input\",\"output\",%%g]]\n",
         mbgen::computeForward(inStr, outStr, params));
  return 0;
}
""" % REPO


def roundfloats(text, precision):
    pattern = re.compile(r"\d+\.\d{%d,}" % precision)
    return pattern.sub(lambda m: "%.*g" % (precision, float(m.group())),
                       text)


def stripnames(text):
    data = json.loads(text)
    return json.dumps([[t[2]] for t in data], separators=(",", ":"))


def _build_and_run(tmp_path, machine_file, use_viterbi, args,
                   is_64bit=True):
    m = Machine.from_file(machine_file)
    gen_dir = str(tmp_path / ("gen32", "gen64")[is_64bit])
    c = CPlusPlusCompiler(is_64bit=is_64bit)
    c.use_max_reduce = use_viterbi
    c.compile_forward(m, SEQ_STRING, SEQ_STRING, gen_dir)
    with open(os.path.join(gen_dir, "main.cpp"), "w") as f:
        f.write(_DRIVER_SEQ)
    exe = os.path.join(gen_dir, "test")
    subprocess.run(["g++", "-O2", "-std=c++17", "-I", gen_dir,
                    "-o", exe, os.path.join(gen_dir, "main.cpp")],
                   check=True)
    out = subprocess.run([exe] + args, check=True, capture_output=True,
                         text=True).stdout
    return out


def test_codegen_cpp_bitnoise(tmp_path):
    out = _build_and_run(tmp_path, REF + "/t/machine/bitnoise.json", False,
                         ["101", "001", REF + "/t/io/params.json"])
    got = stripnames(roundfloats(out, 4))
    golden = open(REF + "/t/expect/101-bitnoise-001.json").read().rstrip("\n")
    assert got == golden, (got, golden)


def test_codegen_cpp_stutter_forward(tmp_path):
    out = _build_and_run(tmp_path, REF + "/t/machine/bitstutter-noise.json",
                         False, ["101", "0011", REF + "/t/io/params.json"])
    got = stripnames(roundfloats(out, 3))
    golden = open(REF + "/t/expect/101-bitstutternoise-fwd-0011.json") \
        .read().rstrip("\n")
    assert got == golden, (got, golden)


def test_codegen_cpp_stutter_viterbi(tmp_path):
    out = _build_and_run(tmp_path, REF + "/t/machine/bitstutter-noise.json",
                         True, ["101", "0011", REF + "/t/io/params.json"])
    got = stripnames(roundfloats(out, 3))
    golden = open(REF + "/t/expect/101-bitstutternoise-vit-0011.json") \
        .read().rstrip("\n")
    assert got == golden, (got, golden)


GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden", "codegen")


def _emit_all(machine_name, tmp_path):
    m = Machine.from_file(REF + "/t/machine/%s.json" % machine_name)
    d = str(tmp_path / machine_name)
    JavaScriptCompiler().compile_forward(m, SEQ_STRING, SEQ_STRING, d)
    cv = JavaScriptCompiler()
    cv.use_max_reduce = True
    cv.compile_forward(m, SEQ_STRING, SEQ_STRING, d,
                       func_name="computeViterbi")
    compile_wgsl(m, d)
    return d


def test_codegen_js_wgsl_snapshots(tmp_path):
    """Emitted JS/WGSL/mjs byte-match checked-in snapshots; any emitter
    text change fails here and requires a deliberate golden regeneration
    (scripts in tests/golden/codegen are produced by this very emitter)."""
    for name in ("bitnoise", "bitstutter-noise"):
        d = _emit_all(name, tmp_path)
        for src, gold in (("computeForward.js", "%s-forward.js" % name),
                          ("computeViterbi.js", "%s-viterbi.js" % name),
                          ("computeForward.wgsl", "%s-forward.wgsl" % name),
                          ("computeForward.mjs", "%s-forward.mjs" % name)):
            got = open(os.path.join(d, src)).read()
            want = open(os.path.join(GOLD, gold)).read()
            assert got == want, "codegen snapshot drift: %s/%s" % (name, src)


def test_codegen_js_executes_golden(tmp_path):
    """EXECUTE the generated JS (transpiled; see js_exec.py — the
    reference runs the same check under node, ref Makefile:561-625):
    Forward and Viterbi log-likes must match the t/expect goldens."""
    import json
    from js_exec import run_generated_js
    params = json.load(open(REF + "/t/io/params.json"))
    cases = [
        ("bitnoise", "101", "001", "101-bitnoise-001.json", None),
        ("bitstutter-noise", "101", "0011",
         "101-bitstutternoise-fwd-0011.json",
         "101-bitstutternoise-vit-0011.json"),
    ]
    for name, xs, ys, fwd_gold, vit_gold in cases:
        d = _emit_all(name, tmp_path)
        x = [{"0": 1, "1": 2}[c] for c in xs]
        y = [{"0": 1, "1": 2}[c] for c in ys]
        js_f = open(os.path.join(d, "computeForward.js")).read()
        ll = run_generated_js(js_f, x, y, params)
        want = float(open(REF + "/t/expect/" + fwd_gold).read()
                     .strip().strip("[]"))
        assert abs(ll - want) < 5e-3, (name, ll, want)
        if vit_gold is not None:
            js_v = open(os.path.join(d, "computeViterbi.js")).read()
            lv = run_generated_js(js_v, x, y, params,
                                  func_name="computeViterbi")
            wantv = float(open(REF + "/t/expect/" + vit_gold).read()
                          .strip().strip("[]"))
            assert abs(lv - wantv) < 5e-3, (name, lv, wantv)


def test_codegen_wgsl_structural(tmp_path):
    """The WGSL shader exposes the reference wavefront-shader interface
    shape (ref js/webgpu/shaders/wavefront-forward.wgsl:9-23): per-
    diagonal dispatch with a uniform diagonal index, storage buffers for
    transitions/sequences/cells, a compute entry point, and an in-shader
    log-sum-exp."""
    d = _emit_all("bitstutter-noise", tmp_path)
    wgsl = open(os.path.join(d, "computeForward.wgsl")).read()
    assert "@compute" in wgsl and "@workgroup_size" in wgsl
    assert wgsl.count("@group(0)") >= 5            # dims/trans/xs/ys/cells
    assert "var<uniform>" in wgsl                  # per-diagonal params
    assert wgsl.count("var<storage") >= 4
    assert "read_write" in wgsl                    # the DP cell buffer
    assert "fn lse(" in wgsl and "NEG_INF" in wgsl
    assert "global_invocation_id" in wgsl          # one thread per cell
    mjs = open(os.path.join(d, "computeForward.mjs")).read()
    assert "export async function computeForward" in mjs  # ES module API


def test_codegen_cpp_profile(tmp_path):
    """Profile (PSWM) inputs with one-hot rows equal the string case."""
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    gen_dir = str(tmp_path / "gen")
    c = CPlusPlusCompiler()
    c.compile_forward(m, SEQ_PROFILE, SEQ_PROFILE, gen_dir)
    driver = r"""
#include <fstream>
#include <iostream>
#include <sstream>
#include "computeForward.h"
#include "%s/native/mbjson.hpp"

int main(int argc, char** argv) {
  // build one-hot profiles for "101" and "001" over alphabet {0,1}
  // columns: [eps, "0", "1"]
  auto prof = [](const std::string& s) {
    std::vector<std::vector<double>> p;
    for (char c : s) {
      std::vector<double> row{0, 0, 0};
      row[c == '0' ? 1 : 2] = 1;
      p.push_back(row);
    }
    return p;
  };
  std::map<std::string, double> params;
  std::ifstream f(argv[1]);
  std::stringstream ss;
  ss << f.rdbuf();
  mb::Json j = mb::Json::parse(ss.str());
  for (const auto& kv : j.obj()) params[kv.first] = kv.second.as_double();
  printf("[[%%g]]\n", mbgen::computeForward(prof("101"), prof("001"), params));
  return 0;
}
""" % REPO
    with open(os.path.join(gen_dir, "main.cpp"), "w") as f:
        f.write(driver)
    exe = os.path.join(gen_dir, "test")
    subprocess.run(["g++", "-O2", "-std=c++17", "-I", gen_dir, "-o", exe,
                    os.path.join(gen_dir, "main.cpp")], check=True)
    out = subprocess.run([exe, REF + "/t/io/params.json"], check=True,
                         capture_output=True, text=True).stdout
    got = roundfloats(out, 4).strip()
    golden = open(REF + "/t/expect/101-bitnoise-001.json").read().rstrip("\n")
    assert got == golden, (got, golden)


def test_codegen_cpp32_matches_golden(tmp_path):
    """--cpp32 (int32 IntLog) reproduces the same golden as --cpp64 on
    in-range values (the reference's 32/64 builds agree in range too,
    ref src/softplus.h:14-20)."""
    out = _build_and_run(tmp_path, REF + "/t/machine/bitnoise.json", False,
                         ["101", "001", REF + "/t/io/params.json"],
                         is_64bit=False)
    got = stripnames(roundfloats(out, 4))
    golden = open(REF + "/t/expect/101-bitnoise-001.json").read().rstrip("\n")
    assert got == golden, (got, golden)


def test_codegen_intlog_width_is_load_bearing(tmp_path):
    """The 32-bit build clamps at 0x1FFFFFFF * 1e-4 = 53687 nats while the
    64-bit build does not (ref src/softplus.h:14-20): a 600-step path of
    e^-100 transitions (total log -60000) is -inf under --cpp32 and finite
    under --cpp64."""
    machine = {"state": [
        {"id": "s", "trans": [
            {"in": "a", "out": "a", "to": "s", "weight": 3.7200759760e-44},
            {"to": "e", "weight": 1}]},
        {"id": "e", "trans": []}]}
    mf = str(tmp_path / "deep.json")
    with open(mf, "w") as f:
        json.dump(machine, f)
    seq = "a" * 600
    out64 = _build_and_run(tmp_path, mf, False, [seq, seq], is_64bit=True)
    out32 = _build_and_run(tmp_path, mf, False, [seq, seq], is_64bit=False)
    v64 = json.loads(out64.replace("-inf", "-1e999"))[0][2]
    v32 = json.loads(out32.replace("-inf", "-1e999"))[0][2]
    assert -60010 < v64 < -59990, v64
    assert v32 == -float("inf") or v32 < -1e29, v32


def test_codegen_intlog_semantics(tmp_path):
    """Generated values are integer logs at 1e-4 precision: the result is
    an exact multiple of 1e-4 (up to double formatting)."""
    out = _build_and_run(tmp_path, REF + "/t/machine/bitnoise.json", False,
                         ["101", "001", REF + "/t/io/params.json"])
    v = json.loads(out)[0][2]
    assert abs(v / 1e-4 - round(v / 1e-4)) < 1e-6, v
