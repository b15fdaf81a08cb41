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


def _build_and_run(tmp_path, machine_file, use_viterbi, args):
    m = Machine.from_file(machine_file)
    gen_dir = str(tmp_path / "gen")
    c = CPlusPlusCompiler(is_64bit=True)
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


def test_codegen_js_and_wgsl_emit(tmp_path):
    m = Machine.from_file(REF + "/t/machine/bitnoise.json")
    js_dir = str(tmp_path / "js")
    JavaScriptCompiler().compile_forward(m, SEQ_STRING, SEQ_STRING, js_dir)
    assert os.path.exists(os.path.join(js_dir, "computeForward.js"))
    wgsl_dir = str(tmp_path / "wgsl")
    compile_wgsl(m, wgsl_dir)
    assert os.path.exists(os.path.join(wgsl_dir, "computeForward.wgsl"))


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
