"""Unit tests for the mini ES interpreter (machineboss_tpu/utils/jsvm).

The js/ runtime tests exercise the interpreter end-to-end; these pin the
language corners the runtime depends on, so an interpreter regression
fails here with a precise signal instead of somewhere inside a DP.
"""

import math
import os
import tempfile

import pytest

import jsvm


def run_module(src):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.mjs")
        with open(path, "w") as f:
            f.write(src)
        exports, interp = jsvm.load_module(path)
        return exports, interp


def run_expr(body):
    ex, interp = run_module("export function f() { %s }" % body)
    return jsvm.js_to_python(interp.call(ex["f"], []))


def test_numbers_and_operators():
    assert run_expr("return 7 / 2;") == 3.5
    assert run_expr("return 7 % 3;") == 1
    assert run_expr("return 2 ** 10;") == 1024
    assert run_expr("return 1 / 0;") == math.inf
    assert run_expr("return -1 / 0;") == -math.inf
    assert run_expr("return -Infinity + 5;") == -math.inf
    assert math.isnan(run_expr("return 0 / 0;"))
    assert run_expr("return '' + 1.5;") == "1.5"
    assert run_expr("return 0.1 + 0.2;") == 0.1 + 0.2
    assert run_expr("return 5 < '6';") is True
    assert run_expr("return NaN === NaN;") is False


def test_strict_equality_and_truthiness():
    assert run_expr("return null == undefined;") is True
    assert run_expr("return null === undefined;") is False
    assert run_expr("return 0 === -0;") is True
    assert run_expr("return '' ? 1 : 2;") == 2
    assert run_expr("return [] ? 1 : 2;") == 1
    assert run_expr("const x = null; return x || 'd';") == "d"
    assert run_expr("let n = 0; return n && 'y';") == 0


def test_arrays_and_typed_arrays():
    assert run_expr("""
      const a = new Float64Array(3).fill(-Infinity);
      a[1] = 5; a[2] = a.length;
      let s = 0; for (const v of a) if (v > -Infinity) s += v;
      return s;""") == 8
    assert run_expr("return [3,1,2].sort((x,y) => x - y).join('-');") \
        == "1-2-3"
    assert run_expr("return [1,2,3,4].filter(x => x % 2 === 0)"
                    ".map(x => x * 10).reduce((a, b) => a + b, 0);") == 60
    assert run_expr("const a = [1,2,3]; const b = a.slice(1); b[0] = 9;"
                    "return a[1] * 10 + b[0];") == 29


def test_objects_classes_closures():
    ex, interp = run_module("""
      export class Acc {
        constructor(start) { this._v = start; this.log = []; }
        add(x) { this._v += x; this.log.push(x); return this; }
        get value() { return this._v; }
        static make() { return new Acc(100); }
      }
      export function counter() {
        let n = 0;
        return () => { n += 1; return n; };
      }
    """)
    acc = interp.call(interp.get_member(ex["Acc"], "make"), [])
    interp.call(interp.get_member(acc, "add"), [5.0], acc)
    interp.call(interp.get_member(acc, "add"), [7.0], acc)
    assert interp.get_member(acc, "value") == 112
    assert jsvm.js_to_python(interp.get_member(acc, "log")) == [5.0, 7.0]
    c = interp.call(ex["counter"], [])
    assert interp.call(c, []) == 1
    assert interp.call(c, []) == 2


def test_destructuring_templates_spread():
    assert run_expr("""
      const obj = { a: 1, b: { c: 2 } };
      const { a, b } = obj;
      const [x, y] = [10, 20];
      const merged = { ...obj, d: 3 };
      const arr = [0, ...[1, 2]];
      return `${a}/${b['c']}/${x + y}/${merged.d}/${arr.length}`;
    """) == "1/2/30/3/3"


def test_try_catch_throw():
    assert run_expr("""
      try { throw new TypeError('boom'); }
      catch (e) { return e.name + ':' + e.message; }
    """) == "TypeError:boom"
    with pytest.raises(jsvm.JSThrow, match="uncaught"):
        run_expr("throw new Error('uncaught');")


def test_imports_and_json():
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "util.mjs"), "w") as f:
            f.write("export const K = 3;\n"
                    "export function sq(x) { return x * x; }\n")
        with open(os.path.join(d, "main.mjs"), "w") as f:
            f.write("""
              import { K, sq as square } from './util.mjs';
              export function go() {
                const o = JSON.parse('{"xs": [1, 2]}');
                o.xs.push(K);
                return JSON.stringify({ v: square(K), xs: o.xs });
              }
            """)
        ex, interp = jsvm.load_module(os.path.join(d, "main.mjs"))
        assert interp.call(ex["go"], []) == '{"v":9,"xs":[1,2,3]}'


def test_unsupported_syntax_fails_loudly():
    with pytest.raises(jsvm.JSSyntaxError):
        run_module("export function* gen() { return 1; }")  # generators
    with pytest.raises(jsvm.JSSyntaxError):
        run_module("export class A extends B {}")
