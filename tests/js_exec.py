"""Execute generated JavaScript DP kernels without a JS engine.

The reference compiles AND runs its generated JS against goldens
(ref Makefile:561-625) under node. This environment has no JS runtime, so
this helper transpiles the emitter's narrow, machine-generated JS grammar
(codegen_impl.JavaScriptCompiler) to Python and executes that — a real
semantic execution test, not an existence check. Any construct outside the
known grammar fails loudly, so emitter drift cannot pass silently.
"""

import math
import re

NEG_INF = float("-inf")


def _lse_unary(x):
    if x >= 10 or math.isinf(x) or math.isnan(x):
        return 0.0
    if x < 0:
        return -x
    return math.log1p(math.exp(-x))


def _lse(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    mx = max(a, b)
    return mx + _lse_unary(abs(a - b))


def _max_reduce(a, b):
    return max(a, b)


def _get_param(params, name):
    if name not in params:
        raise KeyError("Parameter %s not defined" % name)
    return params[name]


_TERNARY = re.compile(r"\(([^?()]*(?:\([^)]*\)[^?()]*)*)\)\s*\?\s*"
                      r"([^:;()]+)\s*:\s*([^;()]+)")


def _expr(js):
    """Translate an expression in the emitter's grammar to Python."""
    e = js.strip()
    # the typeof-string coercion always reduces to the token-list branch
    # (the python driver passes 1-based token lists, never strings)
    e = re.sub(r'\(typeof (\w+) === "string" \? [^:]+ : (\w+)\)', r"\2", e)
    m = _TERNARY.search(e)
    while m:
        e = (e[:m.start()] + "((%s) if (%s) else (%s))"
             % (m.group(2).strip(), m.group(1).strip(), m.group(3).strip())
             + e[m.end():])
        m = _TERNARY.search(e)
    e = re.sub(r"new Array\((\d+)\)\.fill\(-Infinity\)",
               r"[NEG_INF] * \1", e)
    e = e.replace("-Infinity", "NEG_INF")
    e = e.replace("Math.log", "math.log")
    e = e.replace("Math.max", "max")
    e = e.replace("Math.abs", "abs")
    e = re.sub(r"(\w+)\.length", r"len(\1)", e)
    e = e.replace("===", "==").replace("!==", "!=")
    e = e.replace("&&", " and ").replace("||", " or ")
    return e


def transpile(js_src, func_name="computeForward"):
    """Return python source for the generated kernel function."""
    lines = js_src.splitlines()
    out = ["def %s(x, y, params):" % func_name]
    depth = None
    indent = 1
    in_func = False
    for raw in lines:
        line = raw.strip()
        if not in_func:
            if line.startswith("function %s(" % func_name):
                in_func = True
                depth = 1
            continue
        if not line or line.startswith("//"):
            continue
        opens, closes = line.count("{"), line.count("}")
        if line == "}":
            depth -= 1
            indent -= 1
            if depth == 0:
                break
            continue
        pad = "    " * indent

        m = re.match(r"function (\w+)\(\) \{$", line)
        if m:
            out.append(pad + "def %s():" % m.group(1))
            indent += 1
            depth += 1
            continue
        m = re.match(r"for \(var (\w+) = (\w+); \1 (<=|<) ([\w.()]+); "
                     r"\+\+\1\) \{$", line)
        if m:
            v, lo, op, hi = m.groups()
            hi_py = _expr(hi) + (" + 1" if op == "<=" else "")
            out.append(pad + "for %s in range(%s, %s):" % (v, lo, hi_py))
            indent += 1
            depth += 1
            continue
        m = re.match(r"for \(var (\w+) = (\w+); \1 (<=|<) ([\w.()]+); "
                     r"\+\+\1\) ([^{};]+);$", line)
        if m:
            v, lo, op, hi, stmt = m.groups()
            hi_py = _expr(hi) + (" + 1" if op == "<=" else "")
            out.append(pad + "for %s in range(%s, %s): %s"
                       % (v, lo, hi_py, _stmt(stmt)))
            continue
        m = re.match(r"if \((.+)\) ([^{};]+);$", line)
        if m:
            out.append(pad + "if %s: %s" % (_expr(m.group(1)),
                                            _stmt(m.group(2))))
            continue
        m = re.match(r"return (.+);$", line)
        if m:
            out.append(pad + "return " + _expr(m.group(1)))
            continue
        m = re.match(r"var (.+);$", line)
        if m:
            decls = m.group(1)
            # split on commas at depth 0 (multi-declaration lines)
            parts, buf, d = [], "", 0
            for ch in decls:
                if ch == "," and d == 0:
                    parts.append(buf)
                    buf = ""
                    continue
                if ch in "([":
                    d += 1
                if ch in ")]":
                    d -= 1
                buf += ch
            parts.append(buf)
            for p in parts:
                name, _, rhs = p.partition("=")
                out.append(pad + "%s = %s" % (name.strip(),
                                              _expr(rhs)))
            continue
        m = re.match(r"([\w\[\]\(\).\- +]+) = (.+);$", line)
        if m:
            out.append(pad + "%s = %s" % (_expr(m.group(1)),
                                          _expr(m.group(2))))
            continue
        m = re.match(r"(\w+)\.push\((.+)\);$", line)
        if m:
            out.append(pad + "%s.append(%s)" % (m.group(1),
                                                _expr(m.group(2))))
            continue
        raise AssertionError("untranslatable generated-JS line: %r" % line)
    assert in_func, "function %s not found in generated JS" % func_name
    return "\n".join(out)


def run_generated_js(js_src, x_toks, y_toks, params,
                     func_name="computeForward"):
    """Transpile + execute; x/y are 1-based token lists (as the JS kernel
    accepts when given arrays instead of strings)."""
    py = transpile(js_src, func_name)
    env = {"math": math, "NEG_INF": NEG_INF, "lse": _lse,
           "lseUnary": _lse_unary, "maxReduce": _max_reduce,
           "getParam": _get_param}
    exec(py, env)
    return env[func_name](list(x_toks), list(y_toks), dict(params))


def _stmt(js):
    s = js.strip()
    m = re.match(r"(.+?) = (.+)$", s)
    if m:
        return "%s = %s" % (_expr(m.group(1)), _expr(m.group(2)))
    return _expr(s)
