"""Mini ECMAScript interpreter for executing the js/ runtime package.

This environment has no JavaScript engine (no node, no quickjs, no
embeddable JS python package), but the reference ships a browser/Node
runtime package whose CPU path is executed against goldens in its CI
(ref Makefile:746-766, js/webgpu/test/*.mjs). To keep that discipline,
this module implements a small tree-walking interpreter for the
disciplined ES-module subset the js/ package is written in, so the
package's CPU numerics run for real inside pytest — semantic execution,
not existence checks.

Supported subset (anything else raises JSSyntaxError loudly):
  - let/const/var (incl. simple object/array destructuring), if/else,
    for(;;), for..of, while, break/continue/return, throw, try/catch,
    function declarations/expressions, arrow functions, classes
    (constructor/methods/static/getters), template literals,
    import/export (static, relative paths), async/await (run
    synchronously — the package has no real concurrency).
  - Numbers are IEEE doubles (Python floats/ints), strings, booleans,
    null, undefined, arrays, plain objects, Set/Map.
  - Builtins: Math, JSON, Object, Array, Number, console, Error,
    Float64Array/Float32Array/Int32Array/Uint32Array (as lists),
    Promise.all (synchronous).

Not an engine for arbitrary web JS: no prototype chains, no getters on
plain objects, no generators, no regex literals, no `with`.
"""

import json
import math
import os
import re


class JSSyntaxError(SyntaxError):
    pass


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value
        super().__init__(js_to_str(value))


class Undefined(object):
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super(Undefined, cls).__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = Undefined()


class JSObject(object):
    """A plain JS object (also class instances; `cls` set for those)."""

    __slots__ = ("props", "cls")

    def __init__(self, props=None, cls=None):
        self.props = props if props is not None else {}
        self.cls = cls

    def __repr__(self):
        return "JSObject(%r)" % (self.props,)


class JSFunction(object):
    __slots__ = ("name", "params", "body", "env", "this", "is_arrow",
                 "is_expr_body")

    def __init__(self, name, params, body, env, this=UNDEF, is_arrow=False,
                 is_expr_body=False):
        self.name = name
        self.params = params
        self.body = body
        self.env = env
        self.this = this
        self.is_arrow = is_arrow
        self.is_expr_body = is_expr_body

    def __repr__(self):
        return "JSFunction(%s)" % self.name


class JSClass(object):
    __slots__ = ("name", "ctor", "methods", "statics", "getters")

    def __init__(self, name, ctor, methods, statics, getters):
        self.name = name
        self.ctor = ctor
        self.methods = methods
        self.statics = statics
        self.getters = getters


class BoundMethod(object):
    __slots__ = ("fn", "this")

    def __init__(self, fn, this):
        self.fn = fn
        self.this = this


# ---------------------------------------------------------------------------
# Lexer

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<num>0x[0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<str>'(?:[^'\\\n]|\\.)*'|"(?:[^"\\\n]|\\.)*")
  | (?P<tmpl>`(?:[^`\\]|\\.)*`)
  | (?P<punc>===|!==|\*\*=|<<=|>>=|\.\.\.|=>|\+\+|--|&&|\|\||\*\*|<=|>=|==|!=|\+=|-=|\*=|/=|%=|[{}()\[\];,<>+\-*/%!?:=.&|^~])
""", re.VERBOSE | re.DOTALL)

KEYWORDS = {"var", "let", "const", "function", "return", "if", "else",
            "for", "while", "do", "break", "continue", "new", "typeof",
            "instanceof", "in", "of", "class", "extends", "super", "this",
            "null", "true", "false", "undefined", "throw", "try", "catch",
            "finally", "import", "export", "from", "default", "async",
            "await", "static", "get", "delete", "void"}


def tokenize_js(src):
    toks = []
    pos = 0
    line = 1
    n = len(src)
    while pos < n:
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise JSSyntaxError("jsvm: unexpected character %r at line %d"
                               % (src[pos], line))
        text = m.group(0)
        line += text.count("\n")
        kind = m.lastgroup
        if kind not in ("ws", "comment"):
            if kind == "ident" and text in KEYWORDS:
                kind = "kw"
            toks.append((kind, text, line))
        pos = m.end()
    toks.append(("eof", "", line))
    return toks


# ---------------------------------------------------------------------------
# Parser (recursive descent; expressions via precedence climbing)

_BINOP_PREC = {
    "||": 1, "&&": 2,
    "|": 3, "^": 3, "&": 3,
    "===": 4, "!==": 4, "==": 4, "!=": 4,
    "<": 5, ">": 5, "<=": 5, ">=": 5, "instanceof": 5, "in": 5,
    "<<": 6, ">>": 6,
    "+": 7, "-": 7,
    "*": 8, "/": 8, "%": 8,
    "**": 9,
}

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**="}


class Parser(object):
    def __init__(self, toks, src_name="<js>"):
        self.toks = toks
        self.i = 0
        self.src_name = src_name

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, text=None):
        k, v, _ = self.peek()
        return k == kind and (text is None or v == text)

    def expect(self, kind, text=None):
        k, v, ln = self.next()
        if k != kind or (text is not None and v != text):
            raise JSSyntaxError(
                "jsvm %s:%d: expected %s %r, got %s %r"
                % (self.src_name, ln, kind, text, k, v))
        return v

    def eat(self, kind, text=None):
        if self.at(kind, text):
            self.next()
            return True
        return False

    def skip_semi(self):
        while self.eat("punc", ";"):
            pass

    # -- statements --------------------------------------------------------

    def parse_module(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.parse_statement())
        return ("block", stmts)

    def parse_statement(self):
        k, v, ln = self.peek()
        if k == "punc" and v == "{":
            return self.parse_block()
        if k == "punc" and v == ";":
            self.next()
            return ("empty",)
        if k == "kw":
            if v in ("var", "let", "const"):
                s = self.parse_var_decl()
                self.skip_semi()
                return s
            if v == "function":
                return self.parse_function_decl()
            if v == "async":
                nk, nv, _ = self.peek(1)
                if nk == "kw" and nv == "function":
                    self.next()
                    return self.parse_function_decl()
            if v == "class":
                return self.parse_class_decl()
            if v == "if":
                return self.parse_if()
            if v == "for":
                return self.parse_for()
            if v == "while":
                return self.parse_while()
            if v == "do":
                return self.parse_do_while()
            if v == "return":
                self.next()
                if self.at("punc", ";") or self.at("punc", "}"):
                    e = None
                else:
                    e = self.parse_expression()
                self.skip_semi()
                return ("return", e)
            if v == "break":
                self.next()
                self.skip_semi()
                return ("break",)
            if v == "continue":
                self.next()
                self.skip_semi()
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.parse_expression()
                self.skip_semi()
                return ("throw", e)
            if v == "try":
                return self.parse_try()
            if v == "import":
                return self.parse_import()
            if v == "export":
                return self.parse_export()
        e = self.parse_expression()
        self.skip_semi()
        return ("expr", e)

    def parse_block(self):
        self.expect("punc", "{")
        stmts = []
        while not self.at("punc", "}"):
            stmts.append(self.parse_statement())
        self.expect("punc", "}")
        return ("block", stmts)

    def parse_binding_target(self):
        """name | {a, b: c} | [a, b] — for declarations only."""
        if self.at("punc", "{"):
            self.next()
            pairs = []
            while not self.at("punc", "}"):
                key = self.next()[1]
                name = key
                if self.eat("punc", ":"):
                    name = self.expect("ident")
                pairs.append((key, name))
                if not self.eat("punc", ","):
                    break
            self.expect("punc", "}")
            return ("obj_pat", pairs)
        if self.at("punc", "["):
            self.next()
            names = []
            while not self.at("punc", "]"):
                names.append(self.expect("ident"))
                if not self.eat("punc", ","):
                    break
            self.expect("punc", "]")
            return ("arr_pat", names)
        return ("name_pat", self.expect("ident"))

    def parse_var_decl(self):
        kind = self.next()[1]
        decls = []
        while True:
            target = self.parse_binding_target()
            init = None
            if self.eat("punc", "="):
                init = self.parse_assignment()
            decls.append((target, init))
            if not self.eat("punc", ","):
                break
        return ("var", kind, decls)

    def parse_function_decl(self):
        self.expect("kw", "function")
        name = self.expect("ident")
        params = self.parse_params()
        body = self.parse_block()
        return ("funcdecl", name, params, body)

    def parse_params(self):
        self.expect("punc", "(")
        params = []
        while not self.at("punc", ")"):
            pname = self.expect("ident")
            default = None
            if self.eat("punc", "="):
                default = self.parse_assignment()
            params.append((pname, default))
            if not self.eat("punc", ","):
                break
        self.expect("punc", ")")
        return params

    def parse_class_decl(self):
        self.expect("kw", "class")
        name = self.expect("ident")
        if self.eat("kw", "extends"):
            raise JSSyntaxError("jsvm: class inheritance not supported")
        self.expect("punc", "{")
        ctor = None
        methods = {}
        statics = {}
        getters = {}
        while not self.at("punc", "}"):
            if self.eat("punc", ";"):
                continue
            is_static = self.eat("kw", "static")
            is_getter = False
            if self.at("kw", "get") and self.peek(1)[0] in ("ident", "kw") \
                    and self.peek(2)[1] == "(":
                self.next()
                is_getter = True
            self.eat("kw", "async")
            k, mname, _ = self.next()
            if k not in ("ident", "kw"):
                raise JSSyntaxError("jsvm: bad class member %r" % mname)
            params = self.parse_params()
            body = self.parse_block()
            fn = ("funcexpr", mname, params, body)
            if mname == "constructor":
                ctor = fn
            elif is_static:
                statics[mname] = fn
            elif is_getter:
                getters[mname] = fn
            else:
                methods[mname] = fn
        self.expect("punc", "}")
        return ("classdecl", name, ctor, methods, statics, getters)

    def parse_if(self):
        self.expect("kw", "if")
        self.expect("punc", "(")
        cond = self.parse_expression()
        self.expect("punc", ")")
        then = self.parse_statement()
        other = None
        if self.eat("kw", "else"):
            other = self.parse_statement()
        return ("if", cond, then, other)

    def parse_for(self):
        self.expect("kw", "for")
        self.expect("punc", "(")
        init = None
        if not self.at("punc", ";"):
            if self.at("kw") and self.peek()[1] in ("var", "let", "const"):
                init = self.parse_var_decl()
                if self.eat("kw", "of"):
                    it = self.parse_expression()
                    self.expect("punc", ")")
                    body = self.parse_statement()
                    return ("forof", init, it, body)
            else:
                init = ("expr", self.parse_expression())
        self.expect("punc", ";")
        cond = None if self.at("punc", ";") else self.parse_expression()
        self.expect("punc", ";")
        update = None if self.at("punc", ")") else self.parse_expression()
        self.expect("punc", ")")
        body = self.parse_statement()
        return ("for", init, cond, update, body)

    def parse_while(self):
        self.expect("kw", "while")
        self.expect("punc", "(")
        cond = self.parse_expression()
        self.expect("punc", ")")
        body = self.parse_statement()
        return ("while", cond, body)

    def parse_do_while(self):
        self.expect("kw", "do")
        body = self.parse_statement()
        self.expect("kw", "while")
        self.expect("punc", "(")
        cond = self.parse_expression()
        self.expect("punc", ")")
        self.skip_semi()
        return ("dowhile", cond, body)

    def parse_try(self):
        self.expect("kw", "try")
        block = self.parse_block()
        param = None
        catch = None
        final = None
        if self.eat("kw", "catch"):
            if self.eat("punc", "("):
                param = self.expect("ident")
                self.expect("punc", ")")
            catch = self.parse_block()
        if self.eat("kw", "finally"):
            final = self.parse_block()
        return ("try", block, param, catch, final)

    def parse_import(self):
        self.expect("kw", "import")
        names = []
        ns = None
        if self.at("str"):
            path = _unquote(self.next()[1])
            self.skip_semi()
            return ("import", [], None, path)
        if self.eat("punc", "{"):
            while not self.at("punc", "}"):
                orig = self.next()[1]
                local = orig
                if self.at("ident", "as") or self.at("kw", "as"):
                    self.next()
                    local = self.expect("ident")
                names.append((orig, local))
                if not self.eat("punc", ","):
                    break
            self.expect("punc", "}")
        elif self.eat("punc", "*"):
            self.expect("ident")  # 'as'
            ns = self.expect("ident")
        else:
            # default import: treat as namespace binding of 'default'
            names.append(("default", self.expect("ident")))
        self.expect("kw", "from")
        path = _unquote(self.expect("str"))
        self.skip_semi()
        return ("import", names, ns, path)

    def parse_export(self):
        self.expect("kw", "export")
        if self.eat("kw", "default"):
            e = self.parse_expression()
            self.skip_semi()
            return ("export_default", e)
        if self.at("punc", "{"):
            self.next()
            names = []
            while not self.at("punc", "}"):
                names.append(self.next()[1])
                if not self.eat("punc", ","):
                    break
            self.expect("punc", "}")
            self.skip_semi()
            return ("export_names", names)
        stmt = self.parse_statement()
        return ("export_decl", stmt)

    # -- expressions -------------------------------------------------------

    def parse_expression(self):
        e = self.parse_assignment()
        while self.at("punc", ","):
            # comma operator only appears in for-updates in our subset
            self.next()
            r = self.parse_assignment()
            e = ("comma", e, r)
        return e

    def parse_assignment(self):
        start = self.i
        arrow = self.try_parse_arrow()
        if arrow is not None:
            return arrow
        self.i = start
        left = self.parse_ternary()
        k, v, _ = self.peek()
        if k == "punc" and v in _ASSIGN_OPS:
            self.next()
            right = self.parse_assignment()
            return ("assign", v, left, right)
        return left

    def try_parse_arrow(self):
        """(a, b) => ..., a => ..., async (a) => ..."""
        self.eat("kw", "async")
        params = []
        if self.at("ident"):
            params = [(self.next()[1], None)]
        elif self.at("punc", "("):
            try:
                params = self.parse_params()
            except JSSyntaxError:
                return None
        else:
            return None
        if not self.at("punc", "=>"):
            return None
        self.next()
        if self.at("punc", "{"):
            body = self.parse_block()
            return ("arrow", params, body, False)
        body = self.parse_assignment()
        return ("arrow", params, body, True)

    def parse_ternary(self):
        cond = self.parse_binary(0)
        if self.eat("punc", "?"):
            t = self.parse_assignment()
            self.expect("punc", ":")
            f = self.parse_assignment()
            return ("ternary", cond, t, f)
        return cond

    def parse_binary(self, min_prec):
        left = self.parse_unary()
        while True:
            k, v, _ = self.peek()
            op = v if (k == "punc" or (k == "kw" and
                                       v in ("instanceof", "in"))) else None
            prec = _BINOP_PREC.get(op)
            if prec is None or prec < min_prec:
                return left
            self.next()
            right = self.parse_binary(prec + 1)
            if op in ("&&", "||"):
                left = ("logical", op, left, right)
            else:
                left = ("binop", op, left, right)

    def parse_unary(self):
        k, v, _ = self.peek()
        if k == "punc" and v in ("-", "+", "!", "~"):
            self.next()
            return ("unary", v, self.parse_unary())
        if k == "punc" and v in ("++", "--"):
            self.next()
            return ("preincr", v, self.parse_unary())
        if k == "kw" and v in ("typeof", "void", "delete"):
            self.next()
            return ("unary", v, self.parse_unary())
        if k == "kw" and v == "await":
            self.next()
            return self.parse_unary()
        if k == "kw" and v == "new":
            self.next()
            callee = self.parse_postfix(self.parse_primary(),
                                        no_call=True)
            args = []
            if self.at("punc", "("):
                args = self.parse_args()
            return self.parse_postfix(("new", callee, args))
        return self.parse_postfix(self.parse_primary())

    def parse_args(self):
        self.expect("punc", "(")
        args = []
        while not self.at("punc", ")"):
            if self.eat("punc", "..."):
                args.append(("spread", self.parse_assignment()))
            else:
                args.append(self.parse_assignment())
            if not self.eat("punc", ","):
                break
        self.expect("punc", ")")
        return args

    def parse_postfix(self, e, no_call=False):
        while True:
            k, v, _ = self.peek()
            if k == "punc" and v == ".":
                self.next()
                name = self.next()[1]
                e = ("member", e, name)
            elif k == "punc" and v == "[":
                self.next()
                idx = self.parse_expression()
                self.expect("punc", "]")
                e = ("index", e, idx)
            elif k == "punc" and v == "(" and not no_call:
                args = self.parse_args()
                e = ("call", e, args)
            elif k == "punc" and v in ("++", "--"):
                self.next()
                e = ("postincr", v, e)
            else:
                return e

    def parse_primary(self):
        k, v, ln = self.next()
        if k == "num":
            if v.startswith("0x"):
                return ("num", float(int(v, 16)))
            return ("num", float(v))
        if k == "str":
            return ("str", _unquote(v))
        if k == "tmpl":
            return ("tmpl", _parse_template(v))
        if k == "ident":
            return ("ident", v)
        if k == "kw":
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undef",)
            if v == "this":
                return ("this",)
            if v == "function":
                name = None
                if self.at("ident"):
                    name = self.next()[1]
                params = self.parse_params()
                body = self.parse_block()
                return ("funcexpr", name, params, body)
            if v == "async":
                return self.parse_primary()
            if v == "class":
                self.i -= 1
                return self.parse_class_decl()
            if v == "new":
                self.i -= 1
                return self.parse_unary()
        if k == "punc":
            if v == "(":
                e = self.parse_expression()
                self.expect("punc", ")")
                return e
            if v == "[":
                elems = []
                while not self.at("punc", "]"):
                    if self.eat("punc", "..."):
                        elems.append(("spread", self.parse_assignment()))
                    else:
                        elems.append(self.parse_assignment())
                    if not self.eat("punc", ","):
                        break
                self.expect("punc", "]")
                return ("array", elems)
            if v == "{":
                pairs = []
                while not self.at("punc", "}"):
                    if self.eat("punc", "..."):
                        pairs.append(("spread", self.parse_assignment()))
                        if not self.eat("punc", ","):
                            break
                        continue
                    kk, kv, _ = self.next()
                    if kk == "str":
                        key = _unquote(kv)
                    elif kk == "num":
                        key = kv
                    elif kk == "punc" and kv == "[":
                        key = ("computed", self.parse_expression())
                        self.expect("punc", "]")
                    else:
                        key = kv
                    if self.at("punc", "("):
                        params = self.parse_params()
                        body = self.parse_block()
                        pairs.append((key, ("funcexpr", key, params, body)))
                    elif self.eat("punc", ":"):
                        pairs.append((key, self.parse_assignment()))
                    else:
                        pairs.append((key, ("ident", key)))
                    if not self.eat("punc", ","):
                        break
                self.expect("punc", "}")
                return ("object", pairs)
        raise JSSyntaxError("jsvm %s:%d: unexpected token %s %r"
                           % (self.src_name, ln, k, v))


def _pattern_names(target):
    kind = target[0]
    if kind == "name_pat":
        return [target[1]]
    if kind == "obj_pat":
        return [name for _, name in target[1]]
    if kind == "arr_pat":
        return list(target[1])
    return []


def _unquote(s):
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                        "'": "'", '"': '"', "`": "`", "0": "\0",
                        "$": "$"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_template(raw):
    """`a ${x} b` -> list of ('str', s) / parsed exprs."""
    body = raw[1:-1]
    parts = []
    buf = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            buf.append(_unquote("'" + body[i:i + 2] + "'"))
            i += 2
            continue
        if c == "$" and i + 1 < len(body) and body[i + 1] == "{":
            if buf:
                parts.append(("str", "".join(buf)))
                buf = []
            depth = 1
            j = i + 2
            while j < len(body) and depth:
                if body[j] == "{":
                    depth += 1
                elif body[j] == "}":
                    depth -= 1
                j += 1
            expr_src = body[i + 2:j - 1]
            p = Parser(tokenize_js(expr_src), "<template>")
            parts.append(p.parse_expression())
            i = j
            continue
        buf.append(c)
        i += 1
    if buf:
        parts.append(("str", "".join(buf)))
    return parts


# ---------------------------------------------------------------------------
# Runtime helpers

def js_truthy(v):
    if v is UNDEF or v is None or v is False:
        return False
    if isinstance(v, float):
        return v != 0.0 and not math.isnan(v)
    if isinstance(v, int) and not isinstance(v, bool):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_to_str(v):
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return _num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join(js_to_str(x) for x in v)
    if isinstance(v, JSObject):
        if "message" in v.props:
            name = v.props.get("name", "Error")
            return "%s: %s" % (js_to_str(name),
                               js_to_str(v.props["message"]))
        return "[object Object]"
    return str(v)


def _num_str(v):
    f = float(v)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def js_num(v):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        try:
            return float(v) if v.strip() else 0.0
        except ValueError:
            return float("nan")
    if v is None:
        return 0.0
    return float("nan")


def js_eq_strict(a, b):
    if a is UNDEF and b is UNDEF:
        return True
    if a is None and b is None:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def _as_index(v):
    if isinstance(v, bool):
        raise JSThrow(make_error("bad array index"))
    if isinstance(v, float):
        return int(v)
    if isinstance(v, int):
        return v
    return v  # string keys on objects


def make_error(msg, name="Error"):
    return JSObject({"message": msg, "name": name, "stack": ""})


class Env(object):
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise JSThrow(make_error("%s is not defined" % name,
                                 "ReferenceError"))

    def has(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False

    def set_existing(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        # implicit global (shouldn't happen in module code)
        self.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSSet(object):
    __slots__ = ("data",)

    def __init__(self, items=None):
        self.data = []
        if items:
            for x in items:
                self.add(x)

    def add(self, x):
        if not self.has(x):
            self.data.append(x)
        return self

    def has(self, x):
        return any(js_eq_strict(x, y) for y in self.data)

    @property
    def size(self):
        return len(self.data)


class JSMap(object):
    __slots__ = ("keys", "vals")

    def __init__(self):
        self.keys = []
        self.vals = []

    def _find(self, k):
        for i, kk in enumerate(self.keys):
            if js_eq_strict(k, kk):
                return i
        return -1

    def get(self, k):
        i = self._find(k)
        return self.vals[i] if i >= 0 else UNDEF

    def set(self, k, v):
        i = self._find(k)
        if i >= 0:
            self.vals[i] = v
        else:
            self.keys.append(k)
            self.vals.append(v)
        return self

    def has(self, k):
        return self._find(k) >= 0

    @property
    def size(self):
        return len(self.keys)


# ---------------------------------------------------------------------------
# Interpreter

class Interpreter(object):
    def __init__(self, module_root):
        self.module_root = module_root
        self.modules = {}  # abspath -> exports dict
        self.console_lines = []

    # -- module loading ----------------------------------------------------

    def load_module(self, path):
        path = os.path.abspath(path)
        if path in self.modules:
            return self.modules[path]
        with open(path) as f:
            src = f.read()
        ast = Parser(tokenize_js(src), os.path.basename(path)).parse_module()
        env = Env(self.global_env())
        exports = {}
        self.modules[path] = exports  # provisional (cycles)
        self._hoist(ast[1], env)
        for stmt in ast[1]:
            self.exec_module_stmt(stmt, env, exports,
                                  os.path.dirname(path))
        return exports

    def exec_module_stmt(self, stmt, env, exports, moddir):
        tag = stmt[0]
        if tag == "import":
            _, names, ns, relpath = stmt
            target = os.path.normpath(os.path.join(moddir, relpath))
            mod = self.load_module(target)
            for orig, local in names:
                if orig not in mod:
                    raise JSSyntaxError("jsvm: %s does not export %s"
                                       % (relpath, orig))
                env.declare(local, mod[orig])
            if ns:
                env.declare(ns, JSObject(dict(mod)))
            return
        if tag == "export_decl":
            inner = stmt[1]
            self.exec_stmt(inner, env)
            if inner[0] == "funcdecl":
                exports[inner[1]] = env.lookup(inner[1])
            elif inner[0] == "classdecl":
                exports[inner[1]] = env.lookup(inner[1])
            elif inner[0] == "var":
                for target, _ in inner[2]:
                    for nm in _pattern_names(target):
                        exports[nm] = env.lookup(nm)
            return
        if tag == "export_names":
            for nm in stmt[1]:
                exports[nm] = env.lookup(nm)
            return
        if tag == "export_default":
            exports["default"] = self.eval(stmt[1], env)
            return
        self.exec_stmt(stmt, env)

    def _hoist(self, stmts, env):
        for s in stmts:
            if s[0] == "funcdecl":
                env.declare(s[1], self._make_fn(s[1], s[2], s[3], env))
            elif s[0] == "export_decl" and s[1][0] == "funcdecl":
                d = s[1]
                env.declare(d[1], self._make_fn(d[1], d[2], d[3], env))

    # -- globals -----------------------------------------------------------

    def global_env(self):
        if hasattr(self, "_genv"):
            return self._genv
        g = Env()
        inf = float("inf")

        def native(fn):
            return fn

        math_obj = JSObject({
            "log": native(lambda x: _safe_log(js_num(x))),
            "log2": native(lambda x: _safe(lambda: math.log2(js_num(x)))),
            "log1p": native(lambda x: _safe(lambda: math.log1p(js_num(x)))),
            "exp": native(lambda x: _safe_exp(js_num(x))),
            "expm1": native(lambda x: _safe(lambda: math.expm1(js_num(x)))),
            "sqrt": native(lambda x: _safe(lambda: math.sqrt(js_num(x)))),
            "abs": native(lambda x: abs(js_num(x))),
            "floor": native(lambda x: _int_or_inf(math.floor, js_num(x))),
            "ceil": native(lambda x: _int_or_inf(math.ceil, js_num(x))),
            "round": native(lambda x: _int_or_inf(
                lambda y: math.floor(y + 0.5), js_num(x))),
            "trunc": native(lambda x: _int_or_inf(math.trunc, js_num(x))),
            "sign": native(lambda x: (0.0 if js_num(x) == 0 else
                                      math.copysign(1.0, js_num(x)))),
            "pow": native(lambda a, b: float(js_num(a)) ** js_num(b)),
            "max": native(lambda *a: max(js_num(x) for x in a)
                          if a else -inf),
            "min": native(lambda *a: min(js_num(x) for x in a)
                          if a else inf),
            "random": native(lambda: 0.5),   # determinism for tests
            "hypot": native(lambda *a: math.hypot(*[js_num(x)
                                                    for x in a])),
            "fround": native(_js_fround),
            "cbrt": native(lambda x: math.copysign(
                abs(js_num(x)) ** (1.0 / 3.0), js_num(x))),
            "atan2": native(lambda y, x: math.atan2(js_num(y),
                                                    js_num(x))),
            "E": math.e, "PI": math.pi, "LN2": math.log(2),
            "LN10": math.log(10),
        })
        json_obj = JSObject({
            "parse": native(lambda s: _json_to_js(json.loads(s))),
            "stringify": native(_js_json_stringify),
        })
        object_obj = JSObject({
            "keys": native(lambda o: list(o.props.keys())
                           if isinstance(o, JSObject) else []),
            "values": native(lambda o: list(o.props.values())
                             if isinstance(o, JSObject) else []),
            "entries": native(lambda o: [[k, v] for k, v
                                         in o.props.items()]
                              if isinstance(o, JSObject) else []),
            "assign": native(_js_object_assign),
            "freeze": native(lambda o: o),
            "create": native(lambda proto: JSObject()),
        })
        array_obj = JSObject({
            "isArray": native(lambda v: isinstance(v, list)),
            "from": native(_js_array_from),
        })
        number_obj = JSObject({
            "isFinite": native(lambda v: isinstance(v, (int, float))
                               and not isinstance(v, bool)
                               and math.isfinite(v)),
            "isInteger": native(lambda v: isinstance(v, (int, float))
                                and not isinstance(v, bool)
                                and float(v).is_integer()),
            "isNaN": native(lambda v: isinstance(v, float)
                            and math.isnan(v)),
            "parseFloat": native(lambda s: js_num(s)),
            "POSITIVE_INFINITY": inf, "NEGATIVE_INFINITY": -inf,
            "MAX_SAFE_INTEGER": float(2 ** 53 - 1),
            "MAX_VALUE": 1.7976931348623157e308,
            "MIN_VALUE": 5e-324, "EPSILON": 2.220446049250313e-16,
            "NaN": float("nan"),
        })
        console_obj = JSObject({
            "log": native(lambda *a: self.console_lines.append(
                " ".join(js_to_str(x) for x in a))),
            "warn": native(lambda *a: self.console_lines.append(
                "WARN " + " ".join(js_to_str(x) for x in a))),
            "error": native(lambda *a: self.console_lines.append(
                "ERROR " + " ".join(js_to_str(x) for x in a))),
        })
        promise_obj = JSObject({
            "all": native(lambda arr: list(arr)),
            "resolve": native(lambda v=UNDEF: v),
        })

        g.declare("Math", math_obj)
        g.declare("JSON", json_obj)
        g.declare("Object", object_obj)
        g.declare("Array", array_obj)
        g.declare("Number", number_obj)
        g.declare("console", console_obj)
        g.declare("Promise", promise_obj)
        g.declare("Infinity", inf)
        g.declare("NaN", float("nan"))
        g.declare("undefined", UNDEF)
        g.declare("globalThis", JSObject({}))
        g.declare("parseInt",
                  lambda s, base=10: float(int(str(js_to_str(s)),
                                               int(js_num(base)))))
        g.declare("parseFloat", lambda s: js_num(s))
        g.declare("isFinite", lambda v: math.isfinite(js_num(v)))
        g.declare("isNaN", lambda v: math.isnan(js_num(v)))
        for name in ("Float64Array", "Float32Array", "Int32Array",
                     "Uint32Array", "Uint8Array", "Int8Array",
                     "Uint16Array", "Int16Array"):
            g.declare(name, _TypedArrayCtor(name))
        g.declare("Set", JSSet)
        g.declare("Map", JSMap)
        for ename in ("Error", "TypeError", "RangeError", "SyntaxError"):
            g.declare(ename, _ErrorCtor(ename))
        g.declare("String", lambda v=UNDEF: js_to_str(v))
        g.declare("Boolean", lambda v=UNDEF: js_truthy(v))
        self._genv = g
        return g

    # -- statement execution ----------------------------------------------

    def exec_stmt(self, stmt, env):
        tag = stmt[0]
        if tag == "expr":
            self.eval(stmt[1], env)
        elif tag == "var":
            for target, init in stmt[2]:
                val = self.eval(init, env) if init is not None else UNDEF
                self._bind_pattern(target, val, env)
        elif tag == "block":
            benv = Env(env)
            self._hoist(stmt[1], benv)
            for s in stmt[1]:
                self.exec_stmt(s, benv)
        elif tag == "if":
            if js_truthy(self.eval(stmt[1], env)):
                self.exec_stmt(stmt[2], env)
            elif stmt[3] is not None:
                self.exec_stmt(stmt[3], env)
        elif tag == "for":
            fenv = Env(env)
            if stmt[1] is not None:
                self.exec_stmt(stmt[1], fenv)
            while stmt[2] is None or js_truthy(self.eval(stmt[2], fenv)):
                try:
                    self.exec_stmt(stmt[4], fenv)
                except _Break:
                    break
                except _Continue:
                    pass
                if stmt[3] is not None:
                    self.eval(stmt[3], fenv)
        elif tag == "forof":
            _, decl, it_expr, body = stmt
            target = decl[2][0][0]
            it = self.eval(it_expr, env)
            for item in _js_iter(it):
                fenv = Env(env)
                self._bind_pattern(target, item, fenv)
                try:
                    self.exec_stmt(body, fenv)
                except _Break:
                    break
                except _Continue:
                    pass
        elif tag == "while":
            while js_truthy(self.eval(stmt[1], env)):
                try:
                    self.exec_stmt(stmt[2], env)
                except _Break:
                    break
                except _Continue:
                    pass
        elif tag == "dowhile":
            while True:
                try:
                    self.exec_stmt(stmt[2], env)
                except _Break:
                    break
                except _Continue:
                    pass
                if not js_truthy(self.eval(stmt[1], env)):
                    break
        elif tag == "return":
            raise _Return(self.eval(stmt[1], env)
                          if stmt[1] is not None else UNDEF)
        elif tag == "break":
            raise _Break()
        elif tag == "continue":
            raise _Continue()
        elif tag == "throw":
            raise JSThrow(self.eval(stmt[1], env))
        elif tag == "try":
            _, block, param, catch, final = stmt
            try:
                self.exec_stmt(block, env)
            except JSThrow as ex:
                if catch is not None:
                    cenv = Env(env)
                    if param:
                        cenv.declare(param, ex.value)
                    self.exec_stmt(catch, cenv)
                elif final is None:
                    raise
            finally:
                if final is not None:
                    self.exec_stmt(final, env)
        elif tag == "funcdecl":
            env.declare(stmt[1], self._make_fn(stmt[1], stmt[2], stmt[3],
                                               env))
        elif tag == "classdecl":
            env.declare(stmt[1], self._make_class(stmt, env))
        elif tag == "empty":
            pass
        elif tag in ("import", "export_decl", "export_names",
                     "export_default"):
            raise JSSyntaxError("jsvm: import/export only at module top "
                               "level")
        else:
            raise JSSyntaxError("jsvm: unknown statement %r" % (tag,))

    def _bind_pattern(self, target, val, env):
        kind = target[0]
        if kind == "name_pat":
            env.declare(target[1], val)
        elif kind == "obj_pat":
            for key, name in target[1]:
                env.declare(name, self.get_member(val, key))
        elif kind == "arr_pat":
            for i, name in enumerate(target[1]):
                env.declare(name,
                            val[i] if isinstance(val, list)
                            and i < len(val) else UNDEF)
        else:
            raise JSSyntaxError("jsvm: bad binding %r" % (kind,))

    def _make_fn(self, name, params, body, env, this=UNDEF, arrow=False,
                 expr_body=False):
        return JSFunction(name or "<anon>", params, body, env, this,
                          arrow, expr_body)

    def _make_class(self, stmt, env):
        _, name, ctor, methods, statics, getters = stmt
        mk = lambda fe: self._make_fn(fe[1], fe[2], fe[3], env)
        cls = JSClass(
            name,
            mk(ctor) if ctor else None,
            {k: mk(v) for k, v in methods.items()},
            {k: mk(v) for k, v in statics.items()},
            {k: mk(v) for k, v in getters.items()})
        return cls

    # -- function calls ----------------------------------------------------

    def call(self, fn, args, this=UNDEF):
        if isinstance(fn, BoundMethod):
            return self.call(fn.fn, args, fn.this)
        if isinstance(fn, JSFunction):
            env = Env(fn.env)
            for i, (pname, default) in enumerate(fn.params):
                if i < len(args) and args[i] is not UNDEF:
                    env.declare(pname, args[i])
                elif default is not None:
                    env.declare(pname, self.eval(default, env))
                else:
                    env.declare(pname, UNDEF)
            env.declare("arguments", list(args))
            use_this = fn.this if fn.is_arrow else this
            env.declare("this", use_this)
            if fn.is_expr_body:
                return self.eval(fn.body, env)
            try:
                self._hoist(fn.body[1], env)
                for s in fn.body[1]:
                    self.exec_stmt(s, env)
            except _Return as r:
                return r.value
            return UNDEF
        if isinstance(fn, JSClass):
            raise JSThrow(make_error(
                "Class constructor %s cannot be invoked without 'new'"
                % fn.name, "TypeError"))
        if callable(fn):
            return fn(*args)
        raise JSThrow(make_error("%s is not a function" % js_to_str(fn),
                                 "TypeError"))

    def construct(self, ctor, args):
        if isinstance(ctor, JSClass):
            obj = JSObject({}, ctor)
            if ctor.ctor is not None:
                self.call(ctor.ctor, args, obj)
            return obj
        if isinstance(ctor, (_TypedArrayCtor, _ErrorCtor)):
            return ctor(*args)
        if ctor is JSSet:
            return JSSet(args[0] if args else None)
        if ctor is JSMap:
            return JSMap()
        if isinstance(ctor, JSObject) and "isArray" in ctor.props:
            # `new Array(n)`
            n = int(js_num(args[0])) if args else 0
            return [UNDEF] * n
        if callable(ctor):
            return ctor(*args)
        raise JSThrow(make_error("not a constructor", "TypeError"))

    # -- member access -----------------------------------------------------

    def get_member(self, obj, name):
        if obj is UNDEF or obj is None:
            raise JSThrow(make_error(
                "Cannot read properties of %s (reading '%s')"
                % (js_to_str(obj), name), "TypeError"))
        if isinstance(obj, JSObject):
            if name in obj.props:
                v = obj.props[name]
                if isinstance(v, JSFunction) and obj.cls is None:
                    return BoundMethod(v, obj)
                return v
            if obj.cls is not None:
                if name in obj.cls.methods:
                    return BoundMethod(obj.cls.methods[name], obj)
                if name in obj.cls.getters:
                    return self.call(obj.cls.getters[name], [], obj)
            return UNDEF
        if isinstance(obj, JSClass):
            if name in obj.statics:
                return obj.statics[name]
            if name == "name":
                return obj.name
            return UNDEF
        if isinstance(obj, list):
            return _list_member(self, obj, name)
        if isinstance(obj, str):
            return _str_member(self, obj, name)
        if isinstance(obj, (JSSet, JSMap)):
            if name == "size":
                return float(obj.size)
            meth = getattr(obj, name, None)
            if meth is None:
                return UNDEF
            return meth
        if isinstance(obj, (int, float)) and not isinstance(obj, bool):
            if name == "toFixed":
                return lambda nd=0: "%.*f" % (int(js_num(nd)), obj)
            if name == "toString":
                return lambda base=10: (_num_str(obj)
                                        if js_num(base) == 10 else
                                        _to_base(int(obj),
                                                 int(js_num(base))))
            return UNDEF
        if isinstance(obj, bool):
            return UNDEF
        if isinstance(obj, JSFunction):
            if name == "call":
                f = obj

                def _call(this=UNDEF, *a):
                    return self.call(f, list(a), this)
                return _call
            if name == "name":
                return obj.name
            return UNDEF
        if callable(obj):
            return UNDEF
        raise JSThrow(make_error("cannot read %r of %r" % (name, obj),
                                 "TypeError"))

    def set_member(self, obj, name, value):
        if isinstance(obj, JSObject):
            obj.props[name] = value
            return
        if isinstance(obj, list):
            if name == "length":
                n = int(js_num(value))
                del obj[n:]
                while len(obj) < n:
                    obj.append(UNDEF)
                return
            i = _as_index(name) if not isinstance(name, str) else None
            if isinstance(i, int):
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = value
                return
        raise JSThrow(make_error("cannot set %r on %s"
                                 % (name, type(obj).__name__),
                                 "TypeError"))

    # -- expression evaluation --------------------------------------------

    def eval(self, node, env):
        tag = node[0]
        if tag == "num":
            return node[1]
        if tag == "str":
            return node[1]
        if tag == "bool":
            return node[1]
        if tag == "null":
            return None
        if tag == "undef":
            return UNDEF
        if tag == "ident":
            return env.lookup(node[1])
        if tag == "this":
            return env.lookup("this") if env.has("this") else UNDEF
        if tag == "tmpl":
            out = []
            for part in node[1]:
                if part[0] == "str":
                    out.append(part[1])
                else:
                    out.append(js_to_str(self.eval(part, env)))
            return "".join(out)
        if tag == "array":
            out = []
            for e in node[1]:
                if e[0] == "spread":
                    out.extend(_js_iter(self.eval(e[1], env)))
                else:
                    out.append(self.eval(e, env))
            return out
        if tag == "object":
            props = {}
            for key, vexpr in node[1]:
                if key == "spread" and isinstance(vexpr, tuple):
                    src = self.eval(vexpr, env)
                    if isinstance(src, JSObject):
                        props.update(src.props)
                    continue
                if isinstance(key, tuple) and key[0] == "computed":
                    key = js_to_str(self.eval(key[1], env))
                props[key] = self.eval(vexpr, env)
            return JSObject(props)
        if tag == "funcexpr":
            this = env.lookup("this") if env.has("this") else UNDEF
            return self._make_fn(node[1], node[2], node[3], env, this)
        if tag == "arrow":
            this = env.lookup("this") if env.has("this") else UNDEF
            return self._make_fn("<arrow>", node[1], node[2], env, this,
                                 arrow=True, expr_body=node[3])
        if tag == "classdecl":
            return self._make_class(node, env)
        if tag == "member":
            return self.get_member(self.eval(node[1], env), node[2])
        if tag == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            return self._get_index(obj, idx)
        if tag == "call":
            callee = node[1]
            if callee[0] == "member":
                obj = self.eval(callee[1], env)
                fn = self.get_member(obj, callee[2])
                args = self._eval_args(node[2], env)
                return self.call(fn, args, obj)
            if callee[0] == "index":
                obj = self.eval(callee[1], env)
                key = self.eval(callee[2], env)
                fn = self._get_index(obj, key)
                args = self._eval_args(node[2], env)
                return self.call(fn, args, obj)
            fn = self.eval(callee, env)
            args = self._eval_args(node[2], env)
            return self.call(fn, args)
        if tag == "new":
            ctor = self.eval(node[1], env)
            args = self._eval_args(node[2], env)
            return self.construct(ctor, args)
        if tag == "unary":
            op = node[1]
            if op == "typeof":
                inner = node[2]
                if inner[0] == "ident" and not env.has(inner[1]):
                    return "undefined"
                v = self.eval(inner, env)
                return _js_typeof(v)
            v = self.eval(node[2], env)
            if op == "-":
                return -js_num(v)
            if op == "+":
                return js_num(v)
            if op == "!":
                return not js_truthy(v)
            if op == "~":
                return float(~int(js_num(v)))
            if op == "void":
                return UNDEF
            if op == "delete":
                return True
        if tag == "preincr" or tag == "postincr":
            target = node[2]
            old = js_num(self.eval(target, env))
            new = old + (1 if node[1] == "++" else -1)
            self._assign_to(target, new, env)
            return new if tag == "preincr" else old
        if tag == "binop":
            return self._binop(node[1], self.eval(node[2], env),
                               self.eval(node[3], env))
        if tag == "logical":
            left = self.eval(node[2], env)
            if node[1] == "&&":
                return self.eval(node[3], env) if js_truthy(left) else left
            return left if js_truthy(left) else self.eval(node[3], env)
        if tag == "ternary":
            return (self.eval(node[2], env)
                    if js_truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if tag == "assign":
            op = node[1]
            if op == "=":
                val = self.eval(node[3], env)
            else:
                cur = self.eval(node[2], env)
                rhs = self.eval(node[3], env)
                val = self._binop(op[:-1], cur, rhs)
            self._assign_to(node[2], val, env)
            return val
        if tag == "comma":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        raise JSSyntaxError("jsvm: cannot evaluate node %r" % (tag,))

    def _eval_args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(_js_iter(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args

    def _get_index(self, obj, idx):
        if isinstance(obj, list):
            i = _as_index(idx)
            if isinstance(i, int):
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            return _list_member(self, obj, i)
        if isinstance(obj, str):
            i = _as_index(idx)
            if isinstance(i, int):
                return obj[i] if 0 <= i < len(obj) else UNDEF
            return _str_member(self, obj, i)
        if isinstance(obj, JSObject):
            return self.get_member(obj, js_to_str(idx)
                                   if not isinstance(idx, str) else idx)
        raise JSThrow(make_error("cannot index %s" % type(obj).__name__,
                                 "TypeError"))

    def _assign_to(self, target, val, env):
        tag = target[0]
        if tag == "ident":
            env.set_existing(target[1], val)
        elif tag == "member":
            self.set_member(self.eval(target[1], env), target[2], val)
        elif tag == "index":
            obj = self.eval(target[1], env)
            idx = self.eval(target[2], env)
            if isinstance(obj, list):
                i = _as_index(idx)
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = val
            elif isinstance(obj, JSObject):
                key = idx if isinstance(idx, str) else js_to_str(idx)
                obj.props[key] = val
            else:
                raise JSThrow(make_error("cannot index-assign",
                                         "TypeError"))
        else:
            raise JSSyntaxError("jsvm: invalid assignment target %r"
                               % (tag,))

    def _binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return js_to_str(a) + js_to_str(b)
            return js_num(a) + js_num(b)
        if op == "-":
            return js_num(a) - js_num(b)
        if op == "*":
            return js_num(a) * js_num(b)
        if op == "/":
            x, y = js_num(a), js_num(b)
            if y == 0:
                if x == 0 or math.isnan(x):
                    return float("nan")
                return math.copysign(float("inf"), x)
            return x / y
        if op == "%":
            x, y = js_num(a), js_num(b)
            if y == 0:
                return float("nan")
            return math.fmod(x, y)
        if op == "**":
            return float(js_num(a)) ** js_num(b)
        if op == "===":
            return js_eq_strict(a, b)
        if op == "!==":
            return not js_eq_strict(a, b)
        if op == "==":
            if (a is None or a is UNDEF) and (b is None or b is UNDEF):
                return True
            return js_eq_strict(a, b)
        if op == "!=":
            if (a is None or a is UNDEF) and (b is None or b is UNDEF):
                return False
            return not js_eq_strict(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            else:
                a, b = js_num(a), js_num(b)
                if isinstance(a, float) and math.isnan(a):
                    return False
                if isinstance(b, float) and math.isnan(b):
                    return False
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            return a >= b
        if op == "&":
            return float(int(js_num(a)) & int(js_num(b)))
        if op == "|":
            return float(int(js_num(a)) | int(js_num(b)))
        if op == "^":
            return float(int(js_num(a)) ^ int(js_num(b)))
        if op == "<<":
            return float(int(js_num(a)) << (int(js_num(b)) & 31))
        if op == ">>":
            return float(int(js_num(a)) >> (int(js_num(b)) & 31))
        if op == "instanceof":
            if isinstance(b, JSClass):
                return isinstance(a, JSObject) and a.cls is b
            if isinstance(b, _ErrorCtor):
                return isinstance(a, JSObject) and "message" in a.props
            if isinstance(b, _TypedArrayCtor):
                return isinstance(a, list)
            return False
        if op == "in":
            if isinstance(b, JSObject):
                key = a if isinstance(a, str) else js_to_str(a)
                return key in b.props
            if isinstance(b, list):
                return 0 <= _as_index(a) < len(b)
            raise JSThrow(make_error("'in' on non-object", "TypeError"))
        raise JSSyntaxError("jsvm: unknown operator %r" % op)


# ---------------------------------------------------------------------------
# Builtin member dispatch

def _list_member(interp, obj, name):
    if name == "length":
        return float(len(obj))
    if name == "push":
        def _push(*xs):
            obj.extend(xs)
            return float(len(obj))
        return _push
    if name == "pop":
        return lambda: obj.pop() if obj else UNDEF
    if name == "shift":
        return lambda: obj.pop(0) if obj else UNDEF
    if name == "unshift":
        def _unshift(*xs):
            obj[0:0] = list(xs)
            return float(len(obj))
        return _unshift
    if name == "fill":
        def _fill(v, start=0.0, end=None):
            s = int(js_num(start))
            e = len(obj) if end is None else int(js_num(end))
            for i in range(max(s, 0), min(e, len(obj))):
                obj[i] = v
            return obj
        return _fill
    if name == "slice":
        def _slice(start=0.0, end=None):
            s = int(js_num(start))
            e = len(obj) if end is None else int(js_num(end))
            return list(obj[s:e] if s >= 0 else obj[s:]) if end is None \
                else list(obj[s:e])
        return _slice
    if name == "subarray":
        def _subarray(start=0.0, end=None):
            s = int(js_num(start))
            e = len(obj) if end is None else int(js_num(end))
            return obj[s:e]
        return _subarray
    if name == "concat":
        def _concat(*xs):
            out = list(obj)
            for x in xs:
                if isinstance(x, list):
                    out.extend(x)
                else:
                    out.append(x)
            return out
        return _concat
    if name == "join":
        return lambda sep=",": (js_to_str(sep)).join(
            js_to_str(x) for x in obj)
    if name == "indexOf":
        def _index_of(x, start=0.0):
            for i in range(int(js_num(start)), len(obj)):
                if js_eq_strict(obj[i], x):
                    return float(i)
            return -1.0
        return _index_of
    if name == "includes":
        return lambda x: any(js_eq_strict(x, y) for y in obj)
    if name == "map":
        return lambda fn: [interp.call(fn, [v, float(i), obj])
                           for i, v in enumerate(obj)]
    if name == "filter":
        return lambda fn: [v for i, v in enumerate(obj)
                           if js_truthy(interp.call(fn,
                                                    [v, float(i), obj]))]
    if name == "forEach":
        def _foreach(fn):
            for i, v in enumerate(obj):
                interp.call(fn, [v, float(i), obj])
            return UNDEF
        return _foreach
    if name == "reduce":
        def _reduce(fn, *init):
            if init:
                acc = init[0]
                items = list(enumerate(obj))
            else:
                acc = obj[0]
                items = list(enumerate(obj))[1:]
            for i, v in items:
                acc = interp.call(fn, [acc, v, float(i), obj])
            return acc
        return _reduce
    if name == "some":
        return lambda fn: any(js_truthy(interp.call(fn, [v, float(i),
                                                         obj]))
                              for i, v in enumerate(obj))
    if name == "every":
        return lambda fn: all(js_truthy(interp.call(fn, [v, float(i),
                                                         obj]))
                              for i, v in enumerate(obj))
    if name == "find":
        def _find(fn):
            for i, v in enumerate(obj):
                if js_truthy(interp.call(fn, [v, float(i), obj])):
                    return v
            return UNDEF
        return _find
    if name == "sort":
        def _sort(fn=None):
            if fn is None:
                obj.sort(key=js_to_str)
            else:
                import functools
                obj.sort(key=functools.cmp_to_key(
                    lambda x, y: (-1 if js_num(interp.call(fn, [x, y])) < 0
                                  else (1 if js_num(interp.call(
                                      fn, [x, y])) > 0 else 0))))
            return obj
        return _sort
    if name == "reverse":
        def _reverse():
            obj.reverse()
            return obj
        return _reverse
    if name == "set":
        def _set(src, offset=0.0):
            off = int(js_num(offset))
            for i, v in enumerate(src):
                obj[off + i] = v
            return UNDEF
        return _set
    if name == "flat":
        def _flat(depth=1.0):
            out = []
            for x in obj:
                if isinstance(x, list) and js_num(depth) >= 1:
                    out.extend(x)
                else:
                    out.append(x)
            return out
        return _flat
    if name == "keys":
        return lambda: [float(i) for i in range(len(obj))]
    return UNDEF


def _str_member(interp, s, name):
    if name == "length":
        return float(len(s))
    if name == "split":
        def _split(sep=UNDEF, limit=None):
            if sep is UNDEF:
                return [s]
            if sep == "":
                return list(s)
            return s.split(sep)
        return _split
    if name == "charAt":
        return lambda i=0.0: (s[int(js_num(i))]
                              if 0 <= int(js_num(i)) < len(s) else "")
    if name == "charCodeAt":
        return lambda i=0.0: (float(ord(s[int(js_num(i))]))
                              if 0 <= int(js_num(i)) < len(s)
                              else float("nan"))
    if name == "indexOf":
        return lambda sub, start=0.0: float(
            s.find(js_to_str(sub), int(js_num(start))))
    if name == "lastIndexOf":
        return lambda sub: float(s.rfind(js_to_str(sub)))
    if name == "includes":
        return lambda sub: js_to_str(sub) in s
    if name == "startsWith":
        return lambda sub: s.startswith(js_to_str(sub))
    if name == "endsWith":
        return lambda sub: s.endswith(js_to_str(sub))
    if name == "slice":
        def _slice(start=0.0, end=None):
            st = int(js_num(start))
            if end is None:
                return s[st:]
            return s[st:int(js_num(end))]
        return _slice
    if name == "substring":
        def _substring(start=0.0, end=None):
            st = max(0, int(js_num(start)))
            e = len(s) if end is None else max(0, int(js_num(end)))
            if st > e:
                st, e = e, st
            return s[st:e]
        return _substring
    if name == "toUpperCase":
        return lambda: s.upper()
    if name == "toLowerCase":
        return lambda: s.lower()
    if name == "trim":
        return lambda: s.strip()
    if name == "replace":
        return lambda a, b: s.replace(js_to_str(a), js_to_str(b), 1)
    if name == "replaceAll":
        return lambda a, b: s.replace(js_to_str(a), js_to_str(b))
    if name == "repeat":
        return lambda n: s * int(js_num(n))
    if name == "padStart":
        return lambda n, fill=" ": s.rjust(int(js_num(n)),
                                           js_to_str(fill)[:1] or " ")
    if name == "padEnd":
        return lambda n, fill=" ": s.ljust(int(js_num(n)),
                                           js_to_str(fill)[:1] or " ")
    if name == "concat":
        return lambda *xs: s + "".join(js_to_str(x) for x in xs)
    if name == "toString":
        return lambda: s
    return UNDEF


class _TypedArrayCtor(object):
    def __init__(self, name):
        self.name = name
        self.is_float = name.startswith("Float")

    def __call__(self, arg=0.0):
        if isinstance(arg, list):
            if self.is_float:
                return [js_num(x) for x in arg]
            return [float(int(js_num(x))) for x in arg]
        n = int(js_num(arg))
        return [0.0] * n

    def __repr__(self):
        return "function %s()" % self.name


class _ErrorCtor(object):
    def __init__(self, name):
        self.name = name

    def __call__(self, msg=""):
        return make_error(js_to_str(msg), self.name)


def _js_iter(v):
    if isinstance(v, list):
        return list(v)
    if isinstance(v, str):
        return list(v)
    if isinstance(v, JSSet):
        return list(v.data)
    if isinstance(v, JSMap):
        return [[k, val] for k, val in zip(v.keys, v.vals)]
    if isinstance(v, JSObject):
        raise JSThrow(make_error("object is not iterable", "TypeError"))
    raise JSThrow(make_error("%s is not iterable" % js_to_str(v),
                             "TypeError"))


def _js_typeof(v):
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (JSFunction, BoundMethod, JSClass, _TypedArrayCtor,
                      _ErrorCtor)) or callable(v):
        return "function"
    return "object"


def _json_to_js(v):
    if isinstance(v, dict):
        return JSObject({k: _json_to_js(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_json_to_js(x) for x in v]
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def js_to_python(v):
    """Convert an interpreter value to plain Python (for assertions)."""
    if v is UNDEF:
        return None
    if isinstance(v, JSObject):
        return {k: js_to_python(x) for k, x in v.props.items()}
    if isinstance(v, list):
        return [js_to_python(x) for x in v]
    if isinstance(v, JSSet):
        return [js_to_python(x) for x in v.data]
    return v


def python_to_js(v):
    """Convert plain Python data to interpreter values."""
    if v is None:
        return None
    if isinstance(v, dict):
        return JSObject({k: python_to_js(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return [python_to_js(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def _js_json_stringify(v, replacer=None, indent=None):
    def conv(x):
        if x is UNDEF:
            return None
        if isinstance(x, JSObject):
            return {k: conv(val) for k, val in x.props.items()
                    if val is not UNDEF}
        if isinstance(x, list):
            return [conv(e) for e in x]
        if isinstance(x, float) and x.is_integer() and abs(x) < 1e15:
            return int(x)
        return x
    kw = {}
    if indent is not None and indent is not UNDEF:
        kw["indent"] = int(js_num(indent))
        kw["separators"] = (",", ": ")
    else:
        kw["separators"] = (",", ":")
    return json.dumps(conv(v), **kw)


def _js_object_assign(target, *sources):
    for s in sources:
        if isinstance(s, JSObject):
            target.props.update(s.props)
    return target


def _js_array_from(src, fn=None):
    items = _js_iter(src)
    if fn is not None and fn is not UNDEF:
        raise JSThrow(make_error("Array.from mapper not supported"))
    return items


def _safe(f):
    try:
        return f()
    except ValueError:
        return float("nan")
    except OverflowError:
        return float("inf")


def _safe_log(x):
    if x < 0:
        return float("nan")
    if x == 0:
        return float("-inf")
    if math.isinf(x):
        return x if x > 0 else float("nan")
    if math.isnan(x):
        return x
    return math.log(x)


def _safe_exp(x):
    if math.isnan(x):
        return x
    if x == float("-inf"):
        return 0.0
    try:
        return math.exp(x)
    except OverflowError:
        return float("inf")


def _js_fround(x):
    import struct
    v = js_num(x)
    if not math.isfinite(v):
        return v
    return struct.unpack("f", struct.pack("f", v))[0]


def _int_or_inf(f, x):
    if math.isinf(x) or math.isnan(x):
        return x
    return float(f(x))


def _to_base(n, base):
    if n == 0:
        return "0"
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    neg = n < 0
    n = abs(n)
    out = []
    while n:
        out.append(digits[n % base])
        n //= base
    return ("-" if neg else "") + "".join(reversed(out))


# ---------------------------------------------------------------------------
# Public entry

def load_module(path):
    """Load an ES module and return (exports dict, interpreter)."""
    interp = Interpreter(os.path.dirname(os.path.abspath(path)))
    exports = interp.load_module(path)
    return exports, interp
