"""Minimal WGSL interpreter for SEMANTIC verification of the shaders.

The reference runs GPU-vs-CPU agreement tests for its WebGPU package
(ref js/webgpu/test/test-gpu-cpu-agreement.mjs) and asserts its WGSL
compiler output is behaviorally equivalent to the interpreter
(ref src/compiler.h:171-174). No WebGPU runtime exists in this
environment, so — like tests/jsvm.py does for the generated JS — this
module interprets the WGSL compute shaders directly: tokenizer,
recursive-descent parser, and an evaluator with WebGPU's dispatch model
(workgroups x threads, var<workgroup> shared arrays, workgroupBarrier
via generator suspension so every thread reaches the barrier before any
proceeds).

Supported subset (everything the repo's shaders + generated WGSL use):
struct declarations; @group/@binding module vars (uniform / storage,
read or read_write); const; var<workgroup> arrays; fn with typed params;
let/var/assignment; if/else; for(;;); continue; return;
workgroupBarrier(); builtins max, min, abs, log, exp, floor, select;
u32/i32/f32 casts; vec3<u32> builtins (.x/.y/.z); u32 wraparound
arithmetic; & | << >>; && || !; array indexing with WGSL's
defined-but-clamped out-of-bounds semantics.

f32 arithmetic runs in numpy float32 to match device rounding.
"""

import re

import numpy as np

F32 = np.float32


# --------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>(?:0x[0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)|\d+)[uif]?)
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><<|>>|<=|>=|==|!=|&&|\|\||->|[-+*/%<>=!&|^~@(){}\[\],;:.])
""", re.VERBOSE | re.DOTALL)


def tokenize(src):
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError("wgsl tokenize error at %r" % src[pos:pos + 30])
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# ------------------------------------------------------------------- values

class Vec3:
    def __init__(self, x, y=0, z=0):
        self.x, self.y, self.z = x, y, z


def _u32(v):
    return int(v) & 0xFFFFFFFF


def _i32(v):
    v = int(v) & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Continue(Exception):
    pass


class _Break(Exception):
    pass


_BARRIER = object()


# ------------------------------------------------------------------- parser

class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise SyntaxError("expected %r got %r (tok %d)"
                              % (val, t[1], self.i))
        return t

    def accept(self, val):
        if self.peek()[1] == val:
            self.next()
            return True
        return False


def _parse_type(p):
    """Return a type descriptor; we only need enough to size arrays."""
    name = p.next()[1]
    args = []
    if p.accept("<"):
        args.append(_parse_type(p))
        while p.accept(","):
            args.append(_parse_type(p))
        p.expect(">")
    return (name, args)


class Module:
    def __init__(self, source):
        self.structs = {}
        self.consts = {}          # name -> value (evaluated eagerly)
        self.globals = {}         # name -> dict(kind, binding, type)
        self.workgroup_vars = {}  # name -> (elem_type, size_expr)
        self.fns = {}             # name -> dict(params, body, attrs)
        self._parse(source)

    # -------------------------------------------------------------- parsing

    def _parse(self, source):
        p = _P(tokenize(source))
        pending_attrs = {}
        while p.peek()[0] != "eof":
            t = p.peek()
            if t[1] == "@":
                p.next()
                name = p.next()[1]
                args = []
                if p.accept("("):
                    while p.peek()[1] != ")":
                        args.append(p.next()[1])
                        p.accept(",")
                    p.expect(")")
                pending_attrs.setdefault(name, []).append(args)
            elif t[1] == "struct":
                p.next()
                name = p.next()[1]
                p.expect("{")
                fields = []
                while not p.accept("}"):
                    fname = p.next()[1]
                    p.expect(":")
                    ftype = _parse_type(p)
                    fields.append((fname, ftype))
                    p.accept(",")
                p.accept(";")
                self.structs[name] = fields
                pending_attrs = {}
            elif t[1] == "const":
                p.next()
                name = p.next()[1]
                if p.accept(":"):
                    _parse_type(p)
                p.expect("=")
                expr = self._parse_expr(p)
                p.expect(";")
                self.consts[name] = self._eval(expr, {"consts": self.consts})
                pending_attrs = {}
            elif t[1] == "var":
                p.next()
                space = None
                access = "read"
                if p.accept("<"):
                    space = p.next()[1]
                    if p.accept(","):
                        access = p.next()[1]
                    p.expect(">")
                name = p.next()[1]
                vtype = None
                if p.accept(":"):
                    vtype = _parse_type(p)
                p.expect(";")
                if space == "workgroup":
                    self.workgroup_vars[name] = vtype
                else:
                    binding = int(pending_attrs.get("binding",
                                                    [["0"]])[0][0])
                    self.globals[name] = dict(space=space, access=access,
                                              binding=binding, type=vtype)
                pending_attrs = {}
            elif t[1] == "fn":
                p.next()
                name = p.next()[1]
                p.expect("(")
                params = []
                while p.peek()[1] != ")":
                    pattrs = {}
                    while p.accept("@"):
                        aname = p.next()[1]
                        aargs = []
                        if p.accept("("):
                            while p.peek()[1] != ")":
                                aargs.append(p.next()[1])
                                p.accept(",")
                            p.expect(")")
                        pattrs[aname] = aargs
                    pname = p.next()[1]
                    p.expect(":")
                    ptype = _parse_type(p)
                    params.append((pname, ptype, pattrs))
                    p.accept(",")
                p.expect(")")
                if p.accept("->"):
                    _parse_type(p)
                body = self._parse_block(p)
                self.fns[name] = dict(params=params, body=body,
                                      attrs=pending_attrs)
                pending_attrs = {}
            else:
                raise SyntaxError("unexpected top-level token %r" % (t,))

    def _parse_block(self, p):
        p.expect("{")
        stmts = []
        while not p.accept("}"):
            stmts.append(self._parse_stmt(p))
        return ("block", stmts)

    def _parse_stmt(self, p):
        t = p.peek()
        if t[1] == "{":
            return self._parse_block(p)
        if t[1] in ("let", "var"):
            p.next()
            name = p.next()[1]
            if p.accept(":"):
                vtype = _parse_type(p)
            else:
                vtype = None
            init = None
            if p.accept("="):
                init = self._parse_expr(p)
            p.expect(";")
            return ("decl", name, vtype, init)
        if t[1] == "if":
            p.next()
            p.expect("(")
            cond = self._parse_expr(p)
            p.expect(")")
            then = self._parse_block(p)
            other = None
            if p.accept("else"):
                if p.peek()[1] == "if":
                    other = ("block", [self._parse_stmt(p)])
                else:
                    other = self._parse_block(p)
            return ("if", cond, then, other)
        if t[1] == "for":
            p.next()
            p.expect("(")
            init = None if p.peek()[1] == ";" else self._parse_for_init(p)
            p.expect(";")
            cond = None if p.peek()[1] == ";" else self._parse_expr(p)
            p.expect(";")
            update = None if p.peek()[1] == ")" else self._parse_simple(p)
            p.expect(")")
            body = self._parse_block(p)
            return ("for", init, cond, update, body)
        if t[1] == "return":
            p.next()
            val = None if p.peek()[1] == ";" else self._parse_expr(p)
            p.expect(";")
            return ("return", val)
        if t[1] == "continue":
            p.next()
            p.expect(";")
            return ("continue",)
        if t[1] == "break":
            p.next()
            p.expect(";")
            return ("break",)
        st = self._parse_simple(p)
        p.expect(";")
        return st

    def _parse_for_init(self, p):
        if p.peek()[1] == "var" or p.peek()[1] == "let":
            p.next()
            name = p.next()[1]
            if p.accept(":"):
                _parse_type(p)
            p.expect("=")
            return ("decl", name, None, self._parse_expr(p))
        return self._parse_simple(p)

    def _parse_simple(self, p):
        """Assignment or expression statement (no trailing ';')."""
        expr = self._parse_expr(p)
        if p.peek()[1] == "=":
            p.next()
            rhs = self._parse_expr(p)
            return ("assign", expr, rhs)
        return ("expr", expr)

    # expressions — precedence climbing
    _BINOPS = [("||",), ("&&",), ("|",), ("^",), ("&",),
               ("==", "!="), ("<", "<=", ">", ">="),
               ("<<", ">>"), ("+", "-"), ("*", "/", "%")]

    def _parse_expr(self, p, level=0):
        if level == len(self._BINOPS):
            return self._parse_unary(p)
        lhs = self._parse_expr(p, level + 1)
        while p.peek()[1] in self._BINOPS[level]:
            op = p.next()[1]
            rhs = self._parse_expr(p, level + 1)
            lhs = ("bin", op, lhs, rhs)
        return lhs

    def _parse_unary(self, p):
        t = p.peek()
        if t[1] in ("-", "!", "~"):
            p.next()
            return ("un", t[1], self._parse_unary(p))
        return self._parse_postfix(p)

    def _parse_postfix(self, p):
        e = self._parse_primary(p)
        while True:
            if p.accept("["):
                idx = self._parse_expr(p)
                p.expect("]")
                e = ("index", e, idx)
            elif p.accept("."):
                e = ("member", e, p.next()[1])
            else:
                return e

    def _parse_primary(self, p):
        t = p.next()
        if t[0] == "num":
            s = t[1]
            if s.endswith("u") or s.endswith("i"):
                return ("lit", int(s[:-1], 0))
            if s.endswith("f"):
                return ("lit", F32(float(s[:-1])))
            if "." in s or "e" in s or "E" in s:
                return ("lit", F32(float(s)))
            return ("lit", int(s, 0))
        if t[1] == "(":
            e = self._parse_expr(p)
            p.expect(")")
            return e
        if t[0] == "id":
            name = t[1]
            if name == "true":
                return ("lit", True)
            if name == "false":
                return ("lit", False)
            if p.peek()[1] == "<" and name in ("vec3", "vec2", "array",
                                               "f32", "u32", "i32"):
                # typed constructor like vec3<u32>(...)
                _parse_type_suffix = _parse_type
                p.i -= 1
                _parse_type_suffix(p)      # consume full generic type
                p.expect("(")
                args = []
                while p.peek()[1] != ")":
                    args.append(self._parse_expr(p))
                    p.accept(",")
                p.expect(")")
                return ("call", name, args)
            if p.accept("("):
                args = []
                while p.peek()[1] != ")":
                    args.append(self._parse_expr(p))
                    p.accept(",")
                p.expect(")")
                return ("call", name, args)
            return ("var", name)
        raise SyntaxError("unexpected token %r" % (t,))

    # ------------------------------------------------------------ evaluator

    def _eval(self, e, env):
        kind = e[0]
        if kind == "lit":
            return e[1]
        if kind == "var":
            name = e[1]
            for scope in env.get("scopes", ()):
                if name in scope:
                    return scope[name]
            if name in env.get("consts", {}):
                return env["consts"][name]
            if "module_env" in env and name in env["module_env"]:
                return env["module_env"][name]
            raise NameError("wgsl: undefined %r" % name)
        if kind == "bin":
            op = e[1]
            if op == "&&":
                return (bool(self._eval(e[2], env))
                        and bool(self._eval(e[3], env)))
            if op == "||":
                return (bool(self._eval(e[2], env))
                        or bool(self._eval(e[3], env)))
            a = self._eval(e[2], env)
            b = self._eval(e[3], env)
            return _binop(op, a, b)
        if kind == "un":
            v = self._eval(e[2], env)
            if e[1] == "-":
                return F32(-v) if isinstance(v, np.floating) else -v
            if e[1] == "!":
                return not bool(v)
            if e[1] == "~":
                return _u32(~int(v))
        if kind == "index":
            arr = self._eval(e[1], env)
            idx = int(self._eval(e[2], env))
            n = len(arr)
            if n == 0:
                return F32(0)
            # WGSL out-of-bounds accesses are defined-but-clamped
            return arr[min(max(idx, 0), n - 1)]
        if kind == "member":
            base = self._eval(e[1], env)
            m = e[2]
            if isinstance(base, Vec3):
                return getattr(base, m)
            return base[m]
        if kind == "call":
            return self._call(e[1], [self._eval(a, env) for a in e[2]],
                              env)
        raise ValueError("bad expr %r" % (e,))

    def _call(self, name, args, env):
        if name == "max":
            a, b = args
            if isinstance(a, np.floating) or isinstance(b, np.floating):
                return F32(max(F32(a), F32(b)))
            return max(a, b)
        if name == "min":
            a, b = args
            if isinstance(a, np.floating) or isinstance(b, np.floating):
                return F32(min(F32(a), F32(b)))
            return min(a, b)
        if name == "abs":
            return F32(abs(args[0])) if isinstance(args[0], np.floating) \
                else abs(args[0])
        if name == "log":
            with np.errstate(divide="ignore", invalid="ignore"):
                return F32(np.log(F32(args[0])))
        if name == "exp":
            with np.errstate(over="ignore", under="ignore"):
                return F32(np.exp(F32(args[0])))
        if name == "floor":
            return F32(np.floor(F32(args[0])))
        if name == "select":
            f, t, cond = args
            return t if bool(cond) else f
        if name == "f32":
            return F32(args[0])
        if name == "u32":
            return _u32(args[0])
        if name == "i32":
            return _i32(args[0])
        if name in ("vec3", "vec2"):
            return Vec3(*[_u32(a) for a in args])
        if name == "workgroupBarrier":
            raise RuntimeError("workgroupBarrier outside entry statement "
                               "position is unsupported")
        fn = self.fns[name]
        scope = {}
        for (pname, _t, _a), val in zip(fn["params"], args):
            scope[pname] = val
        fenv = dict(env)
        fenv["scopes"] = [scope]
        try:
            for out in self._exec(fn["body"], fenv):
                if out is _BARRIER:
                    raise RuntimeError("barrier inside called fn "
                                       "unsupported")
        except _Return as r:
            return r.value
        return None

    # statement execution as a generator (yields _BARRIER)

    def _exec(self, st, env):
        kind = st[0]
        if kind == "block":
            env["scopes"].append({})
            try:
                for s in st[1]:
                    for out in self._exec(s, env):
                        yield out
            finally:
                env["scopes"].pop()
        elif kind == "decl":
            _, name, vtype, init = st
            if init is not None:
                val = self._eval(init, env)
            else:
                val = self._zero_of(vtype, env)
            env["scopes"][-1][name] = val
        elif kind == "assign":
            _, target, rhs = st
            val = self._eval(rhs, env)
            self._store(target, val, env)
        elif kind == "if":
            _, cond, then, other = st
            if bool(self._eval(cond, env)):
                for out in self._exec(then, env):
                    yield out
            elif other is not None:
                for out in self._exec(other, env):
                    yield out
        elif kind == "for":
            _, init, cond, update, body = st
            env["scopes"].append({})
            try:
                if init is not None:
                    for out in self._exec(init, env):
                        yield out
                while cond is None or bool(self._eval(cond, env)):
                    try:
                        for out in self._exec(body, env):
                            yield out
                    except _Continue:
                        pass
                    except _Break:
                        break
                    if update is not None:
                        for out in self._exec(update, env):
                            yield out
            finally:
                env["scopes"].pop()
        elif kind == "return":
            raise _Return(None if st[1] is None
                          else self._eval(st[1], env))
        elif kind == "continue":
            raise _Continue()
        elif kind == "break":
            raise _Break()
        elif kind == "expr":
            e = st[1]
            if e[0] == "call" and e[1] == "workgroupBarrier":
                yield _BARRIER
            else:
                self._eval(e, env)
        else:
            raise ValueError("bad stmt %r" % (st,))

    def _store(self, target, val, env):
        if target[0] == "var":
            name = target[1]
            for scope in env["scopes"]:
                if name in scope:
                    scope[name] = val
                    return
            raise NameError("assign to undeclared %r" % target[1])
        if target[0] == "index":
            arr = self._eval(target[1], env)
            idx = int(self._eval(target[2], env))
            if 0 <= idx < len(arr):
                if isinstance(arr, np.ndarray) and \
                        arr.dtype == np.float32:
                    arr[idx] = F32(val)
                else:
                    arr[idx] = val
            return
        raise ValueError("bad assign target %r" % (target,))

    def _zero_of(self, vtype, env):
        if vtype is None:
            return 0
        name = vtype[0]
        if name == "f32":
            return F32(0)
        if name in ("u32", "i32"):
            return 0
        if name == "bool":
            return False
        if name == "array":
            elem = vtype[1][0]
            n = vtype[1][1][0] if len(vtype[1]) > 1 else ("0", [])
            size = self.consts.get(n, None)
            if size is None:
                try:
                    size = int(n, 0)
                except (TypeError, ValueError):
                    size = 0
            if elem[0] == "f32":
                return np.zeros(int(size), np.float32)
            return [0] * int(size)
        raise ValueError("cannot zero-init type %r" % (vtype,))

    # ------------------------------------------------------------- dispatch

    def dispatch(self, entry, bindings, workgroups=(1, 1, 1)):
        """Run entry over workgroups like a WebGPU dispatch.

        bindings: {binding_index: numpy array (storage) or dict
        (uniform struct)}. Storage buffers are mutated in place.
        workgroups: (x, y, z) workgroup counts. Threads of a workgroup
        run interleaved at workgroupBarrier granularity."""
        fn = self.fns[entry]
        wg_size = [int(a) for a in fn["attrs"].get("workgroup_size",
                                                   [["1"]])[0]]
        while len(wg_size) < 3:
            wg_size.append(1)
        if isinstance(workgroups, int):
            workgroups = (workgroups, 1, 1)

        module_env = {}
        for name, g in self.globals.items():
            module_env[name] = bindings[g["binding"]]

        for wz in range(workgroups[2]):
            for wy in range(workgroups[1]):
                for wx in range(workgroups[0]):
                    self._run_workgroup(fn, module_env, (wx, wy, wz),
                                        wg_size, workgroups)

    def _run_workgroup(self, fn, module_env, wid, wg_size, n_wg):
        wg_env = {name: self._zero_of(t, None)
                  for name, t in self.workgroup_vars.items()}
        menv = dict(module_env)
        menv.update(wg_env)

        threads = []
        for lz in range(wg_size[2]):
            for ly in range(wg_size[1]):
                for lx in range(wg_size[0]):
                    scope = {}
                    for pname, _t, pattrs in fn["params"]:
                        b = pattrs.get("builtin")
                        if b is None:
                            continue
                        kind = b[0]
                        if kind == "workgroup_id":
                            scope[pname] = Vec3(*wid)
                        elif kind == "local_invocation_id":
                            scope[pname] = Vec3(lx, ly, lz)
                        elif kind == "global_invocation_id":
                            scope[pname] = Vec3(
                                wid[0] * wg_size[0] + lx,
                                wid[1] * wg_size[1] + ly,
                                wid[2] * wg_size[2] + lz)
                        elif kind == "num_workgroups":
                            scope[pname] = Vec3(*n_wg)
                    env = {"scopes": [scope], "consts": self.consts,
                           "module_env": menv}
                    threads.append(self._thread(fn["body"], env))

        # run all threads to each barrier in lockstep
        live = list(threads)
        while live:
            nxt = []
            for th in live:
                try:
                    out = next(th)
                    assert out is _BARRIER
                    nxt.append(th)
                except StopIteration:
                    pass
            live = nxt

    def _thread(self, body, env):
        try:
            for out in self._exec(body, env):
                yield out
        except _Return:
            return


def _binop(op, a, b):
    fa = isinstance(a, (np.floating, float))
    fb = isinstance(b, (np.floating, float))
    if op in ("==", "!=", "<", "<=", ">", ">="):
        r = {"==": a == b, "!=": a != b, "<": a < b,
             "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        return bool(r)
    if fa or fb:
        a, b = F32(a), F32(b)
        with np.errstate(over="ignore", under="ignore", invalid="ignore",
                         divide="ignore"):
            if op == "+":
                return F32(a + b)
            if op == "-":
                return F32(a - b)
            if op == "*":
                return F32(a * b)
            if op == "/":
                return F32(a / b)
        raise ValueError("bad float op %r" % op)
    a, b = int(a), int(b)
    if op == "+":
        return _u32(a + b)
    if op == "-":
        return _u32(a - b)
    if op == "*":
        return _u32(a * b)
    if op == "/":
        return _u32(a // b) if b else 0xFFFFFFFF
    if op == "%":
        return _u32(a % b) if b else a
    if op == "&":
        return _u32(a & b)
    if op == "|":
        return _u32(a | b)
    if op == "^":
        return _u32(a ^ b)
    if op == "<<":
        return _u32(a << (b & 31))
    if op == ">>":
        return _u32(a >> (b & 31))
    raise ValueError("bad int op %r" % op)
