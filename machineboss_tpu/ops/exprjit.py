"""Weight-expression -> JAX closure compilation.

Turns the symbolic weight-expression AST (core/weight.py) into traceable
JAX functions of a parameter dict, following definition chains with
circularity detection (equivalent feature to the reference's
parameterized/neural DP front end, ref python/machineboss/jax/jax_weight.py
API surface). This is the bridge between symbolic machines and
differentiable, position-dependent parameterization: callers can supply
per-position parameter tensors and backprop through the whole DP.
"""

import jax.numpy as jnp

from ..core import weight as W


def compile_expr(expr, defs=None):
    """Compile a weight expression to fn(params_dict) -> jnp value.

    defs maps param names to further expressions; chains are resolved at
    compile time with cycle detection. Params not in defs are looked up in
    the runtime dict (values may be scalars or arrays — broadcasting
    applies, enabling position-dependent parameters)."""
    defs = defs or {}

    def build(e, visiting):
        if e is None:
            return lambda p: 0.0
        if isinstance(e, bool):
            v = 1.0 if e else 0.0
            return lambda p: v
        if W.is_number(e):
            v = float(e)
            return lambda p: v
        if isinstance(e, str):
            if e in defs:
                if e in visiting:
                    chain = " -> ".join(list(visiting) + [e])
                    raise ValueError("Cyclic definition: " + chain)
                inner = build(defs[e], visiting + [e])
                return inner
            name = e
            return lambda p: p[name]
        op = e[0]
        if op == "log":
            a = build(e[1], visiting)
            return lambda p: jnp.log(a(p))
        if op == "exp":
            a = build(e[1], visiting)
            return lambda p: jnp.exp(a(p))
        a = build(e[1], visiting)
        b = build(e[2], visiting)
        if op == "*":
            return lambda p: a(p) * b(p)
        if op == "+":
            return lambda p: a(p) + b(p)
        if op == "-":
            return lambda p: a(p) - b(p)
        if op == "/":
            return lambda p: a(p) / b(p)
        if op == "pow":
            return lambda p: jnp.power(a(p), b(p))
        raise ValueError("Unknown opcode %r" % (op,))

    return build(expr, [])


def expr_params(expr, defs=None):
    """Free parameter names after resolving definitions."""
    return W.params_of(expr, defs or {})


class ParameterizedMachine:
    """A machine whose transition weights are JAX closures of a parameter
    dict (scalars or broadcastable arrays).

    Used by the neural DP (ops/dp_neural.py): the caller supplies
    per-parameter tensors — e.g. the output of a neural network, shaped
    (Li+1, Lo+1) or broadcastable — and every DP cell evaluates its
    transition weights at that cell's coordinates. jax.grad through the DP
    trains the network (neural transducer)."""

    def __init__(self, machine):
        self.machine = machine
        self.defs = dict(machine.funcs.defs)
        self.n_states = machine.n_states()
        self.in_alph = machine.input_alphabet()
        self.out_alph = machine.output_alphabet()
        in_tok = {s: i + 1 for i, s in enumerate(self.in_alph)}
        out_tok = {s: i + 1 for i, s in enumerate(self.out_alph)}
        self.edges = []  # (src, dst, in_tok, out_tok, weight_fn)
        self.param_names = set()
        for s, ms in enumerate(machine.states):
            for t in ms.trans:
                fn = compile_expr(t.weight, self.defs)
                self.param_names |= W.params_of(t.weight, self.defs)
                self.edges.append((s, t.dest, in_tok.get(t.in_, 0),
                                   out_tok.get(t.out, 0), fn))

    def log_trans_tensor(self, params):
        """Dense (n_in, n_out, S, S) log tensor for given parameter values.

        If any parameter is an array, the result gains leading broadcast
        dims: (..., n_in, n_out, S, S)."""
        n_in = len(self.in_alph) + 1
        n_out = len(self.out_alph) + 1
        S = self.n_states
        vals = []
        for s, d, i, o, fn in self.edges:
            vals.append(jnp.asarray(fn(params), jnp.float32))
        batch_shape = jnp.broadcast_shapes(*[v.shape for v in vals]) \
            if vals else ()
        out = jnp.full(batch_shape + (n_in, n_out, S, S), -1e30, jnp.float32)
        probs = jnp.zeros(batch_shape + (n_in, n_out, S, S), jnp.float32)
        for (s, d, i, o, fn), v in zip(self.edges, vals):
            v = jnp.broadcast_to(v, batch_shape)
            probs = probs.at[..., i, o, s, d].add(v)
        out = jnp.where(probs > 0,
                        jnp.log(jnp.where(probs > 0, probs, 1.0)), -1e30)
        return out
