"""Auto-dispatching DP front end (equivalent of the reference JAX package's
log_forward/log_viterbi/log_backward with strategy='auto';
ref python/machineboss/jax/forward.py:114 and API.md:87-91).

Strategy selection:
  - machine too large to densify        -> sparse COO engine
  - 1D (one side empty), long sequence  -> associative scan (log depth)
  - 1D short / large S                  -> sequential scan
  - 2D small alphabet, batched          -> wavefront (pallas on TPU)
  - 2D otherwise                        -> row scan
PSWM inputs dispatch to the PSWM engines. All device paths accept batches.
"""

import numpy as np

from .core.machine import Machine
from .core.eval import EvaluatedMachine
from .core.params import Params
from .ops.lowering import LoweredMachine
from .ops.semiring import LOGSUMEXP, MAXPLUS
from .utils.debug import check_finite

DENSE_MAX_STATES = 512


def _load_dispatch_table():
    """Measured engine thresholds (scripts/autotune_dispatch.py). Returns
    the table dict when one was recorded for the current backend, else
    None (checked-in defaults apply)."""
    import json
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dispatch_table.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        return None
    import jax
    backend = jax.default_backend()
    if "backends" in doc:
        return doc["backends"].get(backend)
    return doc if doc.get("backend") == backend else None


class CompiledMachine:
    """A machine prepared for repeated device DP calls."""

    def __init__(self, machine, params=None, dtype=np.float32,
                 dense_max_states=DENSE_MAX_STATES):
        if not isinstance(machine, Machine):
            machine = Machine.from_file(machine) if isinstance(machine, str) \
                else Machine.from_json(machine)
        if params is None:
            params = machine.get_param_defs(True)
        elif not isinstance(params, Params):
            from .core.params import param_assign_from_json
            params = param_assign_from_json(params)
        self.machine = machine
        self.ev = EvaluatedMachine(machine, params)
        self.lowered = LoweredMachine(self.ev, dtype=dtype,
                                      dense_max_states=dense_max_states)
        self.is_dense = self.lowered.is_dense
        self._cache = {}

    # -- tokenization helpers ----------------------------------------------

    def in_toks(self, seq):
        return [self.ev.input_tokenizer.sym2tok[c] - 1 for c in seq]

    def out_toks(self, seq):
        return [self.ev.output_tokenizer.sym2tok[c] - 1 for c in seq]

    # -- dispatch ----------------------------------------------------------

    _dispatch_table = None
    _dispatch_table_loaded = False

    def _strategy(self, n_in, n_out, strategy):
        if strategy != "auto":
            return strategy
        if not self.is_dense:
            return "sparse"
        if not CompiledMachine._dispatch_table_loaded:
            CompiledMachine._dispatch_table = _load_dispatch_table()
            CompiledMachine._dispatch_table_loaded = True
        table = CompiledMachine._dispatch_table
        one_d = self.machine.input_empty() or self.machine.output_empty()
        if one_d:
            S = self.ev.n_states()
            L = max(n_in, n_out)
            if table:
                # measured: smallest L where the log-depth assoc scan beat
                # the sequential scan for the nearest measured S
                by_s = table["derived"]["assoc_min_L_by_S"]
                if by_s:
                    keys = sorted(int(k) for k in by_s)
                    nearest = min(keys, key=lambda k: abs(k - S))
                    return "assoc" if L >= by_s[str(nearest)] else "scan"
                return "scan"          # assoc never won on this backend
            # default (unmeasured backend): conservative guess; the
            # reference documents the assoc pathology at large S
            # (ref API.md:87-91), hence the S cap
            return "assoc" if (L >= 256 and S <= 64) else "scan"
        return "rows"

    def log_forward(self, input_seq, output_seq, strategy="auto",
                    viterbi=False):
        """Forward (or Viterbi) log-likelihood of one sequence pair."""
        import jax.numpy as jnp
        from .ops import dp1d, dp2d, sparse as sparse_mod

        sr = MAXPLUS if viterbi else LOGSUMEXP
        it = self.in_toks(input_seq)
        ot = self.out_toks(output_seq)
        strat = self._strategy(len(it), len(ot), strategy)

        if strat == "sparse":
            key = "sparse"
            if key not in self._cache:
                self._cache[key] = sparse_mod.SparseMachine(self.ev)
            return check_finite("forward_2d_sparse",
                                sparse_mod.forward_2d_sparse(
                                    self._cache[key],
                                    [t + 1 for t in it],
                                    [t + 1 for t in ot]))

        if strat in ("scan", "assoc"):
            out_side = self.machine.input_empty()
            sr_name = "maxplus" if viterbi else "logsumexp"
            key = ("1d", out_side, sr_name)
            if key not in self._cache:
                self._cache[key] = tuple(jnp.array(x) for x in
                                         self.lowered.emit_matrices_1d(
                                             output_side=out_side,
                                             semiring=sr_name))
            trans, closure = self._cache[key]
            toks = jnp.array(ot if out_side else it, jnp.int32)
            fn = dp1d.forward_1d_assoc if strat == "assoc" \
                else dp1d.forward_1d_scan
            return float(check_finite(
                "forward_1d", fn(trans, closure, toks, len(toks), sr=sr)))

        sr_name = "maxplus" if viterbi else "logsumexp"
        key = ("2d", sr_name)
        if key not in self._cache:
            self._cache[key] = tuple(jnp.array(x) for x in
                                     self.lowered.matrices_2d(sr_name))
        a_diag, a_left, a_up, closure = self._cache[key]
        return float(check_finite("forward_2d", dp2d.forward_2d(
            a_diag, a_left, a_up, closure,
            jnp.array(it, jnp.int32), jnp.array(ot, jnp.int32),
            len(it), len(ot), sr=sr)))

    def log_viterbi(self, input_seq, output_seq, strategy="auto"):
        return self.log_forward(input_seq, output_seq, strategy,
                                viterbi=True)

    def log_forward_batch(self, pairs, engine="auto", pad_multiple=16,
                          bucket=False):
        """Batched Forward over [(input_seq, output_seq), ...] on device.

        engine: 'auto' picks the pallas wavefront kernel on TPU backends
        (dense 2D machines) and the jnp wavefront elsewhere; 'wavefront'
        forces the jnp engine; 'pallas' forces the kernel. Sequences are
        right-padded to a shared bucket; per-sequence lengths mask the
        padding. Returns a numpy (B,) array of log-likelihoods.

        bucket=True groups ragged batches by geometric length bucket
        (ratio 1.5, the reference's padding-bucket scheme,
        ref python/machineboss/jax/seq.py:63-97) and runs one device
        call per group, so short pairs stop paying for the longest
        pair's lattice. Group sizes are padded to powers of two to
        bound kernel recompilation. Bucketing only engages for batches
        of >= 64 pairs — below that the extra per-group invocation
        floor outweighs any padding saved, so `bucket=True` is a no-op
        (PERF.md records the measurement behind the threshold).

        One-empty-side (1D) machines route to the dedicated 1D scan
        path, which pads every sequence to the batch max L (no
        bucketing); an explicit engine='wavefront' override is honored
        and keeps such machines on the generic 2D wavefront instead."""
        if not self.is_dense:
            return np.array([self.log_forward(i, o) for i, o in pairs])
        one_d = self.machine.input_empty() != self.machine.output_empty()
        if one_d and engine == "wavefront":
            one_d = False          # honor the explicit 2D-engine request
        if one_d:
            # exactly one empty side: route to the VMEM-resident Pallas
            # 1D scan kernel (4.99 G cells/s at S=64 L=10000 — PERF.md);
            # jnp scan off-TPU. Fully-closed machines (both sides empty)
            # stay on the generic padded path.
            return self._log_forward_batch_1d(pairs, pad_multiple)
        toks = [(self.in_toks(i), self.out_toks(o)) for i, o in pairs]
        if bucket and len(toks) >= 64:
            return self._log_forward_batch_bucketed(toks, engine,
                                                    pad_multiple)
        return self._log_forward_batch_padded(toks, engine, pad_multiple)

    def _log_forward_batch_1d(self, pairs, pad_multiple):
        import jax
        import jax.numpy as jnp
        from .ops.fwdback import pad_bucket

        out_side = self.machine.input_empty()
        seqs = [self.out_toks(o) if out_side else self.in_toks(i)
                for i, o in pairs]
        B = len(seqs)
        L = pad_bucket(max((len(s) for s in seqs), default=1),
                       base=pad_multiple)
        toks = np.zeros((B, L), np.int32)
        lens = np.zeros(B, np.int32)
        for n, sq in enumerate(seqs):
            toks[n, :len(sq)] = sq
            lens[n] = len(sq)
        key = ("1d_mats", out_side)
        if key not in self._cache:
            self._cache[key] = tuple(
                np.asarray(x) for x in self.lowered.emit_matrices_1d(
                    output_side=out_side))
        trans, closure = self._cache[key]
        if jax.default_backend() not in ("cpu",):
            pkey = ("1d_pallas", out_side, B, L)
            if pkey not in self._cache:
                from .ops.pallas.scan1d_kernel import make_forward_1d_pallas
                self._cache[pkey] = make_forward_1d_pallas(
                    trans, closure, B, L)
            return check_finite("log_forward_batch_1d",
                                np.asarray(self._cache[pkey](
                                    jnp.array(toks), jnp.array(lens))))
        from .ops import dp1d
        fn = dp1d.make_batched(dp1d.forward_1d_scan)
        return check_finite("log_forward_batch_1d", np.asarray(
            fn(jnp.array(trans), jnp.array(closure), jnp.array(toks),
               jnp.array(lens))))

    def _log_forward_batch_bucketed(self, toks, engine, pad_multiple):
        from .ops.fwdback import pad_bucket
        B = len(toks)
        min_group = max(16, B // 16)
        shapes = [(pad_bucket(len(ti), base=pad_multiple),
                   pad_bucket(len(to), base=pad_multiple))
                  for ti, to in toks]
        groups = {}
        for n, s in enumerate(shapes):
            groups.setdefault(s, []).append(n)
        # merge under-filled groups forward. Sorting is by total padded
        # lattice area, and a carried group only merges into a bucket
        # that DOMINATES it in both dimensions — a lexicographic sort on
        # (Li, Lo) could otherwise fold a large-Lo group into a
        # smaller-Lo bucket and inflate the merged lattice beyond either
        # original (results would still be right — the padded call
        # recomputes pads from actual max lengths — but the padding win
        # would be lost)
        order = sorted(groups, key=lambda s: (s[0] * s[1], s))
        merged = []
        carry = []
        for i, s in enumerate(order):
            if carry and not all(s[d] >= max(shapes[n][d] for n in carry)
                                 for d in (0, 1)):
                # next bucket does not dominate the carried pairs: flush
                # them as their own (under-filled) group
                cs = (max(shapes[n][0] for n in carry),
                      max(shapes[n][1] for n in carry))
                merged.append((cs, carry))
                carry = []
            idxs = carry + groups[s]
            carry = []
            if len(idxs) < min_group and i + 1 < len(order):
                carry = idxs
            else:
                merged.append((s, idxs))
        if carry:
            cs = (max(shapes[n][0] for n in carry),
                  max(shapes[n][1] for n in carry))
            if merged and all(merged[-1][0][d] >= cs[d] for d in (0, 1)):
                s, idxs = merged[-1]
                merged[-1] = (s, idxs + carry)
            else:
                merged.append((cs, carry))
        out = np.empty(B)
        for _, idxs in merged:
            sub = [toks[n] for n in idxs]
            # pad group size to a power of two (repeat the first pair)
            gb = 1
            while gb < len(sub):
                gb *= 2
            padded = sub + [sub[0]] * (gb - len(sub))
            vals = self._log_forward_batch_padded(padded, engine,
                                                  pad_multiple)
            out[np.array(idxs)] = vals[:len(sub)]
        return out

    def _log_forward_batch_padded(self, toks, engine, pad_multiple):
        import jax
        import jax.numpy as jnp
        from .ops.fwdback import pad_bucket

        B = len(toks)
        Li = pad_bucket(max((len(t[0]) for t in toks), default=1),
                        base=pad_multiple)
        Lo = pad_bucket(max((len(t[1]) for t in toks), default=1),
                        base=pad_multiple)
        it = np.zeros((B, Li), np.int32)
        ot = np.zeros((B, Lo), np.int32)
        il = np.zeros(B, np.int32)
        ol = np.zeros(B, np.int32)
        for n, (ti, to) in enumerate(toks):
            it[n, :len(ti)] = ti
            ot[n, :len(to)] = to
            il[n] = len(ti)
            ol[n] = len(to)

        key = ("2d", "logsumexp")
        if key not in self._cache:
            self._cache[key] = tuple(jnp.array(x) for x in
                                     self.lowered.matrices_2d())
        a_diag, a_left, a_up, closure = self._cache[key]

        if engine == "auto":
            engine = "pallas" if jax.default_backend() not in (
                "cpu",) else "wavefront"
        if engine == "pallas":
            from .ops.pallas.wavefront_kernel import (
                make_wavefront_forward, ragged_span)
            from .ops.pallas.lowrank_kernel import lowrank_cost_ratio
            ht = tuple(np.array(x) for x in (a_diag, a_left, a_up,
                                             closure))
            if "lowrank_ratio" not in self._cache:
                self._cache["lowrank_ratio"] = lowrank_cost_ratio(*ht)[0]
            # structured machines (profile HMMs, GeneWise, PSWs) route
            # to the closure-folded min-rank kernel (measured 1.8x the
            # factored kernel on prot2dna, PERF.md); full-rank machines
            # use the class-specialized merged kernel family: the RAGGED
            # CHAINED variant when the batch is ragged and chainable
            # (7.70 G vs merged's 5.80 G on the ragged dense grid,
    # PERF.md), plain merged otherwise. merged=True because the
            # generic variant is known to miscompile on the 2026-08 TPU
            # runtime at L >= 200.
            variant = "lowrank" \
                if self._cache["lowrank_ratio"] < 0.6 else None
            chain = None
            hint = None
            is_ragged = bool((il != il[0]).any() or (ol != ol[0]).any())
            if (variant is None and is_ragged and B % 8 == 0
                    and Li >= 1 and Lo >= 1 and il.min() >= 1
                    and ol.min() >= 1):
                variant = "chained_ragged"
                chain = 8
                # bucket the span so the kernel cache survives small
                # length-profile changes
                hint = -(-ragged_span(il, ol, chain) // 64) * 64
            pkey = ("pallas", B, Li, Lo, variant, chain, hint)
            if pkey not in self._cache:
                self._cache[pkey] = make_wavefront_forward(
                    *ht, B, Li, Lo, merged=True, variant=variant,
                    chain=chain, n_abs_hint=hint)
            fn = self._cache[pkey]
        else:
            from .ops.wavefront_fast import forward_2d_wavefront_fast

            def fn(i_t, o_t, i_l, o_l):
                return forward_2d_wavefront_fast(
                    a_diag, a_left, a_up, closure, i_t, o_t, i_l, o_l)

        return check_finite("log_forward_batch",
                            np.array(fn(jnp.array(it), jnp.array(ot),
                                        jnp.array(il), jnp.array(ol))))

    def log_backward_lattice(self, input_seq, output_seq):
        import jax.numpy as jnp
        from .ops import dp2d
        key = ("2d", "logsumexp")
        if key not in self._cache:
            self._cache[key] = tuple(jnp.array(x) for x in
                                     self.lowered.matrices_2d())
        a_diag, a_left, a_up, closure = self._cache[key]
        return dp2d.backward_2d_lattice(
            a_diag, a_left, a_up, closure,
            jnp.array(self.in_toks(input_seq), jnp.int32),
            jnp.array(self.out_toks(output_seq), jnp.int32))


def log_forward(machine, input_seq, output_seq, params=None,
                strategy="auto"):
    return CompiledMachine(machine, params).log_forward(input_seq,
                                                        output_seq, strategy)


def log_viterbi(machine, input_seq, output_seq, params=None,
                strategy="auto"):
    return CompiledMachine(machine, params).log_viterbi(input_seq,
                                                        output_seq, strategy)
