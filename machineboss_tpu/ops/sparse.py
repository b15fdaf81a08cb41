"""Sparse (COO) device DP for large machines.

Dense (S,S) transfer matmuls scale as S^2 per cell; profile HMMs and big
compositions (fn3 ~500 states, prot2dna ~1000s) are extremely sparse
(constant out-degree). This engine keeps transitions as COO edge arrays and
updates cells with segment log-sum-exp scatters (max-scatter + exp-sum
scatter), O(E) per position instead of O(S^2).

Silent transitions are layered by longest-path depth over the silent DAG on
the host (advancing machines have acyclic silent graphs); the device kernel
applies the layers as a short fixed sequence of scatters, vectorized over
edges within each layer.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .semiring import NEG_INF


def segment_logsumexp(values, segment_ids, num_segments):
    """Scatter-logsumexp of values into segments."""
    seg_max = jax.ops.segment_max(values, segment_ids, num_segments)
    seg_max_safe = jnp.where(seg_max > NEG_INF / 2, seg_max, 0.0)
    shifted = jnp.exp(values - seg_max_safe[segment_ids])
    sums = jax.ops.segment_sum(shifted, segment_ids, num_segments)
    out = jnp.where(sums > 0,
                    jnp.log(jnp.where(sums > 0, sums, 1.0)) + seg_max_safe,
                    NEG_INF)
    return out


def segment_max(values, segment_ids, num_segments):
    return jax.ops.segment_max(values, segment_ids, num_segments)


class SparseMachine:
    """COO lowering with silent-layer scheduling (host side)."""

    def __init__(self, ev, dtype=np.float32):
        self.ev = ev
        self.n_states = ev.n_states()
        edges = ev.edges_by_token()
        self.classes = {}
        for (i, o), (src, dst, ti, lw) in edges.items():
            lw = np.where(np.isfinite(lw), lw, NEG_INF).astype(dtype)
            self.classes[(i, o)] = (jnp.array(src, jnp.int32),
                                    jnp.array(dst, jnp.int32),
                                    jnp.array(lw))
        # silent layers by destination depth over the silent DAG
        silent = edges.get((0, 0))
        self.silent_layers = []
        if silent is not None:
            src, dst, _, lw = silent
            depth = np.zeros(self.n_states, np.int64)
            order = np.argsort(dst, kind="stable")
            for k in order:  # dst ascending = topological for advancing
                depth[dst[k]] = max(depth[dst[k]], depth[src[k]] + 1)
            edge_layer = depth[dst]
            lw = np.where(np.isfinite(lw), lw, NEG_INF).astype(dtype)
            for lvl in range(1, int(edge_layer.max()) + 1 if len(dst) else 0):
                sel = edge_layer == lvl
                if sel.any():
                    self.silent_layers.append(
                        (jnp.array(src[sel], jnp.int32),
                         jnp.array(dst[sel], jnp.int32),
                         jnp.array(lw[sel])))

    def apply_silent(self, cell):
        """Propagate silent transitions layer by layer (exact closure for
        advancing machines)."""
        S = self.n_states
        for src, dst, lw in self.silent_layers:
            contrib = segment_logsumexp(cell[src] + lw, dst, S)
            cell = jnp.logaddexp(cell, contrib)
        return cell

    def class_contrib(self, prev_cell, key):
        S = self.n_states
        if key not in self.classes:
            return jnp.full((S,), NEG_INF, prev_cell.dtype)
        src, dst, lw = self.classes[key]
        return segment_logsumexp(prev_cell[src] + lw, dst, S)


def forward_2d_sparse(sm: SparseMachine, in_toks, out_toks):
    """Sparse 2D Forward; in_toks/out_toks are 1-based token id lists
    (host ints). Returns final log-likelihood. Rows are scanned on device;
    cells per row are a python loop (suitable for moderate Li) — the dense
    engines cover high-throughput batched workloads, this engine covers
    machines too big to densify."""
    S = sm.n_states
    Li = len(in_toks)
    Lo = len(out_toks)

    @jax.jit
    def run():
        neg = jnp.full((S,), NEG_INF, jnp.float32)

        def make_row(prev_row, o_tok):
            # prev_row: (Li+1, S) or None for first row
            cells = []
            for i in range(Li + 1):
                c = neg
                if prev_row is None and i == 0:
                    c = c.at[0].set(0.0)
                if prev_row is not None:
                    c = jnp.logaddexp(c, sm.class_contrib(
                        prev_row[i], (0, o_tok)))
                    if i > 0:
                        c = jnp.logaddexp(c, sm.class_contrib(
                            prev_row[i - 1], (in_toks[i - 1], o_tok)))
                if i > 0:
                    c = jnp.logaddexp(c, sm.class_contrib(
                        cells[i - 1], (in_toks[i - 1], 0)))
                c = sm.apply_silent(c)
                cells.append(c)
            return jnp.stack(cells)

        row = make_row(None, None)

        def row_fold(row, o_tok):
            return make_row(row, o_tok)

        for o in range(1, Lo + 1):
            row = row_fold(row, out_toks[o - 1])
        return row[Li, S - 1]

    return float(run())


def _segment_combine(viterbi):
    return segment_max if viterbi else segment_logsumexp


def _combine(viterbi):
    return jnp.maximum if viterbi else jnp.logaddexp


class SparseMachineRev:
    """Reverse-direction COO views for Backward fills (edges traversed
    dst -> src; silent layers applied in reverse order)."""

    def __init__(self, sm: SparseMachine):
        self.sm = sm
        self.n_states = sm.n_states

    def class_contrib(self, next_cell, key, viterbi=False):
        S = self.n_states
        if key not in self.sm.classes:
            return jnp.full((S,), NEG_INF, next_cell.dtype)
        src, dst, lw = self.sm.classes[key]
        return _segment_combine(viterbi)(next_cell[dst] + lw, src, S)

    def apply_silent(self, cell, viterbi=False):
        comb = _combine(viterbi)
        seg = _segment_combine(viterbi)
        S = self.n_states
        for src, dst, lw in reversed(self.sm.silent_layers):
            contrib = seg(cell[dst] + lw, src, S)
            cell = comb(cell, contrib)
        return cell


def forward_1d_sparse(sm: SparseMachine, toks, output_side=True,
                      viterbi=False):
    """Sparse 1D Forward/Viterbi for a generator (output_side=True) or
    recognizer; toks are 1-based token ids (host ints).
    O(E) per position via segment scatters (the COO analog of the
    reference's kernel_sparse.py 1D path)."""
    S = sm.n_states
    comb = _combine(viterbi)

    @jax.jit
    def run():
        cell = jnp.full((S,), NEG_INF, jnp.float32).at[0].set(0.0)
        cell = sm.apply_silent(cell) if not viterbi else \
            _apply_silent_vit(sm, cell)
        for t in toks:
            key = (0, t) if output_side else (t, 0)
            nxt = _class_contrib(sm, cell, key, viterbi)
            cell = _apply_silent_vit(sm, nxt) if viterbi else \
                sm.apply_silent(nxt)
        return cell[S - 1]

    return float(run())


def _class_contrib(sm, prev_cell, key, viterbi=False):
    S = sm.n_states
    if key not in sm.classes:
        return jnp.full((S,), NEG_INF, prev_cell.dtype)
    src, dst, lw = sm.classes[key]
    return _segment_combine(viterbi)(prev_cell[src] + lw, dst, S)


def _apply_silent_vit(sm, cell):
    S = sm.n_states
    for src, dst, lw in sm.silent_layers:
        contrib = segment_max(cell[src] + lw, dst, S)
        cell = jnp.maximum(cell, contrib)
    return cell


def backward_1d_sparse(sm: SparseMachine, toks, output_side=True,
                       viterbi=False):
    """Sparse 1D Backward: fill from the end state; returns the same
    total as Forward (invariant used by the tests)."""
    S = sm.n_states
    rev = SparseMachineRev(sm)

    @jax.jit
    def run():
        cell = jnp.full((S,), NEG_INF, jnp.float32).at[S - 1].set(0.0)
        cell = rev.apply_silent(cell, viterbi)
        for t in reversed(toks):
            key = (0, t) if output_side else (t, 0)
            nxt = rev.class_contrib(cell, key, viterbi)
            cell = rev.apply_silent(nxt, viterbi)
        return cell[0]

    return float(run())


def backward_2d_sparse(sm: SparseMachine, in_toks, out_toks, viterbi=False):
    """Sparse 2D Backward fill (reverse traversal); returns total
    log-likelihood (cell (0,0,start))."""
    S = sm.n_states
    Li = len(in_toks)
    Lo = len(out_toks)
    rev = SparseMachineRev(sm)
    comb = _combine(viterbi)

    @jax.jit
    def run():
        neg = jnp.full((S,), NEG_INF, jnp.float32)

        def make_row(next_row, o_tok):
            # build row right-to-left; next_row is the o+1 row (or None)
            cells = [None] * (Li + 1)
            for i in range(Li, -1, -1):
                c = neg
                if next_row is None and i == Li:
                    c = c.at[S - 1].set(0.0)
                if next_row is not None:
                    c = comb(c, rev.class_contrib(next_row[i], (0, o_tok),
                                                  viterbi))
                    if i < Li:
                        c = comb(c, rev.class_contrib(
                            next_row[i + 1], (in_toks[i], o_tok), viterbi))
                if i < Li:
                    c = comb(c, rev.class_contrib(
                        cells[i + 1], (in_toks[i], 0), viterbi))
                c = rev.apply_silent(c, viterbi)
                cells[i] = c
            return jnp.stack(cells)

        row = make_row(None, None)
        for o in range(Lo, 0, -1):
            row = make_row(row, out_toks[o - 1])
        return row[0, 0]

    return float(run())


def viterbi_2d_sparse(sm: SparseMachine, in_toks, out_toks):
    """Sparse 2D Viterbi (max-plus) via the Backward fill."""
    return backward_2d_sparse(sm, in_toks, out_toks, viterbi=True)


# ---------------------------------------------------------------------------
# PSWM (profile) inputs x SPARSE machines — completes the reference's
# {TOK, PSWM} x {1D, 2D} x {DENSE, SPARSE} variant grid
# (ref python/machineboss/jax/API.md:6-29; SPARSE+OPTIMAL excluded there
# too). A PSWM row is (n_tok+1,) log weights, col 0 = epsilon skip: the
# position's contribution is the weight-mixed combination of the
# token-conditioned COO classes plus an identity 'skip' term, exactly the
# sparse analog of ops/pswm.pswm_transfer_matrices.
# ---------------------------------------------------------------------------


def _pswm_mix_1d(sm, cell, pswm_row, output_side, viterbi):
    """Weighted combine over this position's token classes + eps skip."""
    comb = _combine(viterbi)
    out = cell + pswm_row[0]                       # eps: skip the position
    n_tok = pswm_row.shape[0] - 1
    for t in range(1, n_tok + 1):
        key = (0, t) if output_side else (t, 0)
        if key in sm.classes:
            out = comb(out, _class_contrib(sm, cell, key, viterbi)
                       + pswm_row[t])
    return out


def forward_1d_sparse_pswm(sm: SparseMachine, pswm, output_side=True,
                           viterbi=False):
    """Sparse 1D Forward/Viterbi over a PSWM profile ((L, n_tok+1) log
    weights, col 0 = eps). One-hot rows reduce exactly to
    forward_1d_sparse on the corresponding token sequence."""
    S = sm.n_states
    pswm = jnp.asarray(pswm)

    @jax.jit
    def run():
        cell = jnp.full((S,), NEG_INF, jnp.float32).at[0].set(0.0)
        sil = _apply_silent_vit if viterbi else SparseMachine.apply_silent
        cell = sil(sm, cell)
        for p in range(pswm.shape[0]):
            cell = sil(sm, _pswm_mix_1d(sm, cell, pswm[p], output_side,
                                        viterbi))
        return cell[S - 1]

    return float(run())


def backward_1d_sparse_pswm(sm: SparseMachine, pswm, output_side=True,
                            viterbi=False):
    """Sparse 1D Backward over a PSWM profile (reverse traversal); total
    equals Forward."""
    S = sm.n_states
    rev = SparseMachineRev(sm)
    comb = _combine(viterbi)
    pswm = jnp.asarray(pswm)

    @jax.jit
    def run():
        cell = jnp.full((S,), NEG_INF, jnp.float32).at[S - 1].set(0.0)
        cell = rev.apply_silent(cell, viterbi)
        for p in range(pswm.shape[0] - 1, -1, -1):
            row = pswm[p]
            nxt = cell + row[0]
            n_tok = row.shape[0] - 1
            for t in range(1, n_tok + 1):
                key = (0, t) if output_side else (t, 0)
                if key in sm.classes:
                    nxt = comb(nxt, rev.class_contrib(cell, key, viterbi)
                               + row[t])
            cell = rev.apply_silent(nxt, viterbi)
        return cell[0]

    return float(run())


def forward_2d_sparse_pswm(sm: SparseMachine, in_pswm, out_pswm,
                           viterbi=False):
    """Sparse 2D Forward/Viterbi with PSWM profiles on both tapes.

    in_pswm: (Li, Ti+1) log weights; out_pswm: (Lo, To+1); col 0 = eps
    skip on that tape (matches ops/pswm.forward_2d_pswm: left/up mixes
    include the eps-identity, the diag mix does not)."""
    S = sm.n_states
    in_pswm = jnp.asarray(in_pswm)
    out_pswm = jnp.asarray(out_pswm)
    Li = int(in_pswm.shape[0])
    Lo = int(out_pswm.shape[0])
    Ti = int(in_pswm.shape[1]) - 1 if Li else 0
    To = int(out_pswm.shape[1]) - 1 if Lo else 0
    comb = _combine(viterbi)

    @jax.jit
    def run():
        neg = jnp.full((S,), NEG_INF, jnp.float32)
        sil = _apply_silent_vit if viterbi else SparseMachine.apply_silent

        def make_row(prev_row, o_row):
            cells = []
            for i in range(Li + 1):
                c = neg
                if prev_row is None and i == 0:
                    c = c.at[0].set(0.0)
                if prev_row is not None:
                    # up: output-token mix + eps skip of the output row
                    up = prev_row[i] + o_row[0]
                    for t in range(1, To + 1):
                        if (0, t) in sm.classes:
                            up = comb(up, _class_contrib(
                                sm, prev_row[i], (0, t), viterbi) + o_row[t])
                    c = comb(c, up)
                    if i > 0:
                        # diag: both tokens consumed (no eps)
                        for ti in range(1, Ti + 1):
                            for to in range(1, To + 1):
                                if (ti, to) in sm.classes:
                                    c = comb(c, _class_contrib(
                                        sm, prev_row[i - 1], (ti, to),
                                        viterbi)
                                        + in_pswm[i - 1, ti] + o_row[to])
                if i > 0:
                    # left: input-token mix + eps skip of the input row
                    lf = cells[i - 1] + in_pswm[i - 1, 0]
                    for t in range(1, Ti + 1):
                        if (t, 0) in sm.classes:
                            lf = comb(lf, _class_contrib(
                                sm, cells[i - 1], (t, 0), viterbi)
                                + in_pswm[i - 1, t])
                    c = comb(c, lf)
                c = sil(sm, c)
                cells.append(c)
            return jnp.stack(cells)

        row = make_row(None, None)
        for o in range(1, Lo + 1):
            row = make_row(row, out_pswm[o - 1])
        return row[Li, S - 1]

    return float(run())


def backward_2d_sparse_pswm(sm: SparseMachine, in_pswm, out_pswm,
                            viterbi=False):
    """Sparse 2D Backward with PSWM profiles on both tapes (reverse
    traversal; total equals forward_2d_sparse_pswm) — the last cell of
    the reference's {TOK, PSWM} x {1D, 2D} x {DENSE, SPARSE} variant
    grid (ref python/machineboss/jax/API.md:6-29). Mirrors
    backward_2d_sparse with the PSWM mixes of forward_2d_sparse_pswm:
    up/left mixes include the position's eps skip, diag does not."""
    S = sm.n_states
    in_pswm = jnp.asarray(in_pswm)
    out_pswm = jnp.asarray(out_pswm)
    Li = int(in_pswm.shape[0])
    Lo = int(out_pswm.shape[0])
    Ti = int(in_pswm.shape[1]) - 1 if Li else 0
    To = int(out_pswm.shape[1]) - 1 if Lo else 0
    rev = SparseMachineRev(sm)
    comb = _combine(viterbi)

    @jax.jit
    def run():
        neg = jnp.full((S,), NEG_INF, jnp.float32)

        def make_row(next_row, o_row):
            # next_row is the o+1 backward row (None for the last row)
            cells = [None] * (Li + 1)
            for i in range(Li, -1, -1):
                c = neg
                if next_row is None and i == Li:
                    c = c.at[S - 1].set(0.0)
                if next_row is not None:
                    # up: output mix incl. the output position's eps skip
                    up = next_row[i] + o_row[0]
                    for t in range(1, To + 1):
                        if (0, t) in sm.classes:
                            up = comb(up, rev.class_contrib(
                                next_row[i], (0, t), viterbi) + o_row[t])
                    c = comb(c, up)
                    if i < Li:
                        # diag: both tokens consumed (no eps)
                        for ti in range(1, Ti + 1):
                            for to in range(1, To + 1):
                                if (ti, to) in sm.classes:
                                    c = comb(c, rev.class_contrib(
                                        next_row[i + 1], (ti, to), viterbi)
                                        + in_pswm[i, ti] + o_row[to])
                if i < Li:
                    # left: input mix incl. the input position's eps skip
                    lf = cells[i + 1] + in_pswm[i, 0]
                    for t in range(1, Ti + 1):
                        if (t, 0) in sm.classes:
                            lf = comb(lf, rev.class_contrib(
                                cells[i + 1], (t, 0), viterbi)
                                + in_pswm[i, t])
                    c = comb(c, lf)
                c = rev.apply_silent(c, viterbi)
                cells[i] = c
            return jnp.stack(cells)

        row = make_row(None, None)
        for o in range(Lo, 0, -1):
            row = make_row(row, out_pswm[o - 1])
        return row[0, 0]

    return float(run())
