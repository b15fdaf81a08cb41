"""Device-side Viterbi traceback: walk the value lattice ON DEVICE.

The round-4 device alignment was readback-dominated: the banded 1500x1500
fill took 0.48 s but shipping the (n_diags, W, S) band lattice to the host
for the traceback took ~8 s over the device tunnel (PERF.md). The
reference's own design point never round-trips the lattice either (rolling
two-row storage + host traceback, ref src/dpmatrix.h:34-58,
dpmatrix.defs.h:62-130).

This module walks the lattice at CELL granularity on device (one jitted
lax.while_loop — a single invocation, so the ~24 ms dispatch floor is paid
once) and emits only the visited cells' 4-neighborhood value vectors
(O((Li+Lo) * 4S) floats ~ 3 MB at L=1500 instead of the full band
~98 MB). The HOST then re-runs its exact traceback (algo/dp_host
.DPMatrix.traceback — per-edge option order, f64 arithmetic, table
semantics) over those sparse values, so alignment output is identical to
the full-readback path whenever the device cell walk visits the same
cells. If the host walk ever queries a cell the device did not emit (an
exact-tie broken differently by f32-vs-f64 candidate sums), the caller
falls back to the full lattice readback — correctness never depends on
the device walk.

The device walk mirrors the host option order exactly: candidates are
laid out [match, input-only, output-only, silent] with ascending source
state inside each block, and jnp.argmax takes the first maximum, like
np.argmax over the host option list.

Sequence lengths (li, lo) are TRACED arguments — one compile of the walk
serves every pair in a padded batch (lengths vary, shapes do not).
"""

import numpy as np

NEG_INF = -1e30


def maxplus_edge_matrices(ev):
    """Raw (non-closure-folded) per-token max-folded log matrices.

    Returns (a_diag (Ti, To, S, S), a_left (Ti, S, S), a_up (To, S, S),
    sil (S, S)) float32 numpy, NEG_INF for absent edges; parallel edges
    fold by MAX (Viterbi traceback semantics — lowering.log_trans folds
    by logaddexp, which is Forward semantics and would mis-rank
    traceback candidates on machines with parallel edges)."""
    S = ev.n_states()
    Ti = max(ev.input_tokenizer.n_tokens() - 1, 1)
    To = max(ev.output_tokenizer.n_tokens() - 1, 1)
    a_diag = np.full((Ti, To, S, S), NEG_INF)
    a_left = np.full((Ti, S, S), NEG_INF)
    a_up = np.full((To, S, S), NEG_INF)
    sil = np.full((S, S), NEG_INF)
    for (i, o), (src, dst, _, lw) in ev.edges_by_token().items():
        lw = np.where(np.isfinite(lw), lw, NEG_INF)
        if i and o:
            np.maximum.at(a_diag, (i - 1, o - 1, src, dst), lw)
        elif i:
            np.maximum.at(a_left, (i - 1, src, dst), lw)
        elif o:
            np.maximum.at(a_up, (o - 1, src, dst), lw)
        else:
            np.maximum.at(sil, (src, dst), lw)
    # a weight<=0 silent self-loop ties its own cell value and can never
    # be on an optimal simple path; excluding it keeps the walk finite
    np.fill_diagonal(sil, NEG_INF)
    f32 = np.float32
    return a_diag.astype(f32), a_left.astype(f32), a_up.astype(f32), \
        sil.astype(f32)


def silent_chain_depth(ev):
    """Longest silent chain (edges), for the walk-iteration bound."""
    S = ev.n_states()
    silent = ev.edges_by_token().get((0, 0))
    if silent is None:
        return 0
    src, dst, _, _ = silent  # sorted by (dst, src): topological
    depth = np.zeros(S, np.int64)
    for k in range(len(src)):
        if dst[k] != src[k]:
            depth[dst[k]] = max(depth[dst[k]], depth[src[k]] + 1)
    return int(depth.max())


def make_lattice_walker(ev, Li_max, Lo_max):
    """Build the jitted device cell-walk for one machine and max lengths.

    The lattice argument is the wavefront slab layout (n_diags, W, S):
    slab d holds cell (i, o=d-i) at window index w = i - bases[d]
    (bases = zeros for a full lattice; the banded kernel's window bases
    otherwise, padded/clipped to n_diags entries).

    Returns walk(lat, bases (n_diags,) i32, in_toks (max(Li_max,1),) i32,
    out_toks (max(Lo_max,1),) i32, li, lo) ->
      (n_cells i32, ij (Ncap, 2) i32, vals (Ncap, 4, S) f32, ok bool)
    where vals[k] = [cell, diag-neighbor, left-neighbor, up-neighbor]
    value vectors of the k-th distinct visited cell ij[k], in visit
    (end-to-start) order; ok=False means the walk got stuck or overran
    its iteration bound and the caller must fall back to full readback.
    """
    import jax
    import jax.numpy as jnp

    S = ev.n_states()
    ad, al, au, sil = maxplus_edge_matrices(ev)
    Ncap = Li_max + Lo_max + 2
    max_steps = Ncap * (1 + silent_chain_depth(ev))
    adj = jnp.asarray(ad)
    alj = jnp.asarray(al)
    auj = jnp.asarray(au)
    silj = jnp.asarray(sil)
    neg = jnp.float32(NEG_INF)

    @jax.jit
    def walk(lat, bases, in_toks, out_toks, li, lo):
        W = lat.shape[1]
        nd = bases.shape[0]

        def get_cell(i, o):
            d = jnp.clip(i + o, 0, nd - 1)
            w = i - bases[d]
            v = jax.lax.dynamic_slice(
                lat, (d, jnp.clip(w, 0, W - 1), 0), (1, 1, S))[0, 0]
            ok = (i >= 0) & (o >= 0) & (i <= li) & (o <= lo) \
                & (w >= 0) & (w < W)
            return jnp.where(ok, v.astype(jnp.float32), neg)

        def cond(st):
            i, o, s, n, step, done, stuck, pi, po, ij, vals = st
            return (~done) & (step < max_steps) & (n < Ncap)

        def body(st):
            i, o, s, n, step, done, stuck, pi, po, ij, vals = st
            cur = get_cell(i, o)
            cdg = get_cell(i - 1, o - 1)
            clf = get_cell(i - 1, o)
            cup = get_cell(i, o - 1)
            # emit this cell's neighborhood; when the move below is
            # silent the NEXT iteration re-writes the same record at the
            # same slot (n only advances on a cell change) — harmless
            rec = jnp.stack([cur, cdg, clf, cup])       # (4, S)
            vals = jax.lax.dynamic_update_slice(vals, rec[None],
                                                (n, 0, 0))
            ij = jax.lax.dynamic_update_slice(
                ij, jnp.stack([i, o]).astype(jnp.int32)[None], (n, 0))
            new = (i != pi) | (o != po)
            n2 = n + new.astype(jnp.int32)

            tx = in_toks[jnp.clip(i - 1, 0, max(Li_max - 1, 0))]
            ty = out_toks[jnp.clip(o - 1, 0, max(Lo_max - 1, 0))]
            cold = jax.lax.dynamic_slice(
                adj, (tx, ty, 0, s), (1, 1, S, 1))[0, 0, :, 0]
            coll = jax.lax.dynamic_slice(
                alj, (tx, 0, s), (1, S, 1))[0, :, 0]
            colu = jax.lax.dynamic_slice(
                auj, (ty, 0, s), (1, S, 1))[0, :, 0]
            cols = jax.lax.dynamic_slice(silj, (0, s), (S, 1))[:, 0]
            cd = jnp.where((i > 0) & (o > 0), cdg + cold, neg)
            cl = jnp.where(i > 0, clf + coll, neg)
            cu = jnp.where(o > 0, cup + colu, neg)
            cs = cur + cols
            opts = jnp.concatenate([cd, cl, cu, cs])    # host option order
            b = jnp.argmax(opts)
            bad = opts[b] <= neg / 2
            case = b // S
            src = (b % S).astype(jnp.int32)
            di = ((case == 0) | (case == 1)).astype(jnp.int32)
            do = ((case == 0) | (case == 2)).astype(jnp.int32)
            i2 = jnp.where(bad, i, i - di)
            o2 = jnp.where(bad, o, o - do)
            s2 = jnp.where(bad, s, src)
            done2 = ((i2 == 0) & (o2 == 0) & (s2 == 0)) | bad
            return (i2, o2, s2, n2, step + 1, done2, stuck | bad,
                    i, o, ij, vals)

        li = jnp.int32(li)
        lo = jnp.int32(lo)
        st = (li, lo, jnp.int32(S - 1), jnp.int32(0), jnp.int32(0),
              jnp.bool_(S == 1) & (li == 0) & (lo == 0),
              jnp.bool_(False), jnp.int32(-1), jnp.int32(-1),
              jnp.full((Ncap, 2), -1, jnp.int32),
              jnp.full((Ncap, 4, S), neg, jnp.float32))
        i, o, s, n, step, done, stuck, pi, po, ij, vals = \
            jax.lax.while_loop(cond, body, st)
        ok = done & (~stuck) & (i == 0) & (o == 0) & (s == 0)
        return n, ij, vals, ok

    walk.Li_max = Li_max
    walk.Lo_max = Lo_max
    return walk


def run_walker(walk, lat, bases, in_toks, out_toks, li, lo):
    """Run the device walk and return host-side
    (n_cells, ij ndarray, vals ndarray, ok). Token arrays are padded to
    the walker's static max lengths (>= 1) so zero-length sequences and
    shorter batch members stay indexable."""
    import jax.numpy as jnp

    itp = np.zeros(max(walk.Li_max, 1), np.int32)
    itp[:li] = np.asarray(in_toks, np.int32)[:li]
    otp = np.zeros(max(walk.Lo_max, 1), np.int32)
    otp[:lo] = np.asarray(out_toks, np.int32)[:lo]
    n, ij, vals, ok = walk(lat, jnp.asarray(bases, jnp.int32),
                           jnp.asarray(itp), jnp.asarray(otp), li, lo)
    return int(n), np.asarray(ij), np.asarray(vals), bool(ok)


def sparse_cells_from_records(n_cells, ij, vals):
    """{(i, o): (S,) float64} from walker records: each record carries the
    cell itself plus its diag/left/up neighbors (exactly the cells the
    host traceback will query along the same path)."""
    cells = {}
    for k in range(n_cells):
        i, o = int(ij[k, 0]), int(ij[k, 1])
        for (di, do, r) in ((0, 0, 0), (-1, -1, 1), (-1, 0, 2), (0, -1, 3)):
            ci, co = i + di, o + do
            if ci >= 0 and co >= 0 and (ci, co) not in cells:
                cells[(ci, co)] = np.asarray(vals[k, r], np.float64)
    return cells
