"""Device-filled Viterbi: MAXPLUS lattice on TPU, traceback on host.

The O(Li*Lo*S^2) Viterbi fill runs on device (max-plus semiring through the
same 2D engines as Forward; the max-plus silent closure is the host DAG-DP
closure of ops/lowering.closure_for); the resulting value lattice is copied
back once and the O(path) traceback walks it with the SAME host machinery
as the host ViterbiMatrix (algo/dp_host.DPMatrix.traceback), so alignment
output is identical to the host engine by construction of the recurrence
and differs only by f32-vs-f64 fill noise at exact ties.

Equivalent reference capability: the WebGPU package's viterbi(+path) on
GPU (ref js/webgpu/machineboss-gpu.mjs:63, shaders/wavefront-*.wgsl).
"""

import numpy as np

from .dp_host import DPMatrix, NEG_INF
from ..ops.lowering import LoweredMachine


class DeviceViterbiMatrix(DPMatrix):
    """Drop-in for algo/dp_host.ViterbiMatrix with the fill on device.

    Accepts an optional pre-built LoweredMachine (reuse across pairs) and
    an optional `fill_fn(in_toks0, out_toks0) -> (Li+1, Lo+1, S) ndarray`
    override (e.g. the Pallas wavefront Viterbi kernel)."""

    def __init__(self, ev, seq_pair, lowered=None, fill_fn=None,
                 dtype=np.float32):
        super().__init__(ev, seq_pair)
        it0 = np.array(self.input, np.int32) - 1      # device tokens 0-based
        ot0 = np.array(self.output, np.int32) - 1
        if fill_fn is None:
            import jax.numpy as jnp
            from ..ops import dp2d
            from ..ops.semiring import MAXPLUS
            lm = lowered if lowered is not None else \
                LoweredMachine(ev, dtype=dtype)
            a_diag, a_left, a_up, closure = (
                jnp.array(x) for x in lm.matrices_2d("maxplus"))
            lattice = np.transpose(np.array(dp2d.forward_2d_lattice(
                a_diag, a_left, a_up, closure,
                jnp.array(it0), jnp.array(ot0),
                sr=MAXPLUS)), (1, 0, 2))               # -> (Li+1, Lo+1, S)
        else:
            # fill_fn contract: (Li+1, Lo+1, S)
            lattice = np.asarray(fill_fn(it0, ot0))
        from ..utils.debug import check_finite
        check_finite("device_viterbi_lattice", lattice)
        self.cell[...] = np.maximum(np.asarray(lattice, np.float64),
                                    NEG_INF)

    def log_like(self):
        return self.get(self.in_len, self.out_len, self.n_states - 1)

    def path(self, machine):
        return self.traceback(machine)


class _MissingCell(Exception):
    pass


def _cached(ev, attr, key, build):
    """Per-EvaluatedMachine cache for walkers/premats: a CLI run (or a
    caller looping over read batches) reuses one EvaluatedMachine, so
    host matrix prep and walker jit-compiles happen once per machine."""
    store = ev.__dict__.setdefault(attr, {})
    if key not in store:
        store[key] = build()
    return store[key]


def _walker_for(ev, li, lo):
    from .traceback_device import make_lattice_walker
    return _cached(ev, "_tb_walkers", (li, lo),
                   lambda: make_lattice_walker(ev, li, lo))


class SparseDeviceViterbiMatrix(DPMatrix):
    """Lattice-free device Viterbi matrix.

    The device walks the lattice at cell granularity
    (algo/traceback_device.make_lattice_walker) and ships only the path
    cells' 4-neighborhood value vectors; get() serves those sparse values
    to the EXACT host traceback (same per-edge option order, f64
    arithmetic). Any query outside the emitted set — an exact tie broken
    differently by the f32 device argmax — triggers the full-lattice
    readback fallback, so output never depends on the device walk."""

    def __init__(self, ev, seq_pair, cells, walk_ok, fallback):
        super().__init__(ev, seq_pair)
        self._cells = cells or {}
        self._walk_ok = bool(walk_ok) and bool(self._cells)
        self._fallback = fallback
        self._full = None

    def _alloc_lattice(self):
        return None                      # get() never touches self.cell

    def _materialize(self):
        if self._full is None:
            self._full = self._fallback()
        return self._full

    def get(self, i, o, s):
        if self._full is not None:
            return self._full.get(i, o, s)
        if not (0 <= o <= self.out_len and self.env.contains(i, o)):
            return NEG_INF
        v = self._cells.get((i, o))
        if v is None:
            raise _MissingCell((i, o))
        return v[s]

    def log_like(self):
        # the final-cell record is valid even when the walk got stuck
        # (it is emitted before the first move), so a no-path pair's
        # -inf log-like never forces the full readback
        if self._full is None:
            v = self._cells.get((self.in_len, self.out_len))
            if v is not None:
                return float(v[self.n_states - 1])
        return self._materialize().log_like()

    def traceback(self, machine, *args, **kwargs):
        if self._full is not None or not self._walk_ok:
            return self._materialize().traceback(machine, *args, **kwargs)
        try:
            return super().traceback(machine, *args, **kwargs)
        except _MissingCell:
            return self._materialize().traceback(machine, *args, **kwargs)

    def path(self, machine):
        return self.traceback(machine)


def device_viterbi_matrices(ev, seq_pairs, lowered=None, dtype=np.float32,
                            engine="auto", interpret=False,
                            envelopes=None, sparse_traceback=True):
    """Batched device Viterbi fill for a list of tokenizable SeqPairs.

    ONE batched MAXPLUS wavefront call (padded to the max lengths) fills
    every pair's value lattice on device; per-pair matrices share the
    compiled kernel instead of recompiling per length pair. Returns
    [DeviceViterbiMatrix, ...] aligned with seq_pairs.

    engine: 'pallas' = the VMEM-resident Pallas MAXPLUS kernel
    (ops/pallas/viterbi_kernel.py), 'wavefront' = the jnp diagonal engine,
    'auto' = pallas on TPU backends, jnp elsewhere.

    envelopes: optional [core.seqpair.Envelope, ...] aligned with
    seq_pairs (e.g. --wiggle-room bands): non-full envelopes route to
    the BANDED Pallas kernel (one per-pair call over the band window —
    only band cells are filled, the reference's --wiggle-room banding on
    the device path, ref src/seqpair.h:75-113)."""
    import jax
    import jax.numpy as jnp
    from ..ops.wavefront import (wavefront_2d_diagonals,
                                 lattice_from_diagonals)
    from ..ops.semiring import MAXPLUS

    lm = lowered if lowered is not None else LoweredMachine(ev, dtype=dtype)

    def _is_full(env, li, lo):
        return all(env.in_start[o] == 0 and env.in_end[o] == li + 1
                   for o in range(lo + 1))

    if envelopes is not None and any(
            not _is_full(e, len(sp.input.seq), len(sp.output.seq))
            for e, sp in zip(envelopes, seq_pairs)):
        from ..ops.pallas.viterbi_kernel import (
            make_wavefront_viterbi_banded, envelope_diag_bands,
            maxplus_class_mats)
        from .traceback_device import (run_walker,
                                       sparse_cells_from_records)
        host_mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))
        premats = _cached(ev, "_vit_premats", None,
                          lambda: maxplus_class_mats(*host_mats))
        interp = interpret or jax.default_backend() in ("cpu",)
        out = []
        for env, sp in zip(envelopes, seq_pairs):
            it0 = np.array(ev.input_tokenizer.tokenize(sp.input.seq),
                           np.int32) - 1
            ot0 = np.array(ev.output_tokenizer.tokenize(sp.output.seq),
                           np.int32) - 1
            li, lo = len(it0), len(ot0)
            lo_d, hi_d = envelope_diag_bands(env)
            fill = make_wavefront_viterbi_banded(
                *host_mats, li, lo, lo_d, hi_d, interpret=interp,
                premats=premats)
            if not sparse_traceback:
                out.append(DeviceViterbiMatrix(
                    ev, sp, fill_fn=lambda i0, o0, f=fill: f(i0, o0)))
                continue
            # band lattice stays ON DEVICE; only the path neighborhood
            # comes back (full readback only as a tie-divergence fallback)
            lat_dev = fill.fill_raw(it0, ot0)
            walker = _walker_for(ev, li, lo)
            import jax.numpy as jnp
            n, ij, vals, okf = run_walker(
                walker, jnp.transpose(lat_dev, (0, 2, 1)), fill.bases,
                it0, ot0, li, lo)
            cells = sparse_cells_from_records(n, ij, vals)

            if okf:
                # successful walk: drop the device lattice now — pinning
                # every pair's ~100 MB band in HBM for the matrices'
                # lifetime would exhaust the chip on long batches; the
                # rare tie-divergence fallback re-runs the fill instead
                def _fb(fill=fill, it0=it0, ot0=ot0, sp=sp):
                    full = fill.scatter(np.asarray(
                        fill.fill_raw(it0, ot0)))
                    return DeviceViterbiMatrix(
                        ev, sp, fill_fn=lambda i0, o0, f=full: f)
                lat_dev = None
            else:
                def _fb(lat_dev=lat_dev, fill=fill, sp=sp):
                    full = fill.scatter(np.asarray(lat_dev))
                    return DeviceViterbiMatrix(
                        ev, sp, fill_fn=lambda i0, o0, f=full: f)
            out.append(SparseDeviceViterbiMatrix(ev, sp, cells, okf, _fb))
        return out
    tok_in = [np.array(ev.input_tokenizer.tokenize(sp.input.seq),
                       np.int32) - 1 for sp in seq_pairs]
    tok_out = [np.array(ev.output_tokenizer.tokenize(sp.output.seq),
                        np.int32) - 1 for sp in seq_pairs]
    B = len(seq_pairs)
    Li = max([len(t) for t in tok_in] + [1])
    Lo = max([len(t) for t in tok_out] + [1])
    it = np.zeros((B, Li), np.int32)
    ot = np.zeros((B, Lo), np.int32)
    for b in range(B):
        it[b, :len(tok_in[b])] = tok_in[b]
        ot[b, :len(tok_out[b])] = tok_out[b]
    if engine == "auto":
        engine = "pallas" if jax.default_backend() not in ("cpu",) \
            else "wavefront"
    host_mats = tuple(np.asarray(x) for x in lm.matrices_2d("maxplus"))
    if engine == "pallas":
        from ..ops.pallas.viterbi_kernel import make_wavefront_viterbi
        vit = make_wavefront_viterbi(*host_mats, B, Li, Lo,
                                     interpret=interpret)
        diags = vit(jnp.array(it), jnp.array(ot))
    else:
        mats = tuple(jnp.array(x) for x in host_mats)
        diags = wavefront_2d_diagonals(*mats, jnp.array(it), jnp.array(ot),
                                       sr=MAXPLUS)
    if not sparse_traceback:
        lat = lattice_from_diagonals(diags, Li, Lo)   # (B, Li+1, Lo+1, S)
        return [DeviceViterbiMatrix(
            ev, sp, fill_fn=lambda i0, o0, b=b, li=len(tok_in[b]),
            lo=len(tok_out[b]): lat[b, :li + 1, :lo + 1, :])
            for b, sp in enumerate(seq_pairs)]
    # keep the diagonal slabs ON DEVICE; per pair, one device walk ships
    # just the path neighborhood (the full batched lattice is only read
    # back if some pair's host traceback diverges from the device walk)
    from .traceback_device import run_walker, sparse_cells_from_records
    walker = _walker_for(ev, Li, Lo)
    lat_cache = []

    def _full_lat():
        if not lat_cache:
            lat_cache.append(lattice_from_diagonals(diags, Li, Lo))
        return lat_cache[0]

    zeros = np.zeros(Li + Lo + 1, np.int32)
    out = []
    for b, sp in enumerate(seq_pairs):
        li, lo = len(tok_in[b]), len(tok_out[b])
        n, ij, vals, okf = run_walker(walker, diags[:, b], zeros,
                                      tok_in[b], tok_out[b], li, lo)
        cells = sparse_cells_from_records(n, ij, vals)

        def _fb(b=b, li=li, lo=lo, sp=sp):
            return DeviceViterbiMatrix(
                ev, sp, fill_fn=lambda i0, o0:
                _full_lat()[b, :li + 1, :lo + 1, :])
        out.append(SparseDeviceViterbiMatrix(ev, sp, cells, okf, _fb))
    return out
