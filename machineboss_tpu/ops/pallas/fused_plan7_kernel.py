"""Pallas TPU fused-Plan7 kernel: the whole row solve in VMEM.

The XLA flat solver (ops/fused_plan7._forward_batch_impl) executes
~37 medium tensor ops per token row; ablation on the v5e chip shows the
path is dominated by their HBM materializations and per-op overhead,
not FLOPs (PERF.md round 5). This kernel keeps the entire (St, NB, B)
row state resident in VMEM across the whole read batch and runs one
token row per grid step:

  - SCALED-PROBABILITY space (the wavefront kernels' design): the row
    recurrence is linear, so every semiring op is a multiply/add; the
    per-row renormalization uses the exact power-of-two trick from
    scan1d_kernel (no transcendentals anywhere in the loop).
  - The within-row affine solve is ONE MXU matmul against the
    host-permuted prob-space lower-block-triangular transfer matrix.
  - Per-read token selection (the XLA path's gathers) becomes one-hot
    masked accumulation over the n_out output tokens — St^2 * n_out
    broadcast FMAs per class tensor, all VPU-fusible.
  - Per-k coefficient tables stream once into VMEM as (Kp, cols)
    panels; St x St flank matrices and scalars are baked as
    compile-time constants (St <= 4 enforced; serving configs: St=2).

Mosaic constraints that shaped the code (all found by compiling on the
v5e chip; interpret mode accepts far more than Mosaic does):
  - every class block is Kp = roundup(K, 8) rows, zero-padded, and the
    state layout is Kp-STRIDED — values derived from (Kp, 1)-column
    broadcasts are only ever used WHOLE (this Mosaic version crashes,
    Check failed: limits <= dim, when such values are sublane-sliced);
  - the (Kp, 1) x (1, B) outer products pre-broadcast one side;
  - token rows stream as (8, B) blocks read at row r % 8.

Scope: mode='plan7', local=True, LOGSUMEXP (Forward), multihit on/off —
the serving configuration (fn3 x read batches). Other combos stay on
the XLA solver.

Reference capability: ref js/webgpu/shaders/fused-plan7-batch.wgsl,
python/machineboss/jax/fused_plan7.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _p(x):
    """log -> probability (float64 host), -inf-safe."""
    x = np.asarray(x, np.float64)
    return np.where(x > NEG_INF / 2, np.exp(np.minimum(x, 80.0)), 0.0)


def _kernel(K, St, Kp, NBp, n_sym, Rin, multihit, L, B, consts,
            # refs
            ttri_ref, kco_ref, ksc_ref, emm_ref, emi_ref, tok_ref,
            len_ref,
            out_ref,
            X, ESC):
    """One output-token row per grid step. X (St, NBp, B) scaled-prob
    state in the Kp-STRIDED flat layout
    [M(Kp) Mx(Kp) I(Kp) Ix(Kp) D(Kp) flanks(11)]; ESC (8, B): row 0 =
    pow2 exponent sum, row 1 dead flag."""
    cloop = consts["cloop"]          # St x St python floats (prob)
    enull0 = consts["enull0"]
    mloop_star = consts["mloop_star"]
    mb_E = consts["mb_E"]
    ty0 = consts["ty0"]              # (n_sym, St, St) python floats
    en_y = consts["en_y"]            # (n_sym, St, St) flank emission
    loop_s = consts["loop_s"]
    exit_s = consts["exit_s"]
    half = consts["half"]
    first = consts["first"]          # (St,) python floats (prob)
    r = pl.program_id(0)

    F = 5 * Kp                       # flank base row
    fN = F + 0
    fC = F + 4
    fJ = F + 6
    fT = F + 8

    CO = {name: i * St * St for i, name in enumerate(
        ("em0", "ei0", "ci", "mb_M", "mb_Mx", "mb_I", "mb_Ix", "mb_D"))}
    SC = {name: i for i, name in enumerate(
        ("entry", "m_to_i", "i_to_i", "roll_m", "roll_i", "roll_d",
         "last"))}

    def kcol(name, s, d):
        c = CO[name] + s * St + d
        return kco_ref[:, c:c + 1]

    def scol(name):
        return ksc_ref[:, SC[name]:SC[name] + 1]

    def kmat(v, name):
        """[(Kp,B) per s] x (Kp,St,St) coef panel -> [(Kp,B) per d]."""
        out = []
        for d in range(St):
            acc = None
            for s in range(St):
                t = v[s] * kcol(name, s, d)
                acc = t if acc is None else acc + t
            out.append(acc)
        return out

    def stmat(v, m):
        """[(rows,B) per s] x baked St x St floats -> per d."""
        out = []
        for d in range(St):
            acc = None
            for s in range(St):
                if m[s][d] == 0.0:
                    continue
                t = v[s] * m[s][d]
                acc = t if acc is None else acc + t
            if acc is None:
                acc = jnp.zeros_like(v[0])
            out.append(acc)
        return out

    def row_core(B_hot, cold_m, cold_i, hot_mx, hot_ix):
        """Args: lists over s; B_hot (1,B), blocks (Kp,B). Returns
        m, mx, i, ix, d block lists plus ix_aff."""
        u = [scol("entry") * jnp.broadcast_to(B_hot[s], (Kp, B))
             for s in range(St)]
        b_mx = kmat([u[s] + cold_m[s] for s in range(St)], "em0")
        b_mx = [b_mx[s] + hot_mx[s] for s in range(St)]
        cold_i_ei0 = kmat(cold_i, "ei0")
        ix_aff = [cold_i_ei0[s] + hot_ix[s] for s in range(St)]
        i_aff = [scol("m_to_i") * b_mx[s] + scol("i_to_i") * ix_aff[s]
                 for s in range(St)]
        b_ix = kmat(kmat(i_aff, "ci"), "ei0")
        b_ix = [b_ix[s] + ix_aff[s] for s in range(St)]
        b_d = [jnp.zeros((Kp, B), jnp.float32) for _ in range(St)]

        # ---- one MXU matmul against the Kp-strided triangular transfer
        rows = []
        for blk in (b_mx, b_ix, b_d):
            rows.extend(blk)
        bmat = jnp.concatenate(rows, axis=0)             # (3St*Kp, B)
        pad = Rin - 3 * St * Kp
        if pad:
            bmat = jnp.concatenate(
                [bmat, jnp.zeros((pad, B), jnp.float32)], 0)
        carry = jnp.dot(ttri_ref[:], bmat,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (Rin, B)

        def cblk(c):
            return carry[c * Kp:(c + 1) * Kp, :]

        mx_h = [cblk(s) for s in range(St)]
        ix_h = [cblk(St + s) for s in range(St)]
        d_h = [cblk(2 * St + s) for s in range(St)]

        def shift(x):
            return jnp.concatenate(
                [jnp.zeros((1, B), jnp.float32), x[:-1, :]], 0)

        m_h = []
        for s in range(St):
            lin = (scol("roll_m") * shift(mx_h[s])
                   + scol("roll_i") * shift(ix_h[s])
                   + scol("roll_d") * shift(d_h[s]))
            m_h.append(lin + u[s])
        i_h = kmat([scol("m_to_i") * mx_h[s] + scol("i_to_i") * ix_aff[s]
                    for s in range(St)], "ci")
        return m_h, mx_h, i_h, ix_h, d_h, ix_aff

    def row_E(m_h, mx_h, i_h, ix_h, d_h):
        """local-mode E: sum of all M and D rows (pad rows are exactly
        zero) + last-node I exit via a selector column."""
        e = []
        for s in range(St):
            tot = (jnp.sum(m_h[s], axis=0, keepdims=True)
                   + jnp.sum(d_h[s], axis=0, keepdims=True))
            tot = tot + jnp.sum(ix_h[s] * scol("last"), axis=0,
                                keepdims=True)
            e.append(tot)
        return e

    def solve_row(cold_full, cold_m, cold_i, cold_N, cold_C, cold_J,
                  hot_mx, hot_ix, hot_nx, hot_cx, hot_jx, use_first):
        """cold_full: list over s of (NBp, B) (only added at the end,
        never sliced); block colds are passed separately. Returns new X
        planes."""
        nx_in = stmat(cold_N, enull0)
        nx_in = [nx_in[s] + hot_nx[s] for s in range(St)]
        if use_first:
            nx_in = [nx_in[s] + first[s] for s in range(St)]
        nx_hot = stmat(nx_in, cloop)
        n_hot = [loop_s * nx_hot[s] for s in range(St)]
        B0 = [exit_s * nx_hot[s] for s in range(St)]

        if multihit:
            zb = [jnp.zeros((1, B), jnp.float32) for _ in range(St)]
            m0, mx0, i0, ix0, d0, _ = row_core(zb, cold_m, cold_i,
                                               hot_mx, hot_ix)
            e_base = row_E(m0, mx0, i0, ix0, d0)
            jx_base = stmat(cold_J, enull0)
            jx_base = [jx_base[s] + hot_jx[s] + half * e_base[s]
                       for s in range(St)]
            jcl = stmat(jx_base, cloop)
            c_in = [B0[s] + exit_s * jcl[s] for s in range(St)]
            B_hot = stmat(c_in, mloop_star)

            def badd(base, key):
                add = kmat([jnp.broadcast_to(B_hot[s], (Kp, B))
                            for s in range(St)], key)
                return [base[s] + add[s] for s in range(St)]

            m_h = badd(m0, "mb_M")
            mx_h = badd(mx0, "mb_Mx")
            i_h = badd(i0, "mb_I")
            ix_h = badd(ix0, "mb_Ix")
            d_h = badd(d0, "mb_D")
            be = stmat(B_hot, mb_E)
            e_hot = [e_base[s] + be[s] for s in range(St)]
            jx_in = [jx_base[s] + half * be[s] for s in range(St)]
            jx_hot = stmat(jx_in, cloop)
            j_hot = [loop_s * jx_hot[s] for s in range(St)]
            e_to_c = half
        else:
            B_hot = B0
            m_h, mx_h, i_h, ix_h, d_h, _ = row_core(
                B_hot, cold_m, cold_i, hot_mx, hot_ix)
            e_hot = row_E(m_h, mx_h, i_h, ix_h, d_h)
            jx_hot = j_hot = [jnp.zeros((1, B), jnp.float32)
                              for _ in range(St)]
            e_to_c = 1.0

        cx_in = stmat(cold_C, enull0)
        cx_in = [cx_in[s] + hot_cx[s] + e_to_c * e_hot[s]
                 for s in range(St)]
        cx_hot = stmat(cx_in, cloop)
        c_hot = [loop_s * cx_hot[s] for s in range(St)]
        t_hot = [exit_s * cx_hot[s] for s in range(St)]
        zf = jnp.zeros((1, B), jnp.float32)

        new = []
        for s in range(St):
            flanks = jnp.concatenate(
                [n_hot[s], nx_hot[s], B_hot[s], e_hot[s], c_hot[s],
                 cx_hot[s], j_hot[s], jx_hot[s], t_hot[s], zf, zf],
                axis=0)                                   # (11, B)
            parts = [m_h[s], mx_h[s], i_h[s], ix_h[s], d_h[s], flanks]
            if NBp > 5 * Kp + 11:
                parts.append(jnp.zeros((NBp - 5 * Kp - 11, B),
                                       jnp.float32))
            new.append(jnp.concatenate(parts, axis=0) + cold_full[s])
        return new

    @pl.when(r == 0)
    def _init():
        ESC[:] = jnp.zeros_like(ESC)
        zkp = [jnp.zeros((Kp, B), jnp.float32) for _ in range(St)]
        z1 = [jnp.zeros((1, B), jnp.float32) for _ in range(St)]
        zfull = [jnp.zeros((NBp, B), jnp.float32) for _ in range(St)]
        x0 = solve_row(zfull, zkp, zkp, z1, z1, z1, zkp, zkp, z1, z1,
                       z1, True)
        for s in range(St):
            X[s] = x0[s]

    # ---- token row r (tokens stream as (8, B) blocks)
    tok = tok_ref[r % 8, :][None, :]                     # (1, B) int32
    masks = [(tok == (y + 1)).astype(jnp.float32) for y in range(n_sym)]
    mask_kp = [jnp.broadcast_to(masks[y], (Kp, B)) for y in range(n_sym)]
    keep = (r < len_ref[0:1, :]).astype(jnp.float32)

    xs = [X[s] for s in range(St)]                       # ref reads
    x_m = [X[s][0:Kp, :] for s in range(St)]
    x_i = [X[s][2 * Kp:3 * Kp, :] for s in range(St)]
    x_N = [X[s][fN:fN + 1, :] for s in range(St)]
    x_C = [X[s][fC:fC + 1, :] for s in range(St)]
    x_J = [X[s][fJ:fJ + 1, :] for s in range(St)]

    # cold = x (x) Ty0[tok]: per (s, d) scalar blend; the full-state
    # cold is only ever ADDED whole, block colds are recomputed from
    # ref-read blocks (broadcast-derived values must not be sliced)
    def ty_coef(s, d):
        coef = None
        for y in range(n_sym):
            w = ty0[y][s][d]
            if w == 0.0:
                continue
            t = masks[y] * w
            coef = t if coef is None else coef + t
        return coef

    def cold_of(blocks):
        out = []
        for d in range(St):
            acc = None
            for s in range(St):
                coef = ty_coef(s, d)
                if coef is None:
                    continue
                t = blocks[s] * coef
                acc = t if acc is None else acc + t
            out.append(acc if acc is not None
                       else jnp.zeros_like(blocks[0]))
        return out

    cold_full = cold_of(xs)
    cold_m = cold_of(x_m)
    cold_i = cold_of(x_i)
    cold_N = cold_of(x_N)
    cold_C = cold_of(x_C)
    cold_J = cold_of(x_J)

    # hot = src (x) EM[tok], per class block (M via emm panel, I via
    # emi panel, flanks via baked St x St per-token matrices)
    def hot_block(xblk, panel_ref):
        out = []
        for d in range(St):
            acc = None
            for y in range(n_sym):
                inner = None
                for s in range(St):
                    c = (y * St + s) * St + d
                    t = xblk[s] * panel_ref[:, c:c + 1]
                    inner = t if inner is None else inner + t
                t = inner * mask_kp[y]
                acc = t if acc is None else acc + t
            out.append(acc)
        return out

    def hot_flank(xrow, mats):
        out = []
        for d in range(St):
            acc = None
            for y in range(n_sym):
                inner = None
                for s in range(St):
                    w = mats[y][s][d]
                    if w == 0.0:
                        continue
                    t = xrow[s] * w
                    inner = t if inner is None else inner + t
                if inner is None:
                    continue
                t = inner * masks[y]
                acc = t if acc is None else acc + t
            out.append(acc if acc is not None
                       else jnp.zeros((1, B), jnp.float32))
        return out

    hot_mx = hot_block(x_m, emm_ref)
    hot_ix = hot_block(x_i, emi_ref)
    hot_nx = hot_flank(x_N, en_y)
    hot_cx = hot_flank(x_C, en_y)
    hot_jx = hot_flank(x_J, en_y)

    x_new = solve_row(cold_full, cold_m, cold_i, cold_N, cold_C,
                      cold_J, hot_mx, hot_ix, hot_nx, hot_cx, hot_jx,
                      False)

    # ---- per-row EXACT pow2 renormalization + keep masking
    m = None
    for s in range(St):
        ms = jnp.max(x_new[s], axis=0, keepdims=True)
        m = ms if m is None else jnp.maximum(m, ms)
    dead = (m <= 0.0).astype(jnp.float32)
    msafe = jnp.where(m > 0.0, m, 1.0)
    bits = pltpu.bitcast(msafe, jnp.int32)
    kexp = jnp.bitwise_and(jnp.right_shift(bits, 23), 0xFF)
    inv = pltpu.bitcast(jnp.left_shift(254 - kexp, 23), jnp.float32)
    for s in range(St):
        X[s] = jnp.where(keep > 0.5, x_new[s] * inv, X[s])
    ESC[0:1, :] = ESC[0:1, :] + (kexp - 127).astype(jnp.float32) * keep
    ESC[1:2, :] = jnp.maximum(ESC[1:2, :], dead * keep)

    @pl.when(r == L - 1)
    def _fin():
        out_ref[0:1, :] = X[St - 1][fT:fT + 1, :]
        out_ref[1:2, :] = ESC[0:1, :]
        out_ref[2:3, :] = ESC[1:2, :]
        out_ref[3:8, :] = jnp.zeros((5, B), jnp.float32)


def make_fused_plan7_pallas(fused, B, L, interpret=False):
    """Build the kernel for a Plan7Fused instance (mode='plan7',
    local=True, logsumexp). Returns fn(toks (B, L) 1-based int32,
    lens (B,)) -> (B,) float64 log-likelihoods."""
    if fused.mode != "plan7" or not fused.local or fused.viterbi:
        raise ValueError("pallas fused plan7: plan7/local/Forward only")
    if fused.St > 4:
        raise ValueError("pallas fused plan7: St <= 4")
    if not hasattr(fused, "_fb"):
        fused._init_flat()
    j = fused._j
    K, St = fused.K, fused.St
    n_sym = fused.n_out - 1
    Kp = _round_up(K, 8)
    NBp = _round_up(5 * Kp + 11, 8)
    R = 3 * St * Kp
    Rin = _round_up(R, 128)
    Bp = _round_up(B, 128)

    def npy(x):
        return np.asarray(x, np.float64)

    # Kp-strided permuted prob-space triangular transfer:
    # kernel carry row cj*Kp+k = sum over (ci, k') of
    # b[ci*Kp+k'] * T[k'*3St+ci, k*3St+cj]; pad rows/cols stay zero
    t_tri = _p(npy(j["t_tri"]))                  # (K*3St, K*3St) prob
    ttri_dev = np.zeros((Rin, Rin), np.float32)
    for ci in range(3 * St):
        for cj in range(3 * St):
            blk = t_tri[ci::3 * St, cj::3 * St]  # (K, K) over (k', k)
            ttri_dev[cj * Kp:cj * Kp + K, ci * Kp:ci * Kp + K] = blk.T
    ttri_dev = np.ascontiguousarray(ttri_dev)

    def kpanel(x):
        return _p(npy(x)).reshape(K, St * St)

    kco = np.zeros((Kp, 128), np.float32)
    if fused.multihit:
        srcs = (j["em0"], j["ei0"], j["ci"], fused._mb["M"],
                fused._mb["Mx"], fused._mb["I"], fused._mb["Ix"],
                fused._mb["D"])
    else:
        srcs = (j["em0"], j["ei0"], j["ci"], j["em0"], j["em0"],
                j["em0"], j["em0"], j["em0"])
    for i, src in enumerate(srcs):
        kco[:K, i * St * St:(i + 1) * St * St] = kpanel(src)

    ksc = np.zeros((Kp, 128), np.float32)
    ksc[:K, 0] = _p(npy(j["entry"]))
    ksc[:K, 1] = _p(npy(j["m_to_i"]))
    ksc[:K, 2] = _p(npy(j["i_to_i"]))
    ksc[:K, 3] = _p(np.roll(npy(j["m_to_m"]), 1))
    ksc[:K, 4] = _p(np.roll(npy(j["i_to_m"]), 1))
    ksc[:K, 5] = _p(np.roll(npy(j["d_to_m"]), 1))
    ksc[K - 1, 6] = _p(npy(j["i_to_m"])[K - 1])   # last-node I->E select

    emcols = _round_up(n_sym * St * St, 128)
    em_stack = _p(npy(fused._em_stack))           # (n_out, 2K+4, St, St)
    emm = np.zeros((Kp, emcols), np.float32)
    emi = np.zeros((Kp, emcols), np.float32)
    for y in range(n_sym):
        for s in range(St):
            for d in range(St):
                c = (y * St + s) * St + d
                emm[:K, c] = em_stack[y + 1, 0:K, s, d]
                emi[:K, c] = em_stack[y + 1, K:2 * K, s, d]

    def stm(x):
        return [[float(v) for v in row] for row in _p(npy(x))]

    first_log = np.full((St,), NEG_INF)
    first_log[0] = 0.0
    tclo = _p(npy(j["t_closure"]))
    first = list((_p(first_log)[None, :] @ tclo)[0])

    en_y = [stm(fused._em_stack[y + 1, 2 * K]) for y in range(n_sym)]
    ident = [[1.0 if a == b else 0.0 for b in range(St)]
             for a in range(St)]
    consts = dict(
        cloop=stm(j["cloop"]),
        enull0=stm(j["enull0"]),
        mloop_star=stm(fused._mloop_star) if fused.multihit else ident,
        mb_E=stm(fused._mb["E"]) if fused.multihit
        else [[0.0] * St for _ in range(St)],
        ty0=[[[float(v) for v in row]
              for row in _p(npy(j["ty0"][y + 1]))]
             for y in range(n_sym)],
        en_y=en_y,
        loop_s=float(_p(fused.log_loop)),
        exit_s=float(_p(fused.log_exit)),
        half=0.5,
        first=[float(v) for v in first],
    )

    kernel = functools.partial(_kernel, K, St, Kp, NBp, n_sym, Rin,
                               bool(fused.multihit), L, Bp, consts)
    call = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # ttri
            pl.BlockSpec(memory_space=pltpu.VMEM),           # kco
            pl.BlockSpec(memory_space=pltpu.VMEM),           # ksc
            pl.BlockSpec(memory_space=pltpu.VMEM),           # emm
            pl.BlockSpec(memory_space=pltpu.VMEM),           # emi
            pl.BlockSpec((8, Bp), lambda r: (r // 8, 0),
                         memory_space=pltpu.VMEM),           # toks
            pl.BlockSpec(memory_space=pltpu.VMEM),           # lens
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((St, NBp, Bp), jnp.float32),
            pltpu.VMEM((8, Bp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
    ttri_j = jnp.asarray(ttri_dev)
    kco_j = jnp.asarray(kco)
    ksc_j = jnp.asarray(ksc)
    emm_j = jnp.asarray(emm)
    emi_j = jnp.asarray(emi)
    L8 = _round_up(L, 8)

    @jax.jit
    def _dev(toks, lens):
        tp = jnp.ones((L8, Bp), jnp.int32)
        tp = tp.at[:L, :B].set(jnp.transpose(toks).astype(jnp.int32))
        lp = jnp.zeros((8, Bp), jnp.int32).at[0, :B].set(lens)
        return call(ttri_j, kco_j, ksc_j, emm_j, emi_j, tp, lp)

    def decode(out, B_=B):
        """Host decode of the kernel's (8, Bp) output rows: pow2
        mantissa/exponent -> float64 log-likelihoods (the single place
        that knows the ESC encoding — forward_stream reuses it)."""
        out = np.asarray(out, np.float64)
        mant, expo, dead = out[0, :B_], out[1, :B_], out[2, :B_] > 0.5
        with np.errstate(divide="ignore"):
            ll = np.log(np.maximum(mant, 1e-300)) + expo * np.log(2.0)
        return np.where(dead | (mant <= 0.0), NEG_INF, ll)

    def fwd(toks, lens):
        return decode(_dev(toks, lens))

    fwd.device_call = _dev
    fwd.decode = decode
    return fwd
