"""Chain-specialized fused Plan7 (x) transducer DP.

Scores a transducer's output against a HMMER profile generator WITHOUT
materializing the composite state space, exploiting the Plan7 linear chain
(equivalent of the reference's fused Plan7 DP,
ref python/machineboss/jax/fused_plan7.py and API.md:205-223):
O(Lo * K * St^2) instead of O(Lo * S_p7^2 * St) for the composition.

TPU-first structure — per output position (one lax.scan step):
  1. "base" contributions from the previous row land batched over profile
     nodes k (einsum-shaped semiring ops): the transducer consumes a
     profile emission AND emits y_o (EMy/EIy), or emits y_o on its own
     (Ty0 moves, valid in every generator state class).
  2. the within-row silent sweep along k (delete chains + silent
     absorption of profile emissions by the transducer) is a first-order
     affine recurrence over k whose transfer matrix A_k (3St x 3St, carry
     [Mx_k, Ix_k, D_k]) is ROW-INDEPENDENT; it is solved in O(log K)
     depth with lax.associative_scan over (A, b) pairs in the log
     semiring — the Plan7 analog of the 1D transfer-matrix scan.
  3. within-node cycles (I_k self-loop, node-0 insert, N/C/J flank
     loops) are exact via host-precomputed (I - loop)^-1 closures.

Generator state classes mirror the importer's split emission states
(machineboss_tpu/core/hmmer.py:194-351; emission on M_k -> Mx_k):
M, Mx, I, Ix, D per node plus S, N, Nx, B, E, C, Cx, J, Jx, T flanks and
the node-0 insert I0/Ix0 (global core mode). The transducer's (eps,eps)
closure is folded on the right of every transducer move.

Multihit re-entry (E -> J -> B within one output row) requires the second
profile pass to be absorbed silently by the transducer; it is resolved by
`n_hit` fixed-point iterations B <- B0 (+) exit*Jx(E(B)) of the row solve
(exact for single-hit mode, geometric convergence for multihit).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .semiring import LOGSUMEXP, MAXPLUS, NEG_INF, get_semiring


def _np_log(p):
    p = np.asarray(p, np.float64)
    with np.errstate(divide="ignore"):
        return np.where(p > 0, np.log(np.maximum(p, 1e-300)), NEG_INF)


def _np_log_matmul(a, b):
    amax = np.max(a, axis=-1, keepdims=True)
    bmax = np.max(b, axis=-2, keepdims=True)
    asafe = np.where(amax > NEG_INF / 2, amax, 0.0)
    bsafe = np.where(bmax > NEG_INF / 2, bmax, 0.0)
    prod = np.exp(a - asafe) @ np.exp(b - bsafe)
    return np.where(prod > 0, _np_log(prod) + asafe + bsafe, NEG_INF)


def _np_lse(stack, axis=0):
    m = np.max(stack, axis=axis, keepdims=True)
    safe = np.where(m > NEG_INF / 2, m, 0.0)
    s = np.sum(np.exp(stack - safe), axis=axis)
    return np.where(s > 0, _np_log(s) + np.squeeze(safe, axis), NEG_INF)


# ---- max-plus (Viterbi) host counterparts. The semiring swap mirrors the
# reference's semiring-parameterized fused Plan7 (same code path serves
# Forward via LOGSUMEXP and Viterbi via MAXPLUS,
# ref python/machineboss/jax/fused_plan7.py:20,636-645); the infinite-sum
# closures (I - P)^-1 become max-plus Kleene stars (the best path through
# a substochastic loop never repeats it, so the star converges).

def _np_mp_matmul(a, b):
    return np.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def _np_mp_max(stack, axis=0):
    return np.max(stack, axis=axis)


def _np_mp_star(m):
    """Kleene star of a square log-matrix in max-plus: max over any number
    of steps. Converges (to max over simple paths) iff every cycle has
    negative log-weight; repeated squaring of (I (+) A) doubles the
    admitted path length per iteration."""
    m = np.asarray(m, np.float64)
    if m.ndim == 3:
        return np.stack([_np_mp_star(m[k]) for k in range(m.shape[0])])
    n = m.shape[0]
    b = np.maximum(_np_log(np.eye(n)), m)
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 2):
        nb = _np_mp_matmul(b, b)
        if np.allclose(nb, b, atol=1e-12):
            return b
        b = nb
    nb = _np_mp_matmul(b, b)
    if not np.allclose(nb, b, atol=1e-9):
        raise ValueError("max-plus closure diverges (cycle with "
                         "log-weight >= 0)")
    return nb


def _bvecmat(v, m, sr=LOGSUMEXP):
    """(K, St) x (K, St, St) -> (K, St) batched semiring vec-mat."""
    return sr.matmul(v[:, None, :], m)[:, 0, :]


class Plan7Fused:
    """Fused profile-HMM (x) transducer Forward.

    hmm: core.hmmer.HmmerModel (parsed HMMER3 text)
    td_ev: EvaluatedMachine of the transducer; its input alphabet must
        cover the HMM's alphabet.
    mode: 'core' (hmm.machine(local), cited above at :194) or 'plan7'
        (hmm.plan7_machine at :287, with N/C/J flanks).
    """

    def __init__(self, hmm, td_ev, mode="plan7", local=True, multihit=False,
                 length=400.0, n_hit=3, solver="auto", semiring="logsumexp",
                 prob_space=None):
        self.hmm = hmm
        self.td_ev = td_ev
        self.mode = mode
        self.local = local if mode == "core" else True
        self.multihit = multihit
        self.n_hit = n_hit if (mode == "plan7" and multihit) else 1
        # semiring parameterization: LOGSUMEXP = Forward, MAXPLUS = Viterbi
        # (ref python/machineboss/jax/fused_plan7.py:636-645); the host-side
        # precomputation swaps semiring-matched matmul / reduce / closure
        self.sr = get_semiring(semiring)
        self.viterbi = self.sr is MAXPLUS
        # OPTIONAL execution semiring of the flat batch solver: for
        # Forward the row recurrence is linear, so it CAN run in
        # scaled-probability space (ops/semiring.ProbSemiring) with one
        # renormalization per token row. Measured on the v5e chip this
        # is 12% SLOWER than the log-space path (20.9k vs 23.6k
        # reads/s streamed): XLA already fuses the per-op max/exp/log
        # passes well, and the per-row full-state renorm plus the exp of
        # the per-read gathered emission stack cost more than the saved
        # transcendentals (PERF.md round 5 — kept as a documented
        # negative result and a semantics cross-check; tests run both).
        # Host setup (closures, multihit basis maps) always stays in log
        # space; Viterbi stays log (max has no prob-space form).
        if prob_space is None:
            prob_space = False
        self.prob_space = bool(prob_space) and not self.viterbi
        from .semiring import PROB
        self._xsr = PROB if self.prob_space else self.sr
        hmatmul = _np_mp_matmul if self.viterbi else _np_log_matmul
        self._hmatmul = hmatmul
        K = len(hmm.node)
        if K < 1:
            raise ValueError("empty HMM")
        self.K = K
        St = td_ev.n_states()
        self.St = St
        A = len(hmm.alph)

        # ---- transducer tensors: dense (n_in, n_out, St, St) log weights
        n_in = td_ev.input_tokenizer.n_tokens()
        n_out = td_ev.output_tokenizer.n_tokens()
        self.n_out = n_out
        dense = np.full((n_in, n_out, St, St), NEG_INF)
        for (i, o), (src, dst, _, lw) in td_ev.edges_by_token().items():
            for t in range(len(src)):
                w = lw[t] if np.isfinite(lw[t]) else NEG_INF
                # parallel degenerate transitions collapse by SUM in both
                # semirings (compose's TransAccumulator does the same
                # before the host Viterbi ever runs)
                dense[i, o, src[t], dst[t]] = np.logaddexp(
                    dense[i, o, src[t], dst[t]], w)

        def sum_star(log_mat):
            """(I - P)^-1 in probability space (any leading batch dim):
            the geometric silent-cycle fold compose() applies
            (advancing_machine) regardless of the DP semiring."""
            p = np.where(log_mat > NEG_INF / 2, np.exp(log_mat), 0.0)
            n = p.shape[-1]
            if p.ndim == 2:
                return _np_log(np.linalg.inv(np.eye(n) - p))
            return np.stack([_np_log(np.linalg.inv(np.eye(n) - p[k]))
                             for k in range(p.shape[0])])

        self._sum_star = sum_star
        # td silent-chain closure: compose keeps acyclic silent chains
        # discrete, so the fold uses the MODE semiring (max-plus Kleene
        # star for Viterbi); td silent cycles would be sum-folded by
        # compose, but EvaluatedMachine requires an advancing transducer,
        # so the star is finite either way
        t_closure = (_np_mp_star(dense[0, 0]) if self.viterbi
                     else sum_star(dense[0, 0]))

        toks = []
        for sym in hmm.alph:
            t = td_ev.input_tokenizer.sym2tok.get(sym)
            if t is None:
                raise ValueError("transducer lacks input symbol %r" % sym)
            toks.append(t)

        # one-step move tensors (td silent closure folded AFTER the
        # symbol collapse below). The composed-machine semantics this
        # must match for Viterbi parity: compose() SUMS degenerate
        # transitions (same src/dst/in/out — TransAccumulator,
        # core/machine.py compose), and the host ViterbiMatrix then
        # maxes over the collapsed graph; so the per-symbol paired moves
        # collapse by logaddexp in BOTH semirings, while the td silent
        # chain (kept discrete by compose) folds with the mode semiring.
        ta0_raw = dense[np.array(toks), 0]                     # (A, St, St)
        tay_raw = dense[np.array(toks)]                        # (A,n_out,..)
        ty0 = hmatmul(dense[0], t_closure)                     # (n_out,..)

        m_emit = np.array([[_np_log(n.match_emit[a]) for a in range(A)]
                           for n in hmm.node])                 # (K, A)
        i_emit = np.array([[_np_log(n.ins_emit[a]) for a in range(A)]
                           for n in hmm.node])
        null_emit = _np_log(np.array(hmm.null_emit))           # (A,)
        ins0_emit = _np_log(np.array(hmm.ins0_emit))

        def absorb(emit, closure=t_closure, mm=hmatmul):
            """(..., A) log dist -> (..., St, St) silent-absorb matrix:
            sum over the absorbed symbol (degenerate collapse), then the
            td silent closure folded with the given matmul."""
            raw = _np_lse(emit[..., :, None, None] + ta0_raw, axis=-3)
            return mm(raw, closure)

        em0 = absorb(m_emit)                                   # (K, St, St)
        ei0 = absorb(i_emit)
        enull0 = absorb(null_emit)
        eins00 = absorb(ins0_emit)

        sc = {n: _np_log(np.array([getattr(node, n) for node in hmm.node]))
              for n in ("m_to_m", "m_to_i", "m_to_d", "i_to_m", "i_to_i",
                        "d_to_m", "d_to_d")}

        def loop_closure(log_scalar, log_mat):
            """Closure of the scaled loop: geometric path-sum (I-sP)^-1
            for Forward, Kleene star (best number of traversals — zero,
            as loops cost) for Viterbi. NOTE an intentional semantic
            difference from Viterbi-on-the-composed-machine: compose()
            sum-folds silent cycles BEFORE the host Viterbi runs
            (advancing_machine), so the composed score can exceed the
            best-collapsed-path score by the folded cycle mass. The
            reference's own fused Viterbi has the same property (its
            MAXPLUS closure propagation, ref jax/fused_plan7.py:642-645,
            never reproduces the compose-time sums either, and its tests
            only assert Viterbi <= Forward). Tests here assert the exact
            sandwich vit_fused <= vit_composed <= fwd_fused plus exact
            f64 parity against algo/fused_align.py."""
            ls = np.maximum(np.asarray(log_scalar, np.float64), NEG_INF)
            if log_mat.ndim == 3:
                arg = ls[:, None, None] + log_mat
            else:
                arg = ls + log_mat
            return _np_mp_star(arg) if self.viterbi else sum_star(arg)

        ci = loop_closure(sc["i_to_i"], ei0)                   # (K, St, St)
        ci00 = loop_closure(_np_log(hmm.i0_to_i0), eins00)

        # local entry weights B -> M_k, k=1..K-1 (hmmer.py:201-206)
        if self.local:
            occ = hmm.calc_match_occupancy()
            z = sum(occ[k] * (K - k + 1) for k in range(1, K))
            entry = np.full(K, NEG_INF)
            for k in range(1, K):
                if z > 0:
                    entry[k - 1] = float(_np_log(occ[k] / z))
            self._entry_np = entry
        else:
            self._entry_np = None

        # ---- row-independent along-k transfer, carry [Mx, Ix, D]:
        #   M_k  = Mx_{k-1} mm_{k-1} (+) Ix_{k-1} im_{k-1}
        #          (+) D_{k-1} dm_{k-1} (+) u_k
        #   Mx_k = M_k @ EM0_k (+) base_Mx_k
        #   I_k  = (mi_k Mx_k (+) base_I_k (+) ii_k base_Ix_k) @ CI_k
        #   Ix_k = I_k @ EI0_k (+) base_Ix_k
        #   D_k  = Mx_{k-1} md_{k-1} (+) D_{k-1} dd_{k-1} (+) base_D_k
        # Local mode's node-K differences (no mm/md continuation) need no
        # masking: sources at k-1 = K-1 are never read by A_k, k <= K-1.
        eye_log = _np_log(np.eye(St))
        a_mat = np.full((K, 3 * St, 3 * St), NEG_INF)
        for k in range(1, K):
            em = em0[k]
            to_ix = hmatmul(
                hmatmul(sc["m_to_i"][k] + em, ci[k]), ei0[k])
            a_mat[k, 0:St, 0:St] = sc["m_to_m"][k - 1] + em
            a_mat[k, St:2 * St, 0:St] = sc["i_to_m"][k - 1] + em
            a_mat[k, 2 * St:, 0:St] = sc["d_to_m"][k - 1] + em
            a_mat[k, 0:St, St:2 * St] = sc["m_to_m"][k - 1] + to_ix
            a_mat[k, St:2 * St, St:2 * St] = sc["i_to_m"][k - 1] + to_ix
            a_mat[k, 2 * St:, St:2 * St] = sc["d_to_m"][k - 1] + to_ix
            a_mat[k, 0:St, 2 * St:] = sc["m_to_d"][k - 1] + eye_log
            a_mat[k, 2 * St:, 2 * St:] = sc["d_to_d"][k - 1] + eye_log

        # ---- prefix-product row solver ("prefix"): the along-k affine
        # recurrence carry_k = b_k (+) carry_{k-1} A_k has CONSTANT
        # matrices, so its full solution carry_k = (+)_{j<=k} b_j P_{j->k}
        # (P_{j->k} = A_{j+1}...A_k, P_{k->k} = I) is ONE dense semiring
        # matmul against a host-precomputed lower-block-triangular
        # (K*3St, K*3St) matrix — replacing the O(log K) ladder of tiny
        # (3St, 3St) matmuls (associative_scan) with a single MXU-shaped
        # product that batches perfectly over reads. "scan" keeps the
        # associative_scan (used when the prefix matrix would be too big).
        D3 = 3 * St
        if solver == "auto":
            solver = "prefix" if K * D3 <= 4096 else "scan"
        self._solver = solver
        if solver == "prefix":
            eye3 = _np_log(np.eye(D3))
            pref = np.full((K, K, D3, D3), NEG_INF)
            for k in range(K):
                pref[k, k] = eye3
            for k in range(1, K):
                for jj in range(k):
                    pref[jj, k] = hmatmul(pref[jj, k - 1], a_mat[k])
            t_tri = np.ascontiguousarray(
                pref.transpose(0, 2, 1, 3).reshape(K * D3, K * D3))
        else:
            t_tri = np.zeros((1, 1))

        # per-output-token paired-emission tensors, hoisted out of the row
        # scan: emy_all[y] = lse_a(m_emit[:,a] + T_{a,y}) depends only on
        # the row's output token, and n_out is small (DNA reads: 5), so
        # precomputing all of them removes a (K, A, St, St) broadcast
        # reduction from EVERY scan step
        tay_t = np.transpose(tay_raw, (1, 0, 2, 3))            # (n_out,A,..)
        emy_all = hmatmul(_np_lse(m_emit[None, :, :, None, None]
                                  + tay_t[:, None], axis=2),
                          t_closure)                           # (n_out,K,S,S)
        eiy_all = hmatmul(_np_lse(i_emit[None, :, :, None, None]
                                  + tay_t[:, None], axis=2), t_closure)
        enully_all = hmatmul(_np_lse(null_emit[None, :, None, None]
                                     + tay_t, axis=1), t_closure)
        eins0y_all = hmatmul(_np_lse(ins0_emit[None, :, None, None]
                                     + tay_t, axis=1), t_closure)

        f32 = jnp.float32
        self._j = j = {
            "emy_all": jnp.array(emy_all, f32),
            "eiy_all": jnp.array(eiy_all, f32),
            "enully_all": jnp.array(enully_all, f32),
            "eins0y_all": jnp.array(eins0y_all, f32),
            "ty0": jnp.array(ty0, f32),
            "em0": jnp.array(em0, f32), "ei0": jnp.array(ei0, f32),
            "enull0": jnp.array(enull0, f32),
            "eins00": jnp.array(eins00, f32),
            "ci": jnp.array(ci, f32), "ci00": jnp.array(ci00, f32),
            "a_mat": jnp.array(a_mat, f32),
            "t_tri": jnp.array(t_tri, f32),
            "m_emit": jnp.array(m_emit, f32),
            "i_emit": jnp.array(i_emit, f32),
            "null_emit": jnp.array(null_emit, f32),
            "ins0_emit": jnp.array(ins0_emit, f32),
            "t_closure": jnp.array(t_closure, f32),
        }
        for n, v in sc.items():
            j[n] = jnp.array(v, f32)
        j["entry"] = (jnp.array(self._entry_np, f32)
                      if self._entry_np is not None else None)
        self.b_to_m1 = float(_np_log(hmm.b_to_m1))
        self.b_to_i0 = float(_np_log(hmm.b_to_i0))
        self.b_to_d1 = float(_np_log(hmm.b_to_d1))
        self.i0_to_m1 = float(_np_log(hmm.i0_to_m1))
        self.i0_to_i0 = float(_np_log(hmm.i0_to_i0))
        self.log_loop = float(_np_log(length / (length + 1.0)))
        self.log_exit = float(_np_log(1.0 / (length + 1.0)))
        if mode == "plan7":
            j["cloop"] = jnp.array(
                loop_closure(self.log_loop, enull0), f32)
        self._fwd = jax.jit(self._forward_impl)

    # ------------------------------------------------------------------ DP

    def _bvecmat(self, v, m):
        """(K, St) x (K, St, St) -> (K, St) batched semiring vec-mat."""
        return self.sr.matmul(v[:, None, :], m)[:, 0, :]

    def _row_core(self, B_hot, cold, hot, ix0_hot):
        """Within-row sweep over nodes. `cold` values (arrived via a
        transducer-only output move) may feed paired emission-absorption
        moves but NOT generator-silent moves — the canonical interleaving
        orders commuting generator-silent moves BEFORE transducer-only
        moves, exactly as the reference's waiting-machine composition
        (ref src/machine.cpp:1053-1145) admits each interleaving class
        once. `hot` holds prev-row paired-emission arrivals (EMy/EIy)."""
        j = self._j
        K, St = self.K, self.St

        u_hot = jnp.full((K, St), self.sr.zero, jnp.float32)
        if self.local:
            u_hot = j["entry"][:, None] + B_hot[None, :]
        else:
            u0 = self.b_to_m1 + B_hot
            if ix0_hot is not None:
                u0 = self.sr.add(u0, self.i0_to_m1 + ix0_hot)
            u_hot = u_hot.at[0].set(u0)

        b_mx = self.sr.add(self._bvecmat(self.sr.add(u_hot, cold["M"]), j["em0"]),
                      hot["Mx"])
        cold_i_ei0 = self._bvecmat(cold["I"], j["ei0"])
        ix_aff_in = self.sr.add(cold_i_ei0, hot["Ix"])
        i_aff = self.sr.add(j["m_to_i"][:, None] + b_mx,
                       j["i_to_i"][:, None] + ix_aff_in)
        b_ix = self.sr.add(self._bvecmat(self._bvecmat(i_aff, j["ci"]), j["ei0"]),
                      ix_aff_in)
        b_d = jnp.full((K, St), self.sr.zero, jnp.float32)
        if not self.local:
            b_d = b_d.at[0].set(self.b_to_d1 + B_hot)
        b = jnp.concatenate([b_mx, b_ix, b_d], axis=-1)       # (K, 3St)

        if self._solver == "prefix":
            carry = self.sr.vecmat(b.reshape(K * 3 * St),
                              j["t_tri"]).reshape(K, 3 * St)
        else:
            def combine(left, right):
                a1, b1 = left
                a2, b2 = right
                return (self.sr.matmul(a1, a2),
                        self.sr.add(self.sr.matmul(b1[:, None, :], a2)[:, 0, :], b2))

            _, carry = jax.lax.associative_scan(combine, (j["a_mat"], b),
                                                axis=0)
        mx_hot = carry[:, 0:St]
        ix_hot = carry[:, St:2 * St]
        d_hot = carry[:, 2 * St:]

        prev = jnp.concatenate(
            [jnp.full((1, 3 * St), self.sr.zero, carry.dtype), carry[:-1]], 0)
        lin = self.sr.add(
            self.sr.add(jnp.roll(j["m_to_m"], 1)[:, None] + prev[:, 0:St],
                   jnp.roll(j["i_to_m"], 1)[:, None] + prev[:, St:2 * St]),
            jnp.roll(j["d_to_m"], 1)[:, None] + prev[:, 2 * St:])
        m_hot = self.sr.add(lin, u_hot)
        i_hot = self._bvecmat(
            self.sr.add(j["m_to_i"][:, None] + mx_hot,
                   j["i_to_i"][:, None] + ix_aff_in), j["ci"])
        return m_hot, mx_hot, i_hot, ix_hot, d_hot

    def _row_E(self, m_hot, mx_hot, i_hot, ix_hot, d_hot):
        """Exits to E are generator-silent: hot values only."""
        j = self._j
        K = self.K
        if self.local:
            e = self.sr.reduce(jnp.concatenate([m_hot, d_hot], 0), axis=0)
        else:
            e = self.sr.add(j["m_to_m"][K - 1] + mx_hot[K - 1],
                       j["d_to_m"][K - 1] + d_hot[K - 1])
        return self.sr.add(e, j["i_to_m"][K - 1] + ix_hot[K - 1])

    def _solve_row(self, cold, hot, first):
        """cold: per-class prev-row Ty0 arrivals; hot: per-class prev-row
        paired-emission arrivals; first: start vector at row 0 or None.
        Returns full (hot (+) cold) per-class values for the row."""
        j = self._j
        St = self.St
        zero_v = jnp.full((St,), self.sr.zero, jnp.float32)

        if self.mode == "plan7":
            nx_in = self.sr.add(hot["Nx"], self.sr.vecmat(cold["N"], j["enull0"]))
            if first is not None:
                nx_in = self.sr.add(nx_in, first)
            nx_hot = self.sr.vecmat_small(nx_in, j["cloop"])
            n_hot = self.log_loop + nx_hot
            B0_hot = self.log_exit + nx_hot
            ix0_hot = None
        else:
            nx_hot = n_hot = zero_v
            B0_hot = first if first is not None else zero_v
            if self.local:
                ix0_hot = None
            else:
                x = self.sr.add(
                    self.sr.vecmat(self.sr.add(self.b_to_i0 + B0_hot, cold["I0"]),
                              j["eins00"]), hot["Ix0"])
                ix0_hot = self.sr.vecmat_small(x, j["ci00"])

        B_hot = B0_hot
        e_hot = jx_hot = j_hot = zero_v
        m_hot = mx_hot = i_hot = ix_hot = d_hot = None
        for _ in range(self.n_hit):
            m_hot, mx_hot, i_hot, ix_hot, d_hot = self._row_core(
                B_hot, cold, hot, ix0_hot)
            e_hot = self._row_E(m_hot, mx_hot, i_hot, ix_hot, d_hot)
            if self.mode == "plan7" and self.multihit:
                jx_in = self.sr.add(
                    self.sr.add(hot["Jx"], self.sr.vecmat(cold["J"], j["enull0"])),
                    float(np.log(0.5)) + e_hot)
                jx_hot = self.sr.vecmat_small(jx_in, j["cloop"])
                j_hot = self.log_loop + jx_hot
                B_hot = self.sr.add(B0_hot, self.log_exit + jx_hot)
            else:
                break

        val_E = self.sr.add(e_hot, cold["E"])
        if self.mode == "plan7":
            e_to_c = float(np.log(0.5)) if self.multihit else 0.0
            cx_in = self.sr.add(
                self.sr.add(hot["Cx"], self.sr.vecmat(cold["C"], j["enull0"])),
                e_to_c + e_hot)
            cx_hot = self.sr.vecmat_small(cx_in, j["cloop"])
            c_hot = self.log_loop + cx_hot
            t_hot = self.log_exit + cx_hot
            val_T = self.sr.add(t_hot, cold["T"])
        else:
            cx_hot = c_hot = zero_v
            val_T = val_E
        if ix0_hot is not None:
            i0_hot = self.sr.add(self.b_to_i0 + B_hot, self.i0_to_i0 + ix0_hot)
            val_I0 = self.sr.add(i0_hot, cold["I0"])
            val_Ix0 = self.sr.add(ix0_hot, cold["Ix0"])
        else:
            val_I0 = val_Ix0 = zero_v
        return {"M": self.sr.add(m_hot, cold["M"]),
                "Mx": self.sr.add(mx_hot, cold["Mx"]),
                "I": self.sr.add(i_hot, cold["I"]),
                "Ix": self.sr.add(ix_hot, cold["Ix"]),
                "D": self.sr.add(d_hot, cold["D"]),
                "N": self.sr.add(n_hot, cold["N"]),
                "Nx": self.sr.add(nx_hot, cold["Nx"]),
                "B": self.sr.add(B_hot, cold["B"]),
                "E": val_E,
                "C": self.sr.add(c_hot, cold["C"]),
                "Cx": self.sr.add(cx_hot, cold["Cx"]),
                "J": self.sr.add(j_hot, cold["J"]),
                "Jx": self.sr.add(jx_hot, cold["Jx"]),
                "T": val_T, "I0": val_I0, "Ix0": val_Ix0}

    def _forward_impl(self, out_toks, out_len):
        """out_toks: (Lo,) output token ids (tokenizer space, >=1)."""
        j = self._j
        K, St = self.K, self.St
        zero_v = jnp.full((St,), self.sr.zero, jnp.float32)
        zero_kv = jnp.full((K, St), self.sr.zero, jnp.float32)
        start = zero_v.at[0].set(0.0)
        start = self.sr.vecmat(start, j["t_closure"])

        def zeros():
            cold = {n: zero_kv for n in ("M", "Mx", "I", "Ix", "D")}
            cold.update({n: zero_v for n in ("N", "Nx", "B", "E", "C", "Cx",
                                             "J", "Jx", "T", "I0", "Ix0")})
            hot = {"Mx": zero_kv, "Ix": zero_kv, "Nx": zero_v,
                   "Cx": zero_v, "Jx": zero_v, "Ix0": zero_v}
            return cold, hot

        cold0, hot0 = zeros()
        row0 = self._solve_row(cold0, hot0, start)

        def step(row, inp):
            y, pos = inp
            ty = j["ty0"][y]                                  # (St, St)
            emy = j["emy_all"][y]                             # (K, St, St)
            eiy = j["eiy_all"][y]
            enully = j["enully_all"][y]
            eins0y = j["eins0y_all"][y]

            def kmove(v, m):                                  # (K,St)@(St,St)
                return self.sr.matmul(v[:, None, :],
                                 jnp.broadcast_to(m, (v.shape[0],) + m.shape)
                                 )[:, 0, :]

            cold = {n: kmove(row[n], ty)
                    for n in ("M", "Mx", "I", "Ix", "D")}
            cold.update({n: self.sr.vecmat(row[n], ty)
                         for n in ("N", "Nx", "B", "E", "C", "Cx",
                                   "J", "Jx", "T", "I0", "Ix0")})
            hot = {"Mx": self._bvecmat(row["M"], emy),
                   "Ix": self._bvecmat(row["I"], eiy),
                   "Nx": self.sr.vecmat(row["N"], enully),
                   "Cx": self.sr.vecmat(row["C"], enully),
                   "Jx": self.sr.vecmat(row["J"], enully),
                   "Ix0": self.sr.vecmat(row["I0"], eins0y)}
            new_row = self._solve_row(cold, hot, None)
            keep = pos < out_len
            merged = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, a, b), new_row, row)
            return merged, None

        Lo = out_toks.shape[0]
        final, _ = jax.lax.scan(step, row0, (out_toks, jnp.arange(Lo)))
        return final["T"][St - 1]

    # --------------------------------------------- batch-major flat path

    def _init_flat(self):
        """One-time setup for the batch-major solver (see
        _forward_batch_impl). Builds the stacked per-token emission
        tensor, the flat block layout, and — for multihit — the exact
        B->outputs semiring maps that replace the n_hit fixed-point."""
        j = self._j
        K, St = self.K, self.St
        plan7 = self.mode == "plan7"
        # flat block layout: [M(K) Mx(K) I(K) Ix(K) D(K)] + flanks
        self._fb = fb = {
            "M": 0, "Mx": K, "I": 2 * K, "Ix": 3 * K, "D": 4 * K,
            "N": 5 * K + 0, "Nx": 5 * K + 1, "B": 5 * K + 2,
            "E": 5 * K + 3, "C": 5 * K + 4, "Cx": 5 * K + 5,
            "J": 5 * K + 6, "Jx": 5 * K + 7, "T": 5 * K + 8,
            "I0": 5 * K + 9, "Ix0": 5 * K + 10,
        }
        self._nb = 5 * K + 11
        # paired-emission stack: src rows [M(K) I(K) N C J I0] ->
        # dst rows [Mx(K) Ix(K) Nx Cx Jx Ix0]
        em = jnp.concatenate([
            j["emy_all"],                                   # (n_out,K,S,S)
            j["eiy_all"],
            j["enully_all"][:, None],                       # N
            j["enully_all"][:, None],                       # C
            j["enully_all"][:, None],                       # J
            j["eins0y_all"][:, None],                       # I0
        ], axis=1)                                          # (n_out,2K+4,..)
        self._em_stack = em
        self._em_src = np.concatenate([
            np.arange(K), 2 * K + np.arange(K),
            [fb["N"], fb["C"], fb["J"], fb["I0"]]]).astype(np.int32)
        self._hot_dst = np.concatenate([
            K + np.arange(K), 3 * K + np.arange(K),
            [fb["Nx"], fb["Cx"], fb["Jx"], fb["Ix0"]]]).astype(np.int32)

        if plan7 and self.multihit:
            # exact multihit: the within-row map B -> (class outputs) is
            # semiring-linear and row-independent, so one basis pass
            # through the legacy row core yields M_{B->cls}; the E->J->B
            # re-entry fixed point B = C (+) B (x) M_loop then solves
            # EXACTLY with a host (I - M_loop)^{-1} closure (the n_hit
            # iteration in _solve_row is a truncation of this series)
            zero_kv = jnp.full((K, St), self.sr.zero, jnp.float32)
            zero_v = jnp.full((St,), self.sr.zero, jnp.float32)
            cold0 = {n: zero_kv for n in ("M", "I")}
            hot0 = {"Mx": zero_kv, "Ix": zero_kv}

            def run(bh):
                m, mx, i, ix, d = self._row_core(bh, cold0, hot0, None)
                e = self._row_E(m, mx, i, ix, d)
                return m, mx, i, ix, d, e

            basis = jnp.where(jnp.eye(St, dtype=bool), 0.0, self.sr.zero
                              ).astype(jnp.float32)
            mb_m, mb_mx, mb_i, mb_ix, mb_d, mb_e = jax.jit(jax.vmap(run))(
                basis)
            # (St, K, St) -> (K, St, St) for batched right-multiplication
            self._mb = {
                "M": jnp.transpose(mb_m, (1, 0, 2)),
                "Mx": jnp.transpose(mb_mx, (1, 0, 2)),
                "I": jnp.transpose(mb_i, (1, 0, 2)),
                "Ix": jnp.transpose(mb_ix, (1, 0, 2)),
                "D": jnp.transpose(mb_d, (1, 0, 2)),
                "E": mb_e,                                   # (St, St)
            }
            e_np = np.array(mb_e, np.float64)
            cloop = np.array(j["cloop"], np.float64)
            m_loop = self._hmatmul(e_np, cloop) \
                + np.log(0.5) + self.log_exit
            # exact multihit re-entry closure in the MODE semiring (sum
            # of re-entry counts for Forward, best count for Viterbi)
            star = _np_mp_star if self.viterbi else self._sum_star
            self._mloop_star = jnp.array(
                star(np.maximum(m_loop, NEG_INF)), jnp.float32)

    def _row_core_batch(self, B_hot, cold_m, cold_i, hot_mx, hot_ix,
                        ix0_hot):
        """Batched _row_core: all tensors carry a leading batch dim.
        B_hot (B,St); cold_m/cold_i/hot_mx/hot_ix (B,K,St). Runs in the
        EXECUTION semiring (self._xsr): log ops for Viterbi, pure
        multiply/add in scaled-probability space for Forward (matrices
        and log constants exp'd by the semiring; constants fold at
        compile time)."""
        j = self._j
        sr = self._xsr
        K, St = self.K, self.St

        if self.local:
            u_hot = sr.cx(j["entry"][None, :, None], B_hot[:, None, :])
        else:
            u0 = sr.cx(self.b_to_m1, B_hot)
            if ix0_hot is not None:
                u0 = sr.add(u0, sr.cx(self.i0_to_m1, ix0_hot))
            u_hot = jnp.full((B_hot.shape[0], K, St), sr.zero,
                             jnp.float32).at[:, 0].set(u0)

        def kmat(v, m):                       # (B,K,St) x (K,St,St)
            # tiny St contraction: elementwise-expanded semiring matmul
            return sr.vecmat_small(v, m)

        b_mx = sr.add(kmat(sr.add(u_hot, cold_m), j["em0"]), hot_mx)
        cold_i_ei0 = kmat(cold_i, j["ei0"])
        ix_aff_in = sr.add(cold_i_ei0, hot_ix)
        i_aff = sr.add(sr.cx(j["m_to_i"][None, :, None], b_mx),
                       sr.cx(j["i_to_i"][None, :, None], ix_aff_in))
        b_ix = sr.add(kmat(kmat(i_aff, j["ci"]), j["ei0"]), ix_aff_in)
        b_d = jnp.full_like(b_mx, sr.zero)
        if not self.local:
            b_d = b_d.at[:, 0].set(sr.cx(self.b_to_d1, B_hot))
        b = jnp.concatenate([b_mx, b_ix, b_d], axis=-1)       # (B,K,3St)

        Bn = b.shape[0]
        carry = sr.vecmat(b.reshape(Bn, K * 3 * St),
                          j["t_tri"]).reshape(Bn, K, 3 * St)
        mx_hot = carry[:, :, 0:St]
        ix_hot = carry[:, :, St:2 * St]
        d_hot = carry[:, :, 2 * St:]

        prev = jnp.concatenate(
            [jnp.full((Bn, 1, 3 * St), sr.zero, carry.dtype),
             carry[:, :-1]], axis=1)
        lin = sr.add(
            sr.add(sr.cx(jnp.roll(j["m_to_m"], 1)[None, :, None],
                         prev[:, :, 0:St]),
                   sr.cx(jnp.roll(j["i_to_m"], 1)[None, :, None],
                         prev[:, :, St:2 * St])),
            sr.cx(jnp.roll(j["d_to_m"], 1)[None, :, None],
                  prev[:, :, 2 * St:]))
        m_hot = sr.add(lin, u_hot)
        i_hot = kmat(sr.add(sr.cx(j["m_to_i"][None, :, None], mx_hot),
                            sr.cx(j["i_to_i"][None, :, None], ix_aff_in)),
                     j["ci"])
        return m_hot, mx_hot, i_hot, ix_hot, d_hot, ix_aff_in

    def _row_E_batch(self, m_hot, mx_hot, i_hot, ix_hot, d_hot):
        j = self._j
        sr = self._xsr
        K = self.K
        if self.local:
            e = sr.reduce(jnp.concatenate([m_hot, d_hot], axis=1), axis=1)
        else:
            e = sr.add(sr.cx(j["m_to_m"][K - 1], mx_hot[:, K - 1]),
                       sr.cx(j["d_to_m"][K - 1], d_hot[:, K - 1]))
        return sr.add(e, sr.cx(j["i_to_m"][K - 1], ix_hot[:, K - 1]))

    def _solve_row_batch(self, cold, hot, first, Bn):
        """Batched _solve_row over the flat (B, NB, St) layout.
        cold (B,NB,St); hot (B,2K+4,St) aligned with _hot_dst; first is
        the (St,) start vector at row 0 or None."""
        j = self._j
        sr = self._xsr
        K, St = self.K, self.St
        fb = self._fb
        zero_bv = jnp.full((Bn, St), sr.zero, jnp.float32)
        plan7 = self.mode == "plan7"

        cold_m = cold[:, 0:K]
        cold_i = cold[:, 2 * K:3 * K]
        hot_mx = hot[:, 0:K]
        hot_ix = hot[:, K:2 * K]
        hot_nx = hot[:, 2 * K]
        hot_cx = hot[:, 2 * K + 1]
        hot_jx = hot[:, 2 * K + 2]
        hot_ix0 = hot[:, 2 * K + 3]

        if plan7:
            nx_in = sr.add(hot_nx,
                           sr.vecmat_small(cold[:, fb["N"]], j["enull0"]))
            if first is not None:
                nx_in = sr.add(nx_in, jnp.broadcast_to(first, (Bn, St)))
            nx_hot = sr.vecmat_small(nx_in, j["cloop"])
            n_hot = sr.cx(self.log_loop, nx_hot)
            B0_hot = sr.cx(self.log_exit, nx_hot)
            ix0_hot = None
        else:
            nx_hot = n_hot = zero_bv
            B0_hot = (jnp.broadcast_to(first, (Bn, St))
                      if first is not None else zero_bv)
            if self.local:
                ix0_hot = None
            else:
                x = sr.add(
                    sr.vecmat_small(sr.add(sr.cx(self.b_to_i0, B0_hot),
                                           cold[:, fb["I0"]]), j["eins00"]),
                    hot_ix0)
                ix0_hot = sr.vecmat_small(x, j["ci00"])

        if plan7 and self.multihit:
            # base pass with no B mass, then exact re-entry closure
            neg_b = jnp.full((Bn, St), sr.zero, jnp.float32)
            m0, mx0, i0_, ix0_, d0, _ = self._row_core_batch(
                neg_b, cold_m, cold_i, hot_mx, hot_ix, None)
            e_base = self._row_E_batch(m0, mx0, i0_, ix0_, d0)
            jx_base = sr.add(
                sr.add(hot_jx, sr.vecmat_small(cold[:, fb["J"]], j["enull0"])),
                sr.cx(float(np.log(0.5)), e_base))
            c_in = sr.add(B0_hot,
                          sr.cx(self.log_exit,
                                sr.vecmat_small(jx_base, j["cloop"])))
            B_hot = sr.vecmat_small(c_in, self._mloop_star)
            # outputs = base (+) B (x) M_{B->cls}
            mb = self._mb

            def badd(base_kv, key):
                return sr.add(base_kv,
                              sr.vecmat_small(B_hot[:, None, :], mb[key]))

            m_hot = badd(m0, "M")
            mx_hot = badd(mx0, "Mx")
            i_hot = badd(i0_, "I")
            ix_hot = badd(ix0_, "Ix")
            d_hot = badd(d0, "D")
            e_hot = sr.add(e_base, sr.vecmat_small(B_hot, mb["E"]))
            jx_in = sr.add(jx_base,
                           sr.cx(float(np.log(0.5)),
                                 sr.vecmat_small(B_hot, mb["E"])))
            jx_hot = sr.vecmat_small(jx_in, j["cloop"])
            j_hot = sr.cx(self.log_loop, jx_hot)
        else:
            B_hot = B0_hot
            m_hot, mx_hot, i_hot, ix_hot, d_hot, _ = self._row_core_batch(
                B_hot, cold_m, cold_i, hot_mx, hot_ix, ix0_hot)
            e_hot = self._row_E_batch(m_hot, mx_hot, i_hot, ix_hot, d_hot)
            jx_hot = j_hot = zero_bv

        if plan7:
            e_to_c = float(np.log(0.5)) if self.multihit else 0.0
            cx_in = sr.add(
                sr.add(hot_cx, sr.vecmat_small(cold[:, fb["C"]], j["enull0"])),
                sr.cx(e_to_c, e_hot))
            cx_hot = sr.vecmat_small(cx_in, j["cloop"])
            c_hot = sr.cx(self.log_loop, cx_hot)
            t_hot = sr.cx(self.log_exit, cx_hot)
        else:
            cx_hot = c_hot = zero_bv
            t_hot = e_hot
        if ix0_hot is not None:
            i0_hot = sr.add(sr.cx(self.b_to_i0, B_hot),
                            sr.cx(self.i0_to_i0, ix0_hot))
            ix0_v = ix0_hot
        else:
            i0_hot = ix0_v = zero_bv

        flanks = jnp.stack([n_hot, nx_hot, B_hot, e_hot, c_hot, cx_hot,
                            j_hot, jx_hot, t_hot, i0_hot, ix0_v], axis=1)
        x_hot = jnp.concatenate(
            [m_hot, mx_hot, i_hot, ix_hot, d_hot, flanks], axis=1)
        return sr.add(x_hot, cold)                           # (B,NB,St)

    def _forward_batch_impl(self, toks, lens):
        """Batch-major fused Forward: toks (B, Lo) output token ids,
        lens (B,). One flat (B, NB, St) row state; per step the shared
        output-only move is ONE batched semiring matmul over all blocks
        and the paired emissions ONE gathered batched matmul — versus
        ~20 per-class ops in the vmapped path. Returns (B,) log-likes."""
        j = self._j
        sr = self._xsr
        K, St = self.K, self.St
        nb = self._nb
        fb = self._fb
        Bn = toks.shape[0]
        prob = self.prob_space
        neg = jnp.full((Bn, nb, St), sr.zero, jnp.float32)
        neg_hot = jnp.full((Bn, 2 * K + 4, St), sr.zero, jnp.float32)

        start = jnp.full((St,), sr.zero, jnp.float32).at[0].set(sr.one)
        start = sr.vecmat(start, j["t_closure"])
        x0 = self._solve_row_batch(neg, neg_hot, start, Bn)
        scale0 = jnp.zeros((Bn,), jnp.float32)
        if prob:
            x0, scale0 = self._renorm(x0, scale0)

        em_src = jnp.array(self._em_src)
        hot_dst = jnp.array(self._hot_dst)

        def step(carry, inp):
            x, scale = carry
            y, pos = inp
            cold = sr.vecmat_small(x, j["ty0"][y][:, None])  # (B,NB,St)
            src = jnp.take(x, em_src, axis=1)                # (B,2K+4,St)
            emg = self._em_stack[y]                          # (B,2K+4,S,S)
            hot = sr.vecmat_small(src, emg)
            # cold arrivals at the hot destinations stay in `cold`; the
            # solver reads them separately (canonical interleaving)
            x_new = self._solve_row_batch(cold, hot, None, Bn)
            scale_new = scale
            if prob:
                # ONE renormalization per token row keeps the f32
                # probability carry near unit scale (values > ~87 nats
                # below the per-read max flush to zero — far below the
                # 0.01-nat contract); the log here is (B,) scalars, not
                # a state-tensor pass
                x_new, scale_new = self._renorm(x_new, scale)
            keep = (pos < lens)[:, None, None]
            x_out = jnp.where(keep, x_new, x)
            scale_out = jnp.where(keep[:, 0, 0], scale_new, scale)
            return (x_out, scale_out), None

        (final, scale), _ = jax.lax.scan(
            step, (x0, scale0),
            (jnp.transpose(toks), jnp.arange(toks.shape[1])))
        row = fb["T"] if self.mode == "plan7" else fb["E"]
        v = final[:, row, St - 1]
        if prob:
            return jnp.where(v > 0.0,
                             jnp.log(jnp.maximum(v, 1e-38)) + scale,
                             NEG_INF)
        return v

    @staticmethod
    def _renorm(x, scale):
        """Per-read rescale of the probability carry (prob_space mode)."""
        m = jnp.max(x, axis=(1, 2))                          # (B,)
        ok = m > 0.0
        inv = jnp.where(ok, 1.0 / jnp.maximum(m, 1e-38), 0.0)
        x = x * inv[:, None, None]
        scale = jnp.where(ok, scale + jnp.log(jnp.maximum(m, 1e-38)),
                          NEG_INF)
        return x, scale

    # ------------------------------------------------------------- public

    def forward(self, out_syms):
        toks = jnp.array(
            [self.td_ev.output_tokenizer.sym2tok[c] for c in out_syms],
            jnp.int32)
        return float(self._fwd(toks, jnp.int32(len(out_syms))))

    def forward_batch(self, seqs, pad_multiple=16, impl="auto"):
        """Score many output sequences in one device call. Sequences are
        right-padded to a shared geometric bucket; padding is masked by
        per-sequence lengths. Returns a numpy (B,) array.

        impl: 'flat' = batch-major solver (default with the prefix row
        solver; fewer, larger XLA ops per scan step and an EXACT multihit
        closure), 'vmap' = the per-read implementation vmapped."""
        from .fwdback import pad_bucket
        if impl == "auto":
            impl = "flat" if self._solver == "prefix" else "vmap"
        B = len(seqs)
        Lo = pad_bucket(max((len(s) for s in seqs), default=1),
                        base=pad_multiple)
        toks = np.ones((B, Lo), np.int32)
        lens = np.zeros((B,), np.int32)
        s2t = self.td_ev.output_tokenizer.sym2tok
        for n, s in enumerate(seqs):
            toks[n, :len(s)] = [s2t[c] for c in s]
            lens[n] = len(s)
        return self.forward_batch_tokens(toks, lens, impl=impl)

    def forward_stream(self, batches, impl="auto"):
        """Score a STREAM of (toks, lens) batches with pipelined
        dispatch: every device call is enqueued before any result is
        pulled back, so the fixed per-invocation overhead (~24 ms on
        the 2026-08 axon runtime, PERF.md) overlaps with device compute
        instead of serializing with it — the steady-state serving shape
        (the reference's WebGPU batch pipeline keeps multiple dispatches
        in flight the same way, ref js/webgpu/gpu/fused-plan7-batch.mjs).
        Returns [np.ndarray per batch]."""
        import jax.numpy as jnp
        if impl == "auto":
            if self._pallas_supported() and                     jax.default_backend() not in ("cpu",):
                impl = "pallas"
            else:
                impl = "flat" if self._solver == "prefix" else "vmap"
        if impl == "pallas":
            ks = {}
            # persists across calls: steady-state serving re-streams the
            # same token arrays every tick. Entries hold (host_array,
            # device_array): retaining the host array keeps its id alive,
            # so the id key can never be recycled onto a DIFFERENT
            # array's address (a freed-and-reallocated numpy array would
            # otherwise silently serve stale device tokens). Bounded to
            # 64 entries (FIFO) so the pinned device copies cannot grow
            # without limit.
            dev = self.__dict__.setdefault("_dev_cache", {})
            pending = []

            def as_dev(a):
                # repeated batches (steady-state serving re-scores the
                # same device-resident token arrays) must not re-upload:
                # the synchronous host->device copy per enqueue was
                # 4x the kernel itself on the fn3 bench (measured)
                key = id(a)
                hit = dev.get(key)
                if hit is not None and hit[0] is a:
                    return hit[1]
                if len(dev) >= 64:
                    dev.pop(next(iter(dev)))
                d = jnp.asarray(a)
                dev[key] = (a, d)
                return d

            interp = jax.default_backend() in ("cpu",)
            for t, ln in batches:
                t_np = np.asarray(t)
                key = t_np.shape
                if key not in ks:
                    ks[key] = self._pallas_fwd(t_np.shape[0],
                                               t_np.shape[1],
                                               interpret=interp)
                k = ks[key]
                pending.append((k, k.device_call(as_dev(t), as_dev(ln)),
                                np.asarray(ln).shape[0]))
            # ONE batched device_get: pulling each (8, B) result
            # separately pays a full host round trip per batch (~2.5 ms
            # on this runtime — 8 pulls cost 3x the kernel; measured)
            host = jax.device_get([d for (_k, d, _b) in pending])
            return [k.decode(np.asarray(o), B_)
                    for (k, _d, B_), o in zip(pending, host)]
        if impl == "flat":
            if not hasattr(self, "_fb"):
                self._init_flat()
            if not hasattr(self, "_fwd_flat"):
                self._fwd_flat = jax.jit(self._forward_batch_impl)
            fn = self._fwd_flat
        else:
            if not hasattr(self, "_fwd_batch"):
                self._fwd_batch = jax.jit(jax.vmap(self._forward_impl))
            fn = self._fwd_batch
        pending = [fn(jnp.asarray(t), jnp.asarray(ln))
                   for t, ln in batches]      # async dispatch, no sync
        return [np.asarray(p) for p in jax.device_get(pending)]

    def _pallas_supported(self):
        """The VMEM-resident Pallas row-solve kernel covers the serving
        configuration (ops/pallas/fused_plan7_kernel.py)."""
        return (self.mode == "plan7" and self.local and not self.viterbi
                and not self.prob_space and self.St <= 4)

    def _pallas_fwd(self, B, L, interpret=False):
        from .pallas.fused_plan7_kernel import make_fused_plan7_pallas
        cache = self.__dict__.setdefault("_pallas_cache", {})
        key = (B, L, interpret)
        if key not in cache:
            cache[key] = make_fused_plan7_pallas(self, B, L,
                                                 interpret=interpret)
        return cache[key]

    def forward_batch_tokens(self, toks, lens, impl="auto"):
        """Device call on pre-tokenized reads: toks (B, Lo) 1-based
        output token ids (padded), lens (B,) real lengths. Use this when
        scoring the same reads repeatedly — forward_batch's host-side
        tokenization costs more than the device call at large B.

        impl='pallas' (auto on TPU backends for the supported serving
        config) runs the VMEM-resident Pallas kernel — 155k reads/s vs
        29k for the XLA flat solver on the fn3 bench (PERF.md round 5);
        interpret mode serves it off-TPU for tests."""
        import jax as _jax
        if impl == "auto":
            if self._pallas_supported() and                     _jax.default_backend() not in ("cpu",):
                impl = "pallas"
            else:
                impl = "flat" if self._solver == "prefix" else "vmap"
        if impl == "pallas":
            toks = np.asarray(toks)
            k = self._pallas_fwd(
                toks.shape[0], toks.shape[1],
                interpret=_jax.default_backend() in ("cpu",))
            return k(toks, np.asarray(lens))
        if impl == "flat":
            if not hasattr(self, "_fb"):
                self._init_flat()
            if not hasattr(self, "_fwd_flat"):
                self._fwd_flat = jax.jit(self._forward_batch_impl)
            return np.array(self._fwd_flat(jnp.asarray(toks),
                                           jnp.asarray(lens)))
        if not hasattr(self, "_fwd_batch"):
            self._fwd_batch = jax.jit(jax.vmap(self._forward_impl))
        return np.array(self._fwd_batch(jnp.asarray(toks),
                                        jnp.asarray(lens)))
