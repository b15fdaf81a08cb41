"""Length-sharded 1D DP: the context-parallel axis for WFST scans.

The 1D transfer-matrix formulation is associative, so a sequence can be
sharded along L across chips (SURVEY §2.5): each chip reduces its local
block of (S,S) transfer matrices to a single product, the per-chip products
are combined across the 'len' mesh axis (all_gather + exclusive prefix in
log-depth; the gathered tensor is n_chips * S * S, tiny next to the local
work), and each chip then resolves its local prefix against its incoming
carry. One round-trip over ICI per forward pass.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.semiring import LOGSUMEXP


def _local_product(mats, sr):
    """Reduce (Lk, S, S) to a single product by log-depth pairwise matmuls."""
    def reduce_pairs(m):
        n = m.shape[0]
        if n == 1:
            return m[0]
        half = n // 2
        paired = sr.matmul(m[0:2 * half:2], m[1:2 * half:2])
        if n % 2:
            paired = jnp.concatenate([paired, m[-1:]], axis=0)
        return reduce_pairs(paired)
    return reduce_pairs(mats)


def length_sharded_forward_fn(mesh, sr=LOGSUMEXP, axis="len"):
    """Build fn(trans, closure, toks, length) -> final state vector, with
    toks sharded along `axis` of the mesh. trans/closure replicated."""

    n_shards = mesh.shape[axis]

    def shard_fn(trans, closure, toks, length):
        # toks: local (L/n,) block; global position offset from axis index
        idx = jax.lax.axis_index(axis)
        S = trans.shape[-1]
        eye = jnp.where(jnp.eye(S, dtype=bool), sr.one, sr.zero) \
                 .astype(trans.dtype)
        local_l = toks.shape[0]
        pos = idx * local_l + jnp.arange(local_l)
        mats = jnp.where((pos < length)[:, None, None], trans[toks],
                         eye[None])
        local_prod = _local_product(mats, sr)                 # (S, S)
        # gather all shard products (n*S*S floats over ICI) and finish the
        # global product redundantly on every chip -- cheaper than a second
        # collective for the tiny (S,S) carries
        all_prods = jax.lax.all_gather(local_prod, axis)      # (n, S, S)
        tail = _local_product(all_prods, sr)                  # global product
        f0 = jnp.full((S,), sr.zero, trans.dtype).at[0].set(sr.one)
        f0 = sr.vecmat(f0, closure)
        final = sr.vecmat(f0, tail)
        return final

    mapped = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(), P(), P(axis), P()),
                       out_specs=P(), check_vma=False)
    return jax.jit(mapped)


# ------------------------------------------------------------- 2D lattice

def diag_sharded_wavefront_fn(mesh, sr=LOGSUMEXP, axis="len"):
    """Length-shard a SINGLE 2D lattice across chips: each chip owns a
    contiguous band of cell indices i along every anti-diagonal (SURVEY
    §2.5's stated 2D deliverable — pairwise alignments too long for one
    chip). Per diagonal step each chip computes its band and ppermutes
    ONE boundary cell (B, 1, S) to its right neighbor over ICI; the
    d-2 boundary needed by the diagonal move is last step's received
    d-1 boundary, so the exchange stays one hop per step.

    Returns fn(a_diag, a_left, a_up, closure, in_toks (B, Li), out_toks
    (B, Lo), in_lens, out_lens) -> (B,) log-likelihoods, all inputs
    replicated (the sharding is over the lattice, not the batch)."""
    n = mesh.shape[axis]

    def shard_fn(a_diag, a_left, a_up, closure, in_toks, out_toks,
                 in_lens, out_lens):
        from ..ops.wavefront import _apply_all_tokens, _select_tokens
        idx = jax.lax.axis_index(axis)
        Ti, To, S, _ = a_diag.shape
        B, Li = in_toks.shape
        Lo = out_toks.shape[1]
        dtype = closure.dtype
        W = Li + 1
        Wl = -(-W // n)
        start = idx * Wl
        diag_mats = a_diag.reshape(Ti * To, S, S)

        x_tok_g = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), in_toks.astype(jnp.int32)],
            axis=1)
        x_tok_g = jnp.pad(x_tok_g, ((0, 0), (0, n * Wl - W)))
        x_tok = jax.lax.dynamic_slice_in_dim(x_tok_g, start, Wl, 1)

        i_local = jnp.arange(Wl)
        i_glob = start + i_local                            # (Wl,)
        b_idx = jnp.arange(B)
        il = in_lens.astype(jnp.int32)
        d_final = (in_lens + out_lens).astype(jnp.int32)
        owns = (il >= start) & (il < start + Wl)            # (B,)
        il_loc = jnp.clip(il - start, 0, Wl - 1)

        e0 = jnp.full((S,), sr.zero, dtype).at[0].set(sr.one)
        d0 = jnp.full((B, Wl, S), sr.zero, dtype)
        d0 = jnp.where((i_glob == 0)[None, :, None],
                       sr.vecmat(e0, closure)[None, None, :], d0)

        perm = [(i, i + 1) for i in range(n - 1)]

        def exchange(last_cell):
            # right-shift the boundary cell along the mesh axis; chip 0
            # has no left neighbor (ppermute zero-fills, which is NOT the
            # semiring zero, so mask explicitly)
            recv = jax.lax.ppermute(last_cell, axis, perm)
            return jnp.where(idx == 0, sr.zero, recv)

        def step(carry, d):
            prev1, prev2, recv_prev, res = carry
            recv_cur = exchange(prev1[:, -1:])              # (B, 1, S)
            o_idx = d - i_glob
            o_safe = jnp.clip(o_idx - 1, 0, Lo - 1)
            y_tok = out_toks[:, o_safe].astype(jnp.int32)

            left_src = jnp.concatenate([recv_cur, prev1[:, :-1]], axis=1)
            left = _select_tokens(
                _apply_all_tokens(left_src, a_left, sr), x_tok)
            up = _select_tokens(
                _apply_all_tokens(prev1, a_up, sr), y_tok)
            diag_src = jnp.concatenate([recv_prev, prev2[:, :-1]], axis=1)
            dg = _select_tokens(
                _apply_all_tokens(diag_src, diag_mats, sr),
                x_tok * To + y_tok)

            u = sr.add(sr.add(left, up), dg)
            cur = sr.vecmat(u.reshape(B * Wl, S),
                            closure).reshape(B, Wl, S)
            valid = (o_idx >= 0) & (o_idx <= Lo) & (i_glob <= Li)
            cur = jnp.where(valid[None, :, None], cur, sr.zero)
            res = jnp.where((d == d_final) & owns,
                            cur[b_idx, il_loc, S - 1], res)
            return (cur, prev1, recv_cur, res), None

        res0 = jnp.where((d_final == 0) & owns, d0[b_idx, il_loc, S - 1],
                         jnp.full((B,), sr.zero, dtype))
        ds = jnp.arange(1, Li + Lo + 1)
        (_, _, _, res), _ = jax.lax.scan(
            step, (d0, jnp.full_like(d0, sr.zero),
                   jnp.full((B, 1, S), sr.zero, dtype), res0), ds)
        return jax.lax.pmax(res, axis)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(mapped)
