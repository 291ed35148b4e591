"""Batched LDPC offset-min-sum decoder (JAX/XLA, TPU-first layout).

Flooding belief propagation over the DVB-T2 quasi-cyclic IRA codes, batched
over many codewords (the reference decodes 32 codewords in AVX2 lanes,
/root/reference/src/DVB_T2/ldpc_decoder.cpp:226-241; here the batch is a
leading tensor dimension).

TPU-first structure: permuting parity space by the standard's own parity
interleaver turns every Tanner edge into a *static cyclic shift within a
360-lane block* (see params/ldpc.py).  The decoder therefore never performs
an arbitrary gather — which lowers to scalar DMAs on TPU — but only static
`jnp.roll`s over the trailing 360-lane axis, reshapes and transposes, which
XLA vectorizes on the VPU.  Messages live as [B, q, CNL+2, 360]:
data-edge slots, the parity self slot and the staircase-neighbour slot.

Message algebra follows the reference's offset-min-sum with beta = 1
(LDPC/algorithms.hh:250-291): magnitudes saturate at 0 after the offset, the
second-minimum trick picks the extrinsic min, stored messages clamp to
[-32, 31].  float32 compute (exact for int8-scaled LLR inputs).

LLR convention: positive LLR = bit 0 (matches the reference demapper).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ldpc

_BIG = 1e9
M = 360


class QCPlan:
    """Static edge lists of one code, grouped for the roll-based decoder.

    edges_by_row[i]  = list of (group g, shift s, var-slot d) for check row i
    edges_by_group[g] = list of (row i, slot c, shift s) for bit group g
    """

    def __init__(self, table_name: str):
        code = ldpc.get_code(table_name)
        t = code.table
        self.name = table_name
        self.n, self.k, self.r, self.q = code.n, code.k, code.r, code.q
        self.g_data = self.k // M
        self.cnl = t.links_max_cn - 2
        rows = [[] for _ in range(self.q)]
        groups = [[] for _ in range(self.g_data)]
        for g, bases in enumerate(t.groups):
            for p in bases:
                i, s = int(p % self.q), int(p // self.q)
                slot = len(rows[i])
                rows[i].append((g, s, len(groups[g])))
                groups[g].append((i, slot, s))
        assert max(len(x) for x in rows) <= self.cnl
        self.edges_by_row = rows
        self.edges_by_group = groups


@functools.lru_cache(maxsize=None)
def get_plan(table_name: str) -> QCPlan:
    return QCPlan(table_name)


def _check_update(stacked, mask, c2v, beta):
    """stacked, c2v: [B, q, C, 360]; returns new c2v."""
    v2c = stacked - c2v
    mag = jnp.maximum(jnp.abs(v2c) - beta, 0.0)
    mag = jnp.where(mask, mag, _BIG)
    neg = jnp.logical_and(mask, v2c < 0)
    m1 = jnp.min(mag, axis=2, keepdims=True)
    is_min = mag == m1
    first_min = jnp.cumsum(is_min.astype(jnp.int8), axis=2) == 1
    only_first = jnp.logical_and(is_min, first_min)
    m2 = jnp.min(jnp.where(only_first, _BIG, mag), axis=2, keepdims=True)
    total = (neg.astype(jnp.int8).sum(2, keepdims=True) % 2).astype(bool)
    out_neg = jnp.logical_xor(total, neg)
    out_mag = jnp.where(only_first, m2, m1)
    out = jnp.where(out_neg, -out_mag, out_mag)
    return jnp.clip(jnp.where(mask, out, 0.0), -32.0, 31.0)


def make_decoder(table_name: str, max_iters: int = 15, beta: float = 1.0):
    """Returns decode(llr[B, N]) -> (hard_bits[B, N] int8, ok[B] bool,
    iters[B] int32 per-codeword first-clean iteration)."""
    plan = get_plan(table_name)
    k, r, q, cnl, g_data = plan.k, plan.r, plan.q, plan.cnl, plan.g_data
    c_total = cnl + 2

    # static numpy mask [q, CNL]
    mask_np = np.zeros((q, cnl), dtype=bool)
    for i, es in enumerate(plan.edges_by_row):
        mask_np[i, :len(es)] = True

    def align(lam_data, lam_par):
        """lam_data [B, G, 360], lam_par [B, R] -> checks [B, q, C, 360]."""
        b = lam_data.shape[0]
        row_stacks = []
        for i, es in enumerate(plan.edges_by_row):
            slabs = [jnp.roll(lam_data[:, g, :], s, axis=-1) for g, s, _ in es]
            while len(slabs) < cnl:
                slabs.append(jnp.full((b, M), _BIG, lam_data.dtype))
            row_stacks.append(jnp.stack(slabs, axis=1))       # [B, CNL, 360]
        data_part = jnp.stack(row_stacks, axis=1)             # [B, q, CNL, 360]
        p_perm = lam_par.reshape(b, M, q).transpose(0, 2, 1)  # [B, q, 360]
        prev_flat = jnp.concatenate(
            [jnp.full((b, 1), _BIG, lam_par.dtype), lam_par[:, :-1]], axis=1)
        p_prev = prev_flat.reshape(b, M, q).transpose(0, 2, 1)
        return jnp.concatenate(
            [data_part, p_perm[:, :, None, :], p_prev[:, :, None, :]], axis=2)

    full_mask = np.concatenate(
        [mask_np, np.ones((q, 2), bool)], axis=1)
    # prev-parity slot invalid only for check (row 0, lane 0) = natural check 0
    mask_j = np.broadcast_to(full_mask[None, :, :, None], (1, q, c_total, M)).copy()
    mask_j[0, 0, cnl + 1, 0] = False
    _mask = mask_j

    def back(c2v, ch_data, ch_par):
        """c2v [B, q, C, 360] -> lam_data [B, G, 360], lam_par [B, R]."""
        b = c2v.shape[0]
        lam_groups = []
        for g in range(g_data):
            acc = ch_data[:, g, :]
            for i, slot, s in plan.edges_by_group[g]:
                acc = acc + jnp.roll(c2v[:, i, slot, :], -s, axis=-1)
            lam_groups.append(acc)
        lam_data = jnp.stack(lam_groups, axis=1)
        self_nat = c2v[:, :, cnl, :].transpose(0, 2, 1).reshape(b, r)
        prev_nat = c2v[:, :, cnl + 1, :].transpose(0, 2, 1).reshape(b, r)
        nxt = jnp.concatenate([prev_nat[:, 1:], jnp.zeros_like(prev_nat[:, :1])],
                              axis=1)
        lam_par = ch_par + self_nat + nxt
        return lam_data, lam_par

    def syndrome_ok(stacked):
        """[B, q, C, 360] aligned LLRs -> [B] all-checks-satisfied."""
        neg = jnp.logical_and(_mask, stacked < 0)
        odd = (neg.astype(jnp.int8).sum(2) % 2).astype(bool)  # [B, q, 360]
        return jnp.logical_not(jnp.any(odd, axis=(1, 2)))

    @jax.jit
    def decode(llr):
        # clamp the channel intrinsics below the weakest bit's total
        # extrinsic correction capacity (degree-2 staircase parity: 2*31):
        # a saturated WRONG bit would otherwise be permanently stuck, since
        # lam = ch + sum(clamped messages) can never cross zero.  Same
        # clamp as the Pallas kernel (ops/ldpc_pallas.py).
        llr = jnp.clip(llr.astype(jnp.float32), -56.0, 56.0)
        b = llr.shape[0]
        ch_data = llr[:, :k].reshape(b, g_data, M)
        ch_par = llr[:, k:]
        c2v0 = jnp.zeros((b, q, c_total, M), jnp.float32)
        stacked0 = align(ch_data, ch_par)
        ok0 = syndrome_ok(stacked0)

        def cond(state):
            it, done = state[-3], state[-1]
            return jnp.logical_and(it < max_iters, jnp.logical_not(done))

        def body(state):
            c2v, stacked, lam_data, lam_par, it, first, _ = state
            c2v = _check_update(stacked, _mask, c2v, beta)
            lam_data, lam_par = back(c2v, ch_data, ch_par)
            stacked = align(lam_data, lam_par)
            okv = syndrome_ok(stacked)
            first = jnp.where(jnp.logical_and(first < 0, okv), it + 1, first)
            return (c2v, stacked, lam_data, lam_par, it + 1, first,
                    jnp.all(okv))

        first0 = jnp.where(ok0, 0, -1)
        state = (c2v0, stacked0, ch_data, ch_par, 0, first0, jnp.all(ok0))
        _, stacked, lam_data, lam_par, _, first, _ = jax.lax.while_loop(
            cond, body, state)
        ok = syndrome_ok(stacked)
        iters = jnp.where(ok, jnp.maximum(first, 0), max_iters)
        hard = jnp.concatenate(
            [(lam_data < 0).reshape(b, k), lam_par < 0], axis=1)
        return hard.astype(jnp.int8), ok, iters.astype(jnp.int32)

    return decode


def make_decoder_t(table_name: str, max_iters: int = 15, beta: float = 1.0):
    """Transposed-interface adapter around :func:`make_decoder`.

    Same contract as ops/ldpc_pallas.make_pallas_decoder: input
    llr_T [N, W] in LDPC-kernel bit-row order, output
    (hard_T [k, W] int8, ok [W] bool, iters).  Used on CPU and as the
    cross-platform reference; the relayout is cheap off-TPU.
    """
    from . import ldpc_pallas
    dec = make_decoder(table_name, max_iters=max_iters, beta=beta)
    plan = get_plan(table_name)
    inv = np.argsort(ldpc_pallas.kernel_bit_order(table_name))

    def decode_t(llr_t):
        llr_nat = llr_t[inv].T                    # [W, N] natural order
        hard, ok, iters = dec(llr_nat)
        return hard[:, :plan.k].T, ok, iters

    return decode_t
