"""Fused frame-batch receive chain: OFDM demod -> equalize -> demap -> LLR.

TPU-optimized v2 of the per-frame pipeline.  Two structural changes versus
the textbook formulation (and the reference's serial loops):

1. **Channel interpolation as a matmul.**  Linear interpolation between
   pilots is a linear operator; for each distinct pilot layout (P2 symbol,
   the dy scattered-pilot phases, FC symbol) the pilot->carrier
   interpolation matrix W [p_max, K] is precomputed with the interpolation
   fractions folded in, and the per-symbol channel estimate becomes one
   MXU matmul h_d = h_p @ W per layout group — replacing four large
   take_along_axis gathers (which dominate on TPU) and the angle-domain
   trig (atan2/cos/sin) with complex-domain interpolation.
2. **One composed gather.**  Frequency deinterleave, the L1/PLP slice and
   the time+cell deinterleave are all static permutations; their
   composition maps each FEC-block cell directly to a carrier of the
   equalized [L, K] plane.  One gather instead of three, operating once
   per cell instead of once per intermediate stream.

The remaining per-cell work (cyclic-Q-delay roll, derotation, SNR/precision
estimate, |x|-fold LLRs, bit deinterleave) reuses ops/llr.py machinery.

Reference call path being replaced: data_symbol.cpp:98-318 (equalize+freq
deint) -> time_deinterleaver.cpp:299-317 -> llr_demapper.cpp:296-352.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import freq_interleaver, pilots
from ..params.modes import T2Mode, PlpConfig
from . import cplx, ofdm
from . import equalizer as eq_mod
from . import llr as llr_mod
from .cplx import C


class ChainPlan:
    """All device constants for frames -> LLR, one T2Mode + PLP config."""

    def __init__(self, mode: T2Mode, plp: PlpConfig, n_fec: int, n_ti: int,
                 l1_cells: int):
        self.mode = mode
        self.plp = plp
        self.n_fec = n_fec
        self.l1_cells = l1_cells
        L, K = mode.frame_symbols, mode.k_total
        self.eq_plan = eq_mod.get_plan(mode)       # pilot gather tables, diag
        self.demap = llr_mod.get_plan(plp, n_fec, n_ti)

        # ---- group symbols by pilot layout; build interp weight matmuls ----
        ep = self.eq_plan
        groups: dict[bytes, list[int]] = {}
        for l in range(L):
            key = ep.pilot_idx[l].tobytes()
            groups.setdefault(key, []).append(l)
        self.group_syms = [np.array(v, np.int32) for v in groups.values()]
        order = np.concatenate(self.group_syms)
        inv = np.empty(L, np.int64)
        inv[order] = np.arange(L)
        self.regroup = inv                          # undo group concat order

        # Banded interpolation weights: carrier k interpolates between
        # pilot ordinals lo(k) and lo(k)+1, and lo is monotone in k — so a
        # segment of SEG consecutive carriers touches only a narrow window
        # of pilot ordinals.  Storing [n_seg, WIN, SEG] instead of the dense
        # [p_max, K] cuts the weight bytes ~400x (the dense matmul was
        # HBM-read-bound on the weights).
        SEG = 256
        self.seg = SEG
        self.n_seg = -(-K // SEG)
        win = 0
        lo_frac = []
        for syms in self.group_syms:
            l = int(syms[0])
            n_pil = int(ep.n_pilots[l])
            pidx = np.asarray(ep.pilot_idx[l][:n_pil]).astype(np.int64)
            k = np.arange(K)
            lo = np.clip(np.searchsorted(pidx, k) - 1, 0, n_pil - 2)
            span = np.maximum(pidx[lo + 1] - pidx[lo], 1)
            frac = (k - pidx[lo]) / span
            lo_frac.append((lo, frac))
            for s in range(self.n_seg):
                seg_lo = lo[s * SEG:(s + 1) * SEG]
                win = max(win, int(seg_lo.max() - seg_lo.min()) + 2)
        self.win = win = -(-win // 8) * 8
        self.weights = []          # (o_idx [n_seg] i32, Wband [n_seg,WIN,SEG])
        for (lo, frac) in lo_frac:
            o_idx = np.zeros(self.n_seg, np.int32)
            wband = np.zeros((self.n_seg, win, SEG), np.float32)
            for s in range(self.n_seg):
                k0 = s * SEG
                k1 = min(k0 + SEG, K)
                seg_lo = lo[k0:k1]
                o = int(seg_lo.min())
                o_idx[s] = o
                cols = np.arange(k1 - k0)
                wband[s, seg_lo - o, cols] = 1.0 - frac[k0:k1]
                wband[s, seg_lo - o + 1, cols] = frac[k0:k1]
            self.weights.append((o_idx, wband))

        # pilot reference: h_p = pil * sign / amp (padded entries zeroed by W)
        self.pil_sign = np.asarray(ep.ref_vals)          # [L, p_max] +-1
        self.pil_inv_amp = np.asarray(1.0 / ep.amp_vals)

        # ---- composed cell gather: FEC cell -> flat [L*K] position ----------
        pay2carrier = []
        for l in range(L):
            didx = pilots.data_cell_indices(mode, l)
            n_cells = len(didx)
            take = n_cells
            if mode.has_fc and l == L - 1:
                take = mode.c_fc
            h = freq_interleaver.tx_permutation(mode, n_cells, l)
            pay2carrier.append(l * K + didx[h[:take]])
        pay2carrier = np.concatenate(pay2carrier)
        assert len(pay2carrier) == mode.frame_cells, (
            len(pay2carrier), mode.frame_cells)
        stream = pay2carrier[l1_cells:l1_cells
                             + n_fec * plp.cells_per_fec_block]
        self.cell_idx = np.asarray(stream[self.demap.ti_gather]
                                   .astype(np.int32))    # [n_fec, n_cells]

        # bit deinterleave + LDPC-kernel row order folded into ONE static
        # row gather on the transposed LLR stream
        from .ldpc_pallas import kernel_bit_order
        self.bit_rows = np.asarray(
            self.demap.bit_gather[kernel_bit_order(plp.ldpc_table_name)]
            .astype(np.int32))                           # [fec_size]


    def device_consts(self):
        """Big tensors as a pytree to pass as jit ARGUMENTS.

        They must not be closed over: closure constants are embedded in the
        compile request (the interpolation weights alone are ~0.5 GB, which
        overflows the remote-compile body limit and bloats every program).
        """
        import jax as _jax
        # CPU XLA lacks batched bf16 dot thunks; bf16 weights are TPU-only
        wdt = (jnp.bfloat16 if _jax.default_backend() != "cpu"
               else jnp.float32)
        return dict(
            w=tuple((_jax.device_put(jnp.asarray(o)),
                     _jax.device_put(jnp.asarray(wb).astype(wdt)))
                    for o, wb in self.weights),
            cell_idx=_jax.device_put(jnp.asarray(self.cell_idx)),
            bit_rows=_jax.device_put(jnp.asarray(self.bit_rows)),
        )


@functools.lru_cache(maxsize=8)
def get_plan(mode: T2Mode, plp: PlpConfig, n_fec: int, n_ti: int,
             l1_cells: int) -> ChainPlan:
    return ChainPlan(mode, plp, n_fec, n_ti, l1_cells)


def equalize_plane(carriers: C, plan: ChainPlan, w_consts):
    """[L, K] carriers -> ([L, K] equalized plane, diag dict)."""
    ep = plan.eq_plan
    pil = cplx.take_along_axis(carriers, ep.pilot_idx, axis=1)   # [L, P]
    h_p = pil * (plan.pil_sign * plan.pil_inv_amp)

    # grouped banded-interpolation matmuls (bf16 on the MXU): per segment
    # of 256 carriers, gather the pilot window and multiply by the banded
    # weight block
    K = plan.mode.k_total
    outs_re, outs_im = [], []
    for syms, (o_idx, wband) in zip(plan.group_syms, w_consts):
        idx = o_idx[:, None] + jnp.arange(plan.win, dtype=jnp.int32)[None]
        hr = h_p.re[syms][:, idx].astype(wband.dtype)    # [Lg, S, WIN]
        hi = h_p.im[syms][:, idx].astype(wband.dtype)
        er = jnp.einsum("lsw,swc->lsc", hr, wband,
                        preferred_element_type=jnp.float32)
        ei = jnp.einsum("lsw,swc->lsc", hi, wband,
                        preferred_element_type=jnp.float32)
        outs_re.append(er.reshape(er.shape[0], -1)[:, :K])
        outs_im.append(ei.reshape(ei.shape[0], -1)[:, :K])
    h_d = C(jnp.concatenate(outs_re)[plan.regroup],
            jnp.concatenate(outs_im)[plan.regroup])               # [L, K]

    denom = jnp.maximum(h_d.abs2(), 1e-9)
    eq = carriers * h_d.conj() * (1.0 / denom)

    # ---- diagnostics (the reference's tracking discriminators; masks
    # precomputed in equalizer.EqualizerPlan) ----
    est = pil * ep.ref_vals
    vmask = ep.pilot_valid
    fh = jnp.logical_and(vmask, ep.pilot_first_half)
    sh = jnp.logical_and(vmask, jnp.logical_not(ep.pilot_first_half))
    sum1 = cplx.sum(cplx.where(fh, est, 0.0), axis=1)
    sum2 = cplx.sum(cplx.where(sh, est, 0.0), axis=1)
    phase_offset = sum1.angle() + sum2.angle()

    sro_pil = cplx.take(carriers, ep.sro_idx, axis=1) * ep.sro_ref
    drift = (sro_pil.im[1:] * sro_pil.re[:-1]
             - sro_pil.re[1:] * sro_pil.im[:-1])
    d1 = jnp.sum(jnp.where(ep.sro_first_half[None], drift, 0), axis=1)
    d2 = jnp.sum(jnp.where(ep.sro_first_half[None], 0, drift), axis=1)
    pwr = jnp.mean(sro_pil.abs2(), axis=1)
    sro = jnp.concatenate([jnp.zeros((1,)), (d2 - d1)
                           / jnp.maximum(pwr[1:] * sro_pil.shape[1], 1e-9)])
    return eq, dict(phase_offset=phase_offset, sro=sro)


def demap_planes_t(eq: C, plan: ChainPlan, consts):
    """Equalized [F, L, K] planes -> (llr_T [N, F*n_fec] f32, snr_db [F]).

    The deinterleave gather moves both IQ components in ONE u32 gather by
    packing them as bf16 halves (gathers are index-bound on TPU; halving
    the element count halves the time; bf16 cells are 40 dB+ above the
    demapper's int8 LLR quantization).  The gather and demap run row-major
    (codeword rows — XLA's gather is much faster in the deinterleave's
    natural output order); the bit deinterleave folds the LDPC kernel's
    bit-row order in, and ONE cheap 2-D transpose at the end hands the
    decoder its codewords-on-lanes layout.
    """
    f = eq.shape[0]
    u16r = jax.lax.bitcast_convert_type(
        eq.re.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    u16i = jax.lax.bitcast_convert_type(
        eq.im.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = (u16r << 16) | u16i                       # [F, L, K]

    # per-frame gather (XLA gather cost grows with SOURCE size — keep the
    # source at one frame's plane, vmap over frames); the index set is a
    # permutation, so unique_indices + PROMISE_IN_BOUNDS skip the clamp
    # and dedup machinery (~1.7x faster on TPU)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
    flat_idx = consts["cell_idx"].reshape(-1, 1)

    def one_plane(p):
        return jax.lax.gather(
            p.reshape(-1), flat_idx, dn, (1,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            unique_indices=True)

    g = jax.vmap(one_plane)(packed)
    g = g.reshape(-1, consts["cell_idx"].shape[1])     # [F*n_fec, n_cells]
    cells = C(
        jax.lax.bitcast_convert_type((g >> 16).astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32),
        jax.lax.bitcast_convert_type((g & 0xFFFF).astype(jnp.uint16),
                                     jnp.bfloat16).astype(jnp.float32))
    stream, snr = llr_mod.demap_cells_multi(cells, f, plan.demap)
    llr = stream[:, consts["bit_rows"]]        # [W, N] kernel bit order
    return llr.T, snr


def frames_to_llr_t(frames_iq: C, plan: ChainPlan, consts):
    """[F, frame_samples] -> (llr_T [N, F*n_fec], diag pytree).

    ``consts`` = plan.device_consts(), passed through jit as arguments.
    llr_T rows are in LDPC-kernel bit order; columns are codewords.
    """
    def demod_eq(frame):
        carriers, gi_cfo = ofdm.demod_frame(frame, plan.mode)
        eq, diag = equalize_plane(carriers, plan, consts["w"])
        diag["gi_cfo"] = gi_cfo
        return eq, diag

    eq, diag = jax.vmap(demod_eq)(frames_iq)
    llr_t, snr = demap_planes_t(eq, plan, consts)
    diag["snr_db"] = snr
    return llr_t, diag
