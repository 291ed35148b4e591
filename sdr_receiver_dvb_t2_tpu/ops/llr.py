"""Soft demapper for the FEC chain (JAX).

demap_cells_multi turns already time/cell-deinterleaved cells (the
composed gather lives in ops/rx_chain) into int8-scaled LLRs in STREAM
order — bit deinterleaving into LDPC codeword order happens afterwards in
rx_chain.packed_to_llr_t via the precomputed bit_rows map:

1. cyclic Q-delay removal (roll of the imaginary part within FEC blocks),
2. constellation derotation,
3. SNR estimate from hard-decision error power -> adaptive LLR scale
   ("precision"), exactly like the reference
   (/root/reference/src/DVB_T2/llr_demapper.cpp:178-192,241-281),
4. per-bit LLRs via the iterated |x|-fold (llr_demapper.cpp:296-352 uses
   the same geometry in AVX2).

DemapPlan also builds the TI/cell-deinterleave and bit-deinterleave index
tables that rx_chain composes into its gathers.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import bit_interleaver, time_interleaver
from ..params.modes import PlpConfig, Constellation
from .cplx import C


class DemapPlan:
    def __init__(self, plp: PlpConfig, n_fec: int, n_ti: int):
        self.plp = plp
        self.n_fec = n_fec
        n_cells = plp.cells_per_fec_block
        self.n_cells = n_cells
        per_ti, extra = divmod(n_fec, n_ti)
        gathers, base = [], 0
        for j in range(n_ti):
            f = per_ti + (1 if j >= n_ti - extra else 0)
            plan = time_interleaver.ti_block_plan(n_cells, f)
            gathers.append(base + plan["rx_gather"])
            base += f * n_cells
        self.ti_gather = np.asarray(np.concatenate(gathers, axis=0))  # [n_fec, n_cells]
        self.bit_gather = np.asarray(bit_interleaver.rx_gather(
            plp.constellation, plp.fec_frame, plp.code_rate))
        self.derot_re = np.float32(np.cos(plp.rotation_angle))
        self.derot_im = np.float32(-np.sin(plp.rotation_angle))
        self.eta = plp.bits_per_cell
        self.norm = plp.norm_factor
        self.levels_max = (1 << (self.eta // 2)) - 1


@functools.lru_cache(maxsize=8)
def get_plan(plp: PlpConfig, n_fec: int, n_ti: int) -> DemapPlan:
    return DemapPlan(plp, n_fec, n_ti)


def _axis_llrs(v, per_axis, norm, precision):
    """LLRs of the bits carried by one axis value v [..,]: list of arrays."""
    out = []
    x = v
    t = (1 << (per_axis - 1)) * norm
    for _ in range(per_axis):
        out.append(jnp.round(x * precision))
        x = jnp.abs(x) - t
        t = t / 2
    return out


def demap_cells_planes(cells: C, n_frames: int, plan: DemapPlan,
                       csi=None):
    """Multi-frame demap to per-bit planes: cells [W, n_cells] ->
    (planes list of eta int8 [W, n_cells] arrays in stream-stack order
    [i0, q0, i1, q1, ...], snr_db [F]).

    W = n_frames * n_fec codeword rows; SNR/precision computed per frame
    over its row block (matching the reference's per-frame adaptation).

    ``csi`` (optional, [W, n_cells], mean-normalized |h|^2 per cell):
    per-cell LLR reliability for frequency-selective (SFN) channels.  A
    ZF-equalized cell at a deep channel null carries amplified noise; a
    per-frame scalar precision would hand the decoder equally-confident
    garbage there, which breaks LDPC convergence on near-0 dB echoes
    (the reference shares this failure — llr_demapper.cpp adapts one
    scale per superframe).  The rotated-constellation Q delay means a
    cell's I and Q ride DIFFERENT carriers; after derotation each axis
    sees the variance mix c^2/csi_I + s^2/csi_Q, so each axis gets the
    reciprocal of that mix as its weight (the max-log separable
    approximation of the 2-D rotated demap).
    """
    w, n_cells = cells.shape
    # undo cyclic Q delay (within each codeword = along the cell axis)
    cells = C(cells.re, jnp.roll(cells.im, -1, axis=1))
    cells = cells * C(plan.derot_re, plan.derot_im)

    per_axis = plan.eta // 2
    step = 2 * plan.norm
    lim = plan.levels_max * plan.norm
    if csi is not None:
        c2 = float(plan.derot_re) ** 2
        v_i = 1.0 / jnp.maximum(csi.astype(jnp.float32), 1e-5)
        v_q = jnp.roll(v_i, -1, axis=1)      # same roll as the Q delay
        csi_x = 1.0 / (c2 * v_i + (1.0 - c2) * v_q)
        csi_y = 1.0 / ((1.0 - c2) * v_i + c2 * v_q)
    else:
        csi_x = csi_y = None
    # SNR / precision from a 1/8 stride sample of the cells: the estimate
    # averages over >1M cells per frame either way (sampling error well
    # under 0.01 dB), and the hard-decision error math is ~half the
    # demap's elementwise op budget
    sub = C(cells.re.reshape(w, -1)[:, ::8], cells.im.reshape(w, -1)[:, ::8])
    hard_i = jnp.clip(jnp.round((sub.re - plan.norm) / step) * step
                      + plan.norm, -lim, lim)
    hard_q = jnp.clip(jnp.round((sub.im - plan.norm) / step) * step
                      + plan.norm, -lim, lim)
    err_i = (sub.re - hard_i) ** 2
    err_q = (sub.im - hard_q) ** 2
    if csi is not None:
        # reliability-weighted error: E[err * csi] = sigma^2 / mean|h|^2,
        # so the adapted precision recovers the flat-channel scale and
        # precision * csi_cell is the proper per-cell matched scale
        err_i = err_i * csi_x[:, ::8]
        err_q = err_q * csi_y[:, ::8]
    err = err_i + err_q
    sig = hard_i ** 2 + hard_q ** 2
    sum_s = jnp.sum(sig.reshape(n_frames, -1), axis=1)
    sum_e = jnp.maximum(jnp.sum(err.reshape(n_frames, -1), axis=1), 1e-12)
    snr_db = 10.0 * jnp.log10(sum_s / sum_e)
    precision = jnp.clip(8.0 * plan.norm * sum_s / sum_e, 0.0, 512.0)
    prec_row = jnp.repeat(precision, w // n_frames)[:, None]    # [W, 1]

    i_llrs = _axis_llrs(cells.re, per_axis, plan.norm,
                        prec_row if csi is None else prec_row * csi_x)
    q_llrs = _axis_llrs(cells.im, per_axis, plan.norm,
                        prec_row if csi is None else prec_row * csi_y)
    bits = []
    for a, b in zip(i_llrs, q_llrs):
        # clip+int8 per plane BEFORE stacking: the stacked stream then
        # materializes 105 MB instead of 420 MB per 8-frame batch
        bits.append(jnp.clip(a, -127, 127).astype(jnp.int8))
        bits.append(jnp.clip(b, -127, 127).astype(jnp.int8))
    return bits, snr_db


def demap_cells_multi(cells: C, n_frames: int, plan: DemapPlan):
    """Multi-frame demap: cells [W, n_cells] -> (stream [W, N], snr [F])."""
    w, n_cells = cells.shape
    bits, snr_db = demap_cells_planes(cells, n_frames, plan)
    stream = jnp.stack(bits, axis=-1).reshape(w, n_cells * plan.eta)
    return stream, snr_db
