"""Batched OFDM demodulation (JAX): symbol framing, FFT, carrier extraction.

The reference processes one symbol at a time through FFTW
(/root/reference/src/DVB_T2/dvbt2_demodulator.cpp:243-268); here a whole
T2 frame (or batch of frames) of symbols is FFT'd as one batched matmul
FFT (ops/fft.py), and the guard-interval correlation CFO discriminator is
computed for all symbols at once.  All IQ is real-pair (ops/cplx.C).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..params.modes import T2Mode
from ..params import p1 as p1_mod
from . import fft as fft_ops
from . import cplx
from .cplx import C


def frame_to_symbols(frame_iq: C, mode: T2Mode) -> C:
    """IQ of one frame (incl. P1) -> [L_F, symbol_size] symbol blocks."""
    body = frame_iq[p1_mod.P1_LEN:p1_mod.P1_LEN
                    + mode.frame_symbols * mode.symbol_size]
    return body.reshape(mode.frame_symbols, mode.symbol_size)


def gi_cfo_estimate(symbols: C, mode: T2Mode) -> jnp.ndarray:
    """Fine CFO discriminator per symbol, in radians/sample.

    Correlates the symbol tail against the guard-interval head over the
    window [4, GI-4) like the reference (dvbt2_demodulator.cpp:252-260):
    freq_est = angle(sum tail[i] * conj(head[i])) / (2 * fft_size) — with
    residual CFO e rad/sample the product's phase is +e*fft_size, so the
    estimate's SIGN matches the offset (head*conj(tail) would invert it
    and turn the tracking loop into positive feedback).
    """
    g = mode.guard_size
    head = symbols[:, 4:g - 4]
    tail = symbols[:, mode.fft_size + 4:mode.fft_size + g - 4]
    s = cplx.sum(tail * head.conj(), axis=1)
    return s.angle() / (2 * mode.fft_size)


def symbols_to_carriers(symbols: C, mode: T2Mode) -> C:
    """[L, symbol_size] -> [L, k_total] active carriers (fft + shift + crop)."""
    x = symbols[:, mode.guard_size:]
    scale = float(np.sqrt(mode.k_total) / mode.fft_size)
    spec = fft_ops.fft(x, scale=scale)
    # fftshift + crop in one concat of only the two NEEDED slices
    # (k_total > fft_size/2, so the active window always wraps once)
    half = mode.fft_size // 2
    lo = mode.left_nulls
    hi = lo + mode.k_total - half          # columns taken from spec[:, :hi]
    return cplx.concatenate([spec[:, half + lo:], spec[:, :hi]], axis=1)


def demod_frame(frame_iq: C, mode: T2Mode):
    """Frame IQ -> ([L, k_total] carriers, [L] gi-CFO estimates)."""
    symbols = frame_to_symbols(frame_iq, mode)
    return symbols_to_carriers(symbols, mode), gi_cfo_estimate(symbols, mode)
