"""Batched OFDM demodulation (JAX): symbol framing, FFT, carrier extraction.

The reference processes one symbol at a time through FFTW
(/root/reference/src/DVB_T2/dvbt2_demodulator.cpp:243-268); here a whole
T2 frame (or batch of frames) of symbols is FFT'd as one batched XLA FFT,
and the guard-interval correlation CFO discriminator is computed for all
symbols at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params.modes import T2Mode
from ..params import p1 as p1_mod
from . import fft as fft_ops


def frame_to_symbols(frame_iq: jnp.ndarray, mode: T2Mode) -> jnp.ndarray:
    """IQ of one frame (incl. P1) -> [L_F, symbol_size] symbol blocks."""
    body = frame_iq[p1_mod.P1_LEN:p1_mod.P1_LEN
                    + mode.frame_symbols * mode.symbol_size]
    return body.reshape(mode.frame_symbols, mode.symbol_size)


def gi_cfo_estimate(symbols: jnp.ndarray, mode: T2Mode) -> jnp.ndarray:
    """Fine CFO discriminator per symbol, in radians/sample.

    Correlates the guard interval against the symbol tail over the window
    [4, GI-4) like the reference (dvbt2_demodulator.cpp:252-260):
    freq_est = angle(sum cp[i] * conj(sym_tail[i])) / (2 * fft_size).
    """
    g = mode.guard_size
    cp = symbols[:, 4:g - 4]
    tail = symbols[:, mode.fft_size + 4:mode.fft_size + g - 4]
    s = jnp.sum(cp * jnp.conj(tail), axis=1)
    return jnp.arctan2(s.imag, s.real) / (2 * mode.fft_size)


def symbols_to_carriers(symbols: jnp.ndarray, mode: T2Mode) -> jnp.ndarray:
    """[L, symbol_size] -> [L, k_total] active carriers (fft + shift + crop)."""
    x = symbols[:, mode.guard_size:]
    spec = fft_ops.fft(x)
    spec = spec * (jnp.sqrt(mode.k_total).astype(jnp.float32) / mode.fft_size)
    half = mode.fft_size // 2
    shifted = jnp.concatenate([spec[:, half:], spec[:, :half]], axis=1)
    return shifted[:, mode.left_nulls:mode.left_nulls + mode.k_total]


def demod_frame(frame_iq: jnp.ndarray, mode: T2Mode):
    """Frame IQ -> ([L, k_total] carriers, [L] gi-CFO estimates)."""
    symbols = frame_to_symbols(frame_iq, mode)
    return symbols_to_carriers(symbols, mode), gi_cfo_estimate(symbols, mode)
