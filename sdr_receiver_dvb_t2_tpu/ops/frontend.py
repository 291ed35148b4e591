"""Streaming front-end DSP (JAX): IQ conditioning, NCO, resampler, FIR.

The reference front-end is sample-serial with per-sample IIR feedback
(/root/reference/src/DVB_T2/dvbt2_demodulator.h:59-155 ``convert_iq``,
dvbt2_demodulator.cpp:151-192 NCO + Farrow + FIR chain).  Here every stage
is a *block* operator with explicit carried state, so a whole ingest block
(hundreds of thousands of samples) runs as one fused XLA program:

  raw ints -> real-pair float32 -> DC / IQ-imbalance correction (estimates
  from block N-1 applied to block N) -> NCO derotation (closed-form phase
  ramp, no recurrence) -> cubic Farrow fractional resampler (closed-form
  output positions -> a single gather, no phase-accumulator loop) ->
  polyphase anti-alias FIR decimator (XLA convolution, stride 2).

All IQ on device is real-pair (ops/cplx.C) — this TPU runtime has no
complex dtypes, and split planes are the faster layout regardless.  All
outputs have static shapes: the resampler produces a fixed ``n_out`` per
block and the host carries the fractional phase between blocks
(SURVEY.md section 7 "hard parts": variable-rate resampling vs XLA).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import cplx
from .cplx import C


# ---------------------------------------------------------------------------
# raw sample conversion (reference: convert_iq<T>, dvbt2_demodulator.h:68-115)
# ---------------------------------------------------------------------------

def raw_to_iq(block: jnp.ndarray, fmt: str) -> C:
    """Interleaved raw IQ -> real-pair float32, roughly unit scale.

    fmt: 'u8' (offset-binary bytes), 's8', 's16', 'f32'.
    """
    if fmt == "u8":
        x = block.astype(jnp.float32) - 127.5
        scale = 1.0 / 128.0
    elif fmt == "s8":
        x = block.astype(jnp.float32)
        scale = 1.0 / 128.0
    elif fmt == "s16":
        x = block.astype(jnp.float32)
        scale = 1.0 / 32768.0
    elif fmt == "f32":
        x = block.astype(jnp.float32)
        scale = 1.0
    else:
        raise ValueError(f"unknown IQ format {fmt!r}")
    x = x.reshape(-1, 2) * scale
    return C(x[:, 0], x[:, 1])


@dataclasses.dataclass
class IqCondState:
    """Carried conditioning state (all python floats; updated per block)."""
    dc_re: float = 0.0
    dc_im: float = 0.0
    c1: float = 0.0          # quadrature leakage I->Q
    c2: float = 1.0          # Q amplitude correction
    level: float = 0.0       # mean |I| + |Q| (AGC observable)


def iq_condition(x: C, c1: jnp.ndarray, c2: jnp.ndarray):
    """Apply DC + IQ-imbalance correction; measure fresh estimates.

    DC is removed *two-pass within the block* (the block's own mean — over
    ~1e6 samples its estimation noise is ~sigma/1000, while even 1%
    residual DC would rival the center carrier's amplitude since the spur
    concentrates into one FFT bin).  The IQ-imbalance correction applies
    the previous-block estimates (block-recurrent replacement for the
    reference's per-sample exponential loops, dvbt2_demodulator.h:89-153).
    Returns (y, stats): this block's raw measurements for the host to
    smooth into the next state: (dc_re, dc_im, theta1, theta2, theta3,
    level); the smoothed DC is a telemetry observable only.
    """
    dc_mean_re = jnp.mean(x.re)
    dc_mean_im = jnp.mean(x.im)
    i = x.re - dc_mean_re
    q = x.im - dc_mean_im
    q = (q - c1 * i) / c2
    # Moseley & Slump blind IQ-imbalance estimators (the reference uses the
    # 1-bit-quantized variant, dvbt2_demodulator.h:89-98)
    sgn_i = jnp.sign(i)
    theta1 = jnp.mean(sgn_i * q)
    theta2 = jnp.mean(sgn_i * i)
    theta3 = jnp.mean(jnp.sign(q) * q)
    level = jnp.mean(jnp.abs(i) + jnp.abs(q))
    return C(i, q), (dc_mean_re, dc_mean_im, theta1, theta2, theta3, level)


def fold_iq_stats(state: IqCondState, stats, alpha: float = 0.05
                  ) -> IqCondState:
    """Host-side exponential smoothing of per-block measurements.

    The theta estimators are measured on the *corrected* output, so they are
    residuals; the new absolute correction composes them with the currently
    applied one: Q'' = ((Q - c1 I)/c2 - r1 I)/r2 = (Q - (c1 + c2 r1) I)/(c2 r2).
    """
    dc_re, dc_im, t1, t2, t3, level = (float(s) for s in stats)
    t2 = max(t2, 1e-12)
    r1 = t1 / t2
    r2 = float(np.sqrt(max(t3 * t3 - t1 * t1, 1e-24))) / t2
    c1_comp = state.c1 + state.c2 * r1
    c2_comp = state.c2 * r2
    mix = lambda old, new: old + alpha * (new - old)
    return IqCondState(
        dc_re=mix(state.dc_re, dc_re),
        dc_im=mix(state.dc_im, dc_im),
        c1=mix(state.c1, c1_comp),
        c2=mix(state.c2, c2_comp),
        level=mix(state.level, level),
    )


# ---------------------------------------------------------------------------
# NCO derotation (reference: dvbt2_demodulator.cpp:165-174)
# ---------------------------------------------------------------------------

def nco_derotate(x: C, phase0: jnp.ndarray, freq: jnp.ndarray):
    """y[n] = x[n] * exp(-j(phase0 + freq*n)); returns (y, phase_end).

    ``freq`` is radians/sample.  The phase ramp is closed-form (no
    recurrence), so the whole block vectorizes; phase_end is carried to the
    next block by the host.
    """
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ph = phase0 + freq * n
    y = x * cplx.cexp(-ph)
    phase_end = jnp.mod(phase0 + freq * x.shape[-1], 2 * jnp.pi)
    return y, phase_end


def spur_notch(x: C, phase0: jnp.ndarray, omega: jnp.ndarray,
               a_re: jnp.ndarray, a_im: jnp.ndarray):
    """Subtract a tracked CW spur a*exp(j(phase0 + omega*n)); returns
    (y, (m_re, m_im)) with m = the block's measured complex spur amplitude
    at omega (correlation of the INPUT against the ramp).

    Block-recurrent replacement for the reference's per-sample anti-spur
    loop (dvbt2_demodulator.h:120-127): the host smooths m into the next
    block's amplitude and refines omega from m's block-to-block rotation
    (runtime/stream.py).  Phase continuity across blocks is host float64.

    Numerics: omega can sit anywhere in (-pi, pi], so a plain f32
    omega*arange ramp would lose ~0.16 rad over a 5e5-sample block.  The
    ramp is built per 1024-sample chunk from a mod-reduced chunk base
    (error < 1e-3 rad end to end, notch depth ~60 dB).
    """
    n_tot = x.shape[-1]
    ch = 1024
    n = jnp.arange(n_tot, dtype=jnp.int32)
    c = (n // ch).astype(jnp.float32)
    r = (n % ch).astype(jnp.float32)
    two_pi = jnp.float32(2 * np.pi)
    step_c = jnp.mod(omega * ch, two_pi)
    ph = phase0 + jnp.mod(step_c * c, two_pi) + omega * r
    co, si = jnp.cos(ph), jnp.sin(ph)
    m_re = jnp.mean(x.re * co + x.im * si)
    m_im = jnp.mean(x.im * co - x.re * si)
    y = C(x.re - (a_re * co - a_im * si), x.im - (a_re * si + a_im * co))
    return y, (m_re, m_im)


def detect_spur(iq: np.ndarray, min_ratio: float = 8.0):
    """Host-side CW spur search: (omega rad/sample, amp complex) or None.

    A spur stands out of the noise-like OFDM spectrum as a single FFT bin
    at >> the median magnitude (the reference arms its anti-spur by hand;
    here detection is automatic at acquisition time).  The FFT bin only
    localizes omega to ~1e-4 rad/sample — far too coarse for a notch whose
    phase must stay coherent over 1e5+-sample blocks — so the estimate is
    ladder-refined by phase differences over geometrically growing spans
    (each stage's unambiguous range covers the previous stage's residual),
    reaching ~1e-7 rad/sample.
    """
    x = np.asarray(iq)
    x = x - np.mean(x)
    n = 1 << 16
    if len(x) < n:
        n = 1 << int(np.floor(np.log2(max(len(x), 2))))
    spec = np.fft.fft(x[:n])
    mag = np.abs(spec)
    k = int(np.argmax(mag))
    med = float(np.median(mag))
    if mag[k] < min_ratio * med:
        return None
    omega = 2 * np.pi * (k if k < n // 2 else k - n) / n

    ns = 2048
    while 2 * ns <= len(x):
        seg = np.arange(ns)
        ramp = np.exp(-1j * omega * seg)
        m_a = np.mean(x[:ns] * ramp)
        m_b = np.mean(x[ns:2 * ns] * ramp * np.exp(-1j * omega * ns))
        if abs(m_a) > 0 and abs(m_b) > 0:
            omega += float(np.angle(m_b * np.conj(m_a))) / ns
        ns *= 4
    m = np.mean(x[:ns // 4 * 2] *
                np.exp(-1j * omega * np.arange(ns // 4 * 2)))
    return float(omega), complex(m)


# ---------------------------------------------------------------------------
# cubic Farrow fractional resampler
# (reference: DSP/interpolator_farrow.hh:41-68, sample-serial accumulator)
# ---------------------------------------------------------------------------

def split_step(step: float) -> tuple[np.float32, np.float32]:
    """Split a host double into hi + lo float32 parts (Dekker split).

    TPUs have no float64; the resampler reconstructs exact sample positions
    from this two-float representation, so the step scalar can be a traced
    device value (no recompile when the SRO trim changes it per block).
    """
    hi = np.float32(step)
    lo = np.float32(step - float(hi))
    return hi, lo


_FARROW_CHUNK = 1024


def farrow_resample(x: C, mu0: jnp.ndarray, step_hi: jnp.ndarray,
                    step_lo: jnp.ndarray, n_out: int) -> C:
    """Cubic (4-tap Lagrange) fractional resampler with static output size.

    Output i interpolates input position p_i = mu0 + step*i with
    step = step_hi + step_lo (see :func:`split_step`).  The caller
    guarantees ceil(mu0 + step*(n_out-1)) + 2 < len(x) and carries the
    fractional phase between blocks.

    Numerics: positions are computed per 1024-output chunk from an exact
    int32 base plus a small float32 offset, keeping the fractional-delay
    error < 1e-4 samples over arbitrarily long blocks (float32 alone loses
    the fraction entirely beyond ~1e5 samples).  One gather + polynomial —
    no recurrence anywhere.
    """
    chunk = _FARROW_CHUNK
    assert n_out % chunk == 0, f"n_out must be a multiple of {chunk}"
    n_chunks = n_out // chunk
    mu0 = mu0.astype(jnp.float32)
    step_hi = step_hi.astype(jnp.float32)
    step_lo = step_lo.astype(jnp.float32)

    # exact per-chunk advance: chunk * step_hi is exact in f32 (chunk = 2^10)
    a_hi = chunk * step_hi
    i_adv = jnp.floor(a_hi)
    f_adv = (a_hi - i_adv) + chunk * step_lo          # small, ~exact
    c = jnp.arange(n_chunks, dtype=jnp.float32)
    g = mu0 + c * f_adv                                # < n_chunks * 2
    idx_base = (c * i_adv + jnp.floor(g)).astype(jnp.int32)   # exact int
    frac_base = g - jnp.floor(g)

    i = jnp.arange(chunk, dtype=jnp.float32)
    p = frac_base[:, None] + i[None, :] * step_hi      # [C, chunk], < ~1200
    pf = jnp.floor(p)
    idx = (idx_base[:, None] + pf.astype(jnp.int32)).reshape(-1)
    d = (p - pf).reshape(-1)

    xm1 = cplx.take(x, idx - 1, mode="clip")
    x0 = cplx.take(x, idx, mode="clip")
    x1 = cplx.take(x, idx + 1, mode="clip")
    x2 = cplx.take(x, idx + 2, mode="clip")

    dm1, dp1, dm2 = d - 1.0, d + 1.0, d - 2.0
    cm1 = -d * dm1 * dm2 / 6.0
    c0 = dp1 * dm1 * dm2 / 2.0
    c1 = -dp1 * d * dm2 / 2.0
    c2 = dp1 * d * dm1 / 6.0
    return xm1 * cm1 + x0 * c0 + x1 * c1 + x2 * c2


def farrow_advance(mu0: float, step: float, n_out: int) -> tuple[int, float]:
    """Host bookkeeping (python float64): (input samples consumed, next mu0).

    Keeps one sample of left history for the -1 tap.
    """
    p_next = mu0 + step * n_out
    consumed = int(np.floor(p_next)) - 1
    return consumed, p_next - consumed


# ---------------------------------------------------------------------------
# half-band 2x upsampler (pre-interpolation rate doubling)
#
# The cubic Farrow interpolator's alias images sit ~18 dB down when the
# signal occupies 0.38 of the input Nyquist (8 MHz DVB-T2 in a 10 Msps
# capture); each half-band doubling pushes the signal an octave down and
# buys ~12 dB.  Two stages (x4) put the implementation floor near 45 dB.
# The reference has no equivalent stage (its Farrow runs at the device
# rate and eats the distortion, dvbt2_demodulator.cpp:179-183).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def halfband_taps(n_taps: int = 29, beta: float = 7.0) -> tuple:
    """Odd-length half-band lowpass (center tap at an even index)."""
    assert n_taps % 4 == 1, "need N = 4k+1 so even taps are zero"
    n = np.arange(n_taps) - (n_taps - 1) / 2.0
    h = np.sinc(n / 2.0) * np.kaiser(n_taps, beta)
    h[np.abs(n) % 2 == 0] = 0.0        # force exact half-band zeros
    h[(n_taps - 1) // 2] = 1.0
    h[1::2] *= 1.0 / (h.sum() - 1.0)   # DC gain exactly 2 (x2 interp)
    return tuple(h.astype(np.float32))


def upsample2(x: C, history: C, taps: jnp.ndarray):
    """Zero-stuff x2 + half-band filter; returns (y [2N], new_history).

    history: [len(taps)-1] tail of the previous block in the UPSAMPLED
    domain (carry ``y``'s source, i.e. the zero-stuffed stream).
    """
    n = x.shape[-1]
    t = taps.shape[0]
    up = cplx.czeros((2 * n,))
    up = C(up.re.at[::2].set(x.re), up.im.at[::2].set(x.im))
    xp = cplx.concatenate([history, up])
    ri = cplx.stack_ri(xp)[None]
    k = jnp.broadcast_to(taps[::-1][None, None], (2, 1, t))
    y = jax.lax.conv_general_dilated(
        ri, k, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=2)[0]
    return C(y[0], y[1]), xp[-(t - 1):]


# ---------------------------------------------------------------------------
# anti-alias FIR + decimate-by-2
# (reference: DSP/filter_decimator.h — AVX MAC loops over 16/32/64 taps)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def design_lowpass(n_taps: int, cutoff: float, beta: float) -> tuple:
    """Kaiser-windowed-sinc lowpass; cutoff in cycles/sample (0..0.5)."""
    n = np.arange(n_taps) - (n_taps - 1) / 2.0
    h = 2 * cutoff * np.sinc(2 * cutoff * n)
    h *= np.kaiser(n_taps, beta)
    h /= h.sum()
    return tuple(h.astype(np.float32))


# GUI-selectable filter tiers analogous to the reference's
# Soft/Medium/Sharp/Test presets (filter_decimator.h:29-120): the stream into
# the FIR runs at 2x elementary rate (128/7 ~ 18.29 Msps); the 8 MHz T2
# signal occupies +-3.81 MHz ~ +-0.21 fs, aliases fold in above 0.29 fs.
FIR_PRESETS = {
    "soft": (16, 0.25, 3.0),
    "medium": (32, 0.25, 5.0),
    "sharp": (64, 0.25, 7.0),
    # the reference's Test1/Test2 16-tap equiripple variants (pass 3.7/3.8
    # MHz, stop 5.4 MHz at ~2x elementary) as clean-room Kaiser designs
    "test1": (16, 0.249, 2.6),
    "test2": (16, 0.252, 2.6),
}


def fir_taps(preset: str = "medium") -> np.ndarray:
    n, cut, beta = FIR_PRESETS[preset]
    return np.asarray(design_lowpass(n, cut, beta), dtype=np.float32)


def fir_decimate2(x: C, history: C, taps: jnp.ndarray):
    """Overlap-save FIR + decimate by 2.

    x: [N] real-pair (N even); history: [len(taps)-1] tail of the previous
    block.  Returns (y [N//2], new_history).  Runs as one strided XLA
    convolution over stacked real/imag channels.
    """
    t = taps.shape[0]
    xp = cplx.concatenate([history, x])
    ri = cplx.stack_ri(xp)[None]                      # [1, 2, N + t - 1]
    k = jnp.broadcast_to(taps[::-1][None, None], (2, 1, t))
    y = jax.lax.conv_general_dilated(
        ri, k, window_strides=(2,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=2)[0]
    return C(y[0], y[1]), xp[-(t - 1):]
