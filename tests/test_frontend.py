"""Front-end DSP ops: conversion, conditioning, NCO, Farrow, FIR, P1.

All device IQ is real-pair (ops/cplx.C); host fixtures stay complex.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_receiver_dvb_t2_tpu.ops import frontend as fe
from sdr_receiver_dvb_t2_tpu.ops import p1_detect, cplx
from sdr_receiver_dvb_t2_tpu.params import p1 as p1_mod
from sdr_receiver_dvb_t2_tpu.models import channel


def _bandlimited(n, rng, bw=0.2):
    """Random bandlimited complex signal (fraction bw of Nyquist occupied)."""
    spec = np.zeros(n, dtype=np.complex128)
    k = int(n * bw / 2)
    spec[:k] = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    spec[-k:] = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    return np.fft.ifft(spec) * np.sqrt(n / (2 * k))


# ---------------------------------------------------------------------------
def test_raw_to_iq_roundtrip():
    rng = np.random.default_rng(0)
    iq = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    iq = (iq / (np.max(np.abs(iq)) * 1.5)).astype(np.complex64)
    for fmt, tol in [("u8", 6e-3), ("s8", 6e-3), ("s16", 3e-5), ("f32", 1e-7)]:
        raw = channel.quantize(iq, fmt, scale=1.0)
        back = cplx.to_np(fe.raw_to_iq(jnp.asarray(raw), fmt))
        assert np.max(np.abs(back - iq)) < tol, fmt


def test_iq_condition_removes_impairments():
    rng = np.random.default_rng(1)
    n = 1 << 16
    clean = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64) / np.sqrt(2)
    cfg = channel.ChannelConfig(dc_offset=0.05 - 0.02j, iq_gain_db=0.6,
                                iq_phase_deg=3.0)
    g = 10 ** (cfg.iq_gain_db / 20)
    phi = np.deg2rad(cfg.iq_phase_deg)
    x = clean.real + 1j * g * (clean.imag * np.cos(phi)
                               + clean.real * np.sin(phi)) + cfg.dc_offset
    xc = cplx.from_np(x)

    state = fe.IqCondState()
    for _ in range(40):   # iterate: estimates converge over blocks
        y, stats = fe.iq_condition(xc, jnp.float32(state.c1),
                                   jnp.float32(state.c2))
        state = fe.fold_iq_stats(state, [np.asarray(s) for s in stats],
                                 alpha=0.5)
    yn = cplx.to_np(y)
    # residual DC and image rejection
    assert abs(np.mean(yn)) < 1e-3
    corr = np.mean(yn.real * yn.imag)   # I/Q decorrelated after correction
    assert abs(corr) < 1e-3
    assert abs(np.mean(yn.real ** 2) - np.mean(yn.imag ** 2)) < 2e-3


def test_nco_derotate_continuity():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    xc = cplx.from_np(x)
    freq = np.float32(0.01)
    # one shot
    y_all, _ = fe.nco_derotate(xc, jnp.float32(0.5), freq)
    # two blocks with carried phase
    y1, ph = fe.nco_derotate(xc[:2048], jnp.float32(0.5), freq)
    y2, _ = fe.nco_derotate(xc[2048:], ph, freq)
    y_split = np.concatenate([cplx.to_np(y1), cplx.to_np(y2)])
    assert np.max(np.abs(cplx.to_np(y_all) - y_split)) < 1e-4


def test_farrow_matches_float64_oracle():
    rng = np.random.default_rng(3)
    n_out = 64 * 1024
    step = 0.546875 * (1 + 37e-6)    # 10 MHz -> 128/7 MHz with 37 ppm SRO
    mu0 = 1.37
    n_in = int(np.ceil(mu0 + step * n_out)) + 4
    x = _bandlimited(n_in, rng, bw=0.42).astype(np.complex64)

    hi, lo = fe.split_step(step)
    y = cplx.to_np(fe.farrow_resample(cplx.from_np(x), jnp.float32(mu0),
                                      jnp.float32(hi), jnp.float32(lo), n_out))

    p = mu0 + step * np.arange(n_out)
    idx = np.floor(p).astype(np.int64)
    d = p - idx
    x64 = x.astype(np.complex128)
    dm1, dp1, dm2 = d - 1, d + 1, d - 2
    oracle = (x64[idx - 1] * (-d * dm1 * dm2 / 6) + x64[idx] * (dp1 * dm1 * dm2 / 2)
              + x64[idx + 1] * (-dp1 * d * dm2 / 2) + x64[idx + 2] * (dp1 * d * dm1 / 6))
    err = np.abs(y - oracle)
    rms = np.sqrt(np.mean(err ** 2)) / np.sqrt(np.mean(np.abs(oracle) ** 2))
    assert rms < 2e-3, rms          # position error < ~1e-4 samples


def test_fir_decimate2_oracle_and_streaming():
    rng = np.random.default_rng(4)
    taps = fe.fir_taps("medium")
    t = len(taps)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    xc = cplx.from_np(x)
    hist0 = cplx.czeros(t - 1)

    y, h1 = fe.fir_decimate2(xc, hist0, jnp.asarray(taps))
    yn = cplx.to_np(y)
    # oracle
    xp = np.concatenate([np.zeros(t - 1, np.complex64), x]).astype(np.complex128)
    full = np.convolve(xp, taps.astype(np.float64), mode="valid")
    assert np.max(np.abs(yn - full[::2])) < 1e-4

    # streaming in two chunks == one shot
    ya, ha = fe.fir_decimate2(xc[:4096], hist0, jnp.asarray(taps))
    yb, _ = fe.fir_decimate2(xc[4096:], ha, jnp.asarray(taps))
    y_split = np.concatenate([cplx.to_np(ya), cplx.to_np(yb)])
    assert np.max(np.abs(yn - y_split)) < 1e-5


def test_fir_stopband():
    taps = fe.fir_taps("sharp").astype(np.float64)
    w = np.fft.rfftfreq(8192)
    h = np.abs(np.fft.rfft(taps, 8192))
    passband = h[w <= 0.20]
    stopband = h[w >= 0.30]
    assert np.min(passband) > 10 ** (-1 / 20)        # < 1 dB droop
    assert np.max(stopband) < 10 ** (-50 / 20)       # > 50 dB attenuation


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("cfo_carriers", [0.0, 0.31, -2.4])
def test_p1_detect_and_decode(cfo_carriers):
    """P1 at a known offset in noise: find it, recover CFO, decode S1/S2."""
    rng = np.random.default_rng(5)
    s1, s2 = 0, 5                      # SISO, 32K
    sym = p1_mod.generate(s1, s2)
    n, t0_true = 12288, 3777
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64) * np.sqrt(0.05)      # ~13 dB SNR
    x[t0_true:t0_true + 2048] += sym
    cfo_true = cfo_carriers * 2 * np.pi / 1024       # rad/sample
    x = x * np.exp(1j * cfo_true * np.arange(n)).astype(np.complex64)

    t0, peak, cfo_frac = p1_detect.detect(cplx.from_np(x))
    t0 = int(t0)
    assert abs(t0 - t0_true) <= 2, (t0, t0_true)
    assert float(peak) > 0.3

    frac_true = cfo_true - np.round(cfo_carriers) * 2 * np.pi / 1024
    assert abs(float(cfo_frac) - frac_true) < 0.03 * 2 * np.pi / 1024

    res = p1_detect.decode_signalling(x[t0:t0 + 2048], float(cfo_frac))
    assert res is not None
    s1_d, s2_d, cfo_total = res
    assert (s1_d, s2_d) == (s1, s2)
    assert abs(cfo_total - cfo_true) < 0.05 * 2 * np.pi / 1024


def test_p1_no_false_alarm_on_noise():
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    _, peak, _ = p1_detect.detect(cplx.from_np(x))
    assert float(peak) < 0.2


def test_gi_cfo_discriminator_sign():
    """The guard-interval CFO estimate must have the SAME sign as the
    residual offset (at half magnitude, the reference's /(2*fft_size)
    convention) — an inverted sign turns the tracking loop into positive
    feedback."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                            TxConfig,
                                                            random_ts_stream)
    from sdr_receiver_dvb_t2_tpu.ops import ofdm
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=2))
    iq = tx.modulate(random_ts_stream(120, seed=0))[:mode.frame_samples]
    for e in (+2e-5, -2e-5):
        rot = (iq * np.exp(1j * e * np.arange(len(iq)))).astype(np.complex64)
        est = float(np.mean(np.asarray(ofdm.gi_cfo_estimate(
            ofdm.frame_to_symbols(cplx.from_np(rot), mode), mode))))
        assert abs(est - e / 2) < abs(e) * 0.1, (e, est)
