"""MISO (Alamouti, EN 302 755 clause 6.4 / 9.2) end-to-end reception.

Two transmit groups with DIFFERENT frequency-selective channels: the
receiver separates h1/h2 from the alternating-polarity pilots (inversion
sets cross-validated against the reference generator in
test_reference_oracle.py) and Alamouti-combines carrier-order payload
pairs.  The reference receiver's MISO support is vestigial — it hardcodes
transmit group 1 (dvbt2_demodulator.cpp:127 "MISO_TX1;//?") and never
combines the Alamouti pairs, so real MISO data is beyond its scope.
"""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter, TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import ChannelConfig, impair, quantize
from sdr_receiver_dvb_t2_tpu.models.receiver import TpuReceiver, RxConfig
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)

MODE = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
              pilot_pattern=PilotPattern.PP3, extended_carriers=False,
              n_data_symbols=30, miso=True).validate()
PLP = PlpConfig(constellation=Constellation.QAM16, code_rate=CodeRate.C1_2,
                fec_frame=FecFrame.SHORT, rotation=True, time_il_length=1)


def _miso_tx(n_frames, seed=8):
    tx = Transmitter(TxConfig(mode=MODE, plp=PLP, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    bytes_per_frame = 4 * (PLP.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188
    ts = random_ts_stream(n_pkts, seed=seed)
    iq1, iq2 = tx.modulate(ts)
    return tx, ts, iq1, iq2


def _two_path_mix(iq1, iq2, snr_db, seed=5):
    """Distinct multipath per transmit group (echoes well inside the GI),
    summed at the receive antenna + AWGN."""
    g1 = np.zeros(40, np.complex64)
    g1[0], g1[17] = 0.9 * np.exp(1j * 0.3), 0.25 * np.exp(-1j * 2.1)
    g2 = np.zeros(40, np.complex64)
    g2[3], g2[29] = 0.55 * np.exp(1j * 1.2), 0.2 * np.exp(1j * 0.4)
    rx = (np.convolve(iq1, g1)[:len(iq1)]
          + np.convolve(iq2, g2)[:len(iq2)])
    rng = np.random.default_rng(seed)
    p = np.mean(np.abs(rx) ** 2)
    n = np.sqrt(p / 10 ** (snr_db / 10) / 2)
    return (rx + n * (rng.standard_normal(len(rx))
                      + 1j * rng.standard_normal(len(rx)))
            ).astype(np.complex64)


def test_miso_tx_structure():
    """TX emits two groups: identical P1, Alamouti-paired payload, and the
    TX2 pilots carry the oracle-pinned inversion pattern."""
    tx, _ts, iq1, iq2 = _miso_tx(1)
    assert len(iq1) == len(iq2)
    assert tx.l1_pre.s1 == 1                       # T2 MISO preamble
    np.testing.assert_array_equal(iq1[:2048], iq2[:2048])   # same P1
    assert not np.allclose(iq1[2048:], iq2[2048:])


@pytest.mark.slow
def test_miso_frame_receive_multipath():
    """Frame-level closed loop: different per-group multipath + 25 dB AWGN
    decodes TS bit-exact through the Alamouti equalizer."""
    tx, ts, iq1, iq2 = _miso_tx(2)
    rxsig = _two_path_mix(iq1, iq2, snr_db=25.0)
    F = MODE.frame_samples
    frames = rxsig[:2 * F].reshape(2, F)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=4,
                              n_ti=1, use_pallas=False))
    rx._l1_post_cells = tx.l1_pre.l1_post_size
    res = rx.receive(frames)
    assert res.ldpc_ok.all() and res.bch_clean.all()
    assert res.snr_db > 15.0
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


@pytest.mark.slow
def test_miso_prime_ideal_sum():
    """TpuReceiver.prime() acquires L1 from the clean sum of both groups
    (ideal-channel Alamouti combine in the host reference path)."""
    tx, ts, iq1, iq2 = _miso_tx(2)
    F = MODE.frame_samples
    frames = (iq1 + iq2)[:2 * F].reshape(2, F)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=4,
                              n_ti=1, use_pallas=False)).prime(frames[0])
    res = rx.receive(frames)
    assert res.ldpc_ok.all() and res.bch_clean.all()
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


@pytest.mark.slow
def test_miso_blind_stream(tmp_path):
    """Fully blind: a u8 capture of the two-group mix with CFO/SRO noise
    acquires from the S1=1 P1 (MISO signalled, not configured), tracks,
    and recovers the TS — the complete runtime path the reference never
    implemented for MISO."""
    from sdr_receiver_dvb_t2_tpu.io import sources, sinks
    from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod
    _tx, ts, iq1, iq2 = _miso_tx(9)
    rxsig = _two_path_mix(iq1, iq2, snr_db=27.0)
    device_rate = 10_000_000
    dev = impair(rxsig, ChannelConfig(device_rate=device_rate, cfo_hz=12e3,
                                      sro_ppm=9.0, snr_db=40.0, phase0=0.7,
                                      seed=3))
    raw = quantize(dev, "u8", scale=0.4)
    path = tmp_path / f"capture_dvbt2_miso_0_{device_rate}_8.raw"
    raw.tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * MODE.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=5)
    assert stats.state == "locked", stats
    assert rx.mode.miso and rx.mode.pilot_pattern == PilotPattern.PP3
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats
    assert abs(stats.cfo_hz - 12e3) < 500, stats.cfo_hz

    sync, got = ts.tobytes(), sink.data.tobytes()
    idx = sync.find(got[:188 * 2])
    assert idx >= 0
    n = min(len(got), len(sync) - idx)
    assert n > 188 * 40
    assert got[:n] == sync[idx:idx + n]


# ---------------------------------------------------------------------------
# T2-Lite (EN 302 755 annex I): S1=3 preamble, Lite-only code rates


@pytest.mark.slow
def test_t2_lite_blind_stream(tmp_path):
    """T2-Lite mux at rate 1/3 (annex C table B8, a code the reference
    never wires into its decoder) acquires blind from the S1=3 preamble
    and recovers the TS exactly."""
    from sdr_receiver_dvb_t2_tpu.io import sources, sinks
    from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30, lite=True).validate()
    plp = PlpConfig(constellation=Constellation.QPSK,
                    code_rate=CodeRate.C1_3, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    n_frames = 8
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    assert tx.l1_pre.s1 == 3
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188
    ts = random_ts_stream(n_pkts, seed=31)
    iq = tx.modulate(ts)

    device_rate = 10_000_000
    dev = impair(iq, ChannelConfig(device_rate=device_rate, cfo_hz=-7e3,
                                   sro_ppm=6.0, snr_db=11.0, phase0=0.2,
                                   seed=12))
    raw = quantize(dev, "u8", scale=0.4)
    path = tmp_path / f"capture_dvbt2_lite_0_{device_rate}_8.raw"
    raw.tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=5)
    assert stats.state == "locked", stats
    assert rx.mode.lite and not rx.mode.miso
    assert rx.rx.plp.code_rate == CodeRate.C1_3
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats

    sync, got = ts.tobytes(), sink.data.tobytes()
    idx = sync.find(got[:188 * 2])
    assert idx >= 0
    n = min(len(got), len(sync) - idx)
    assert n > 188 * 20
    assert got[:n] == sync[idx:idx + n]


@pytest.mark.slow
def test_t2_lite_rate_2_5_frame_receive():
    """Rate-2/5 (table B9) closed loop at the frame level, 16QAM."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30, lite=True).validate()
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C2_5, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=2))
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    ts = random_ts_stream(4 * bytes_per_frame // 188, seed=32)
    iq = tx.modulate(ts)
    F = mode.frame_samples
    rng = np.random.default_rng(2)
    n = np.sqrt(np.mean(np.abs(iq) ** 2) / 10 ** 1.2 / 2)   # 12 dB SNR
    sig = (iq + n * (rng.standard_normal(len(iq))
                     + 1j * rng.standard_normal(len(iq)))).astype(np.complex64)
    frames = sig[:2 * F].reshape(2, F)
    rx = TpuReceiver(RxConfig(mode=mode, plp=plp, n_fec_per_frame=4,
                              n_ti=1, use_pallas=False)).prime(frames[0])
    res = rx.receive(frames)
    assert res.ldpc_ok.all() and res.bch_clean.all()
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]
