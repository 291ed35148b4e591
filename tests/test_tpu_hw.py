"""Hardware smokes for the round-3 capability paths (VERDICT r3 next #4):
SFN/Wiener equalization and MISO Alamouti on the REAL chip.

Mosaic/XLA-TPU quirks have repeatedly diverged from CPU behavior (complex
dtypes, bf16 rolls, compile deadlines — CLAUDE.md), so "works on the CPU
mesh" is not "works on the chip".  These tests run only on TPU hardware:

    DVBT2_TEST_TPU=1 python -m pytest tests/test_tpu_hw.py -q
"""
import numpy as np
import pytest

import jax

tpu = any(d.platform == "tpu" or "TPU" in str(getattr(d, "device_kind", ""))
          for d in jax.devices())
pytestmark = pytest.mark.skipif(not tpu, reason="needs TPU hardware")


def _tx(mode, plp, n_frames, seed):
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (
        Transmitter, TxConfig, random_ts_stream)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    n_pkts = (n_frames + 2) * 4 * (plp.k_bch // 8 - 10) // 188
    ts = random_ts_stream(n_pkts, seed=seed)
    return tx, ts


def _assert_ts(res, ts):
    assert res.ldpc_ok.all(), res.ldpc_ok
    assert res.bch_clean.all(), res.bch_clean
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


def test_sfn_wiener_path_on_tpu():
    """Wiener banded rows + temporal-union pilots + CSI-weighted LLRs on
    hardware: a strong in-guard echo through the sfn=True plan decodes
    TS-exact (CPU twin: tests/test_sfn_channel.py)."""
    from sdr_receiver_dvb_t2_tpu.models.receiver import TpuReceiver, RxConfig
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    # PP3 (Dx=6) resolves delays to Tu/6 = 341; the echo at 200 sits at
    # 78% of the guard — the scenario test_sfn_channel.py proves on CPU
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP3, extended_carriers=False,
                  n_data_symbols=30).validate()
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx, ts = _tx(mode, plp, 3, seed=41)
    iq = tx.modulate(ts)[:3 * mode.frame_samples]
    d = 200
    echo = np.concatenate([np.zeros(d, np.complex64), iq[:-d]])
    iq = iq + 1.0j * echo                             # 0 dB in-guard echo
    rng = np.random.default_rng(3)
    npow = np.mean(np.abs(iq) ** 2) / 10 ** (30.0 / 10)
    iq = (iq + (rng.standard_normal(len(iq)) + 1j
                * rng.standard_normal(len(iq))) * np.sqrt(npow / 2)
          ).astype(np.complex64)
    frames = iq[mode.frame_samples:].reshape(2, mode.frame_samples)

    rx = TpuReceiver(RxConfig(mode=mode, plp=plp, n_fec_per_frame=4,
                              n_ti=1, sfn=True))
    rx._l1_post_cells = tx.l1_pre.l1_post_size
    res = rx.receive(frames)
    assert res.snr_db > 12.0, res.snr_db
    _assert_ts(res, ts)


def test_miso_alamouti_path_on_tpu():
    """MISO receive (pilot-separated h1/h2, per-symbol common-phase
    pre-derotation, Alamouti pair combine) on hardware: two transmit
    groups through distinct multipath decode TS-exact (CPU twin:
    tests/test_miso.py)."""
    from sdr_receiver_dvb_t2_tpu.models.receiver import TpuReceiver, RxConfig
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP3, extended_carriers=False,
                  n_data_symbols=30, miso=True).validate()
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx, ts = _tx(mode, plp, 2, seed=43)
    iq1, iq2 = tx.modulate(ts)
    g1 = np.zeros(40, np.complex64)
    g1[0], g1[17] = 0.9 * np.exp(1j * 0.3), 0.25 * np.exp(-1j * 2.1)
    g2 = np.zeros(40, np.complex64)
    g2[3], g2[29] = 0.55 * np.exp(1j * 1.2), 0.2 * np.exp(1j * 0.4)
    rxs = np.convolve(iq1, g1)[:len(iq1)] + np.convolve(iq2, g2)[:len(iq2)]
    rng = np.random.default_rng(7)
    p = np.mean(np.abs(rxs) ** 2)
    n = np.sqrt(p / 10 ** (25.0 / 10) / 2)
    rxs = (rxs + n * (rng.standard_normal(len(rxs))
                      + 1j * rng.standard_normal(len(rxs)))
           ).astype(np.complex64)
    frames = rxs[:2 * mode.frame_samples].reshape(2, mode.frame_samples)

    rx = TpuReceiver(RxConfig(mode=mode, plp=plp, n_fec_per_frame=4,
                              n_ti=1))
    rx._l1_post_cells = tx.l1_pre.l1_post_size
    res = rx.receive(frames)
    assert res.snr_db > 13.0, res.snr_db
    _assert_ts(res, ts)
