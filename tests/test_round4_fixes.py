"""Round-4 verdict fixes.

VERDICT.md (round 3) weak #2: `_check_l1_dynamic` used to swallow ALL
exceptions, making a parser bug indistinguishable from RF erasure (it
would be silently "repaired" from the in-band / repetition caches every
batch).  Now only `params.l1.L1DecodeError` (malformed-but-CRC-valid
signalling) counts as an erasure; anything else propagates.
"""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                        TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import (ChannelConfig, impair,
                                                    quantize)
from sdr_receiver_dvb_t2_tpu.io import sources, sinks
from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
from sdr_receiver_dvb_t2_tpu.runtime import acquisition, stream as stream_mod
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


def _locked_receiver(tmp_path):
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=7))
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    ts = random_ts_stream((7 + 2) * bytes_per_frame // 188, seed=11)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10_000_000, cfo_hz=4e3,
                                   sro_ppm=5.0, snr_db=27.0, seed=4))
    raw = quantize(dev, "u8", scale=0.4)
    path = tmp_path / "capture_dvbt2_test_0_10000000_8.raw"
    raw.tofile(path)
    src = sources.RawFileSource(str(path))
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sinks.BufferTsSink(), cfg)
    assert rx.acquire(), rx.stats
    return rx


@pytest.mark.slow
def test_l1_dynamic_parser_bug_surfaces(tmp_path, monkeypatch):
    rx = _locked_receiver(tmp_path)
    assert rx.step_batch()                      # healthy batch decodes

    # a programming error in the L1 decode path must raise, not be
    # silently "repaired" from the caches
    def broken(cells, pre):
        raise RuntimeError("deliberately broken parser")
    monkeypatch.setattr(acquisition, "decode_l1_from_p2", broken)
    with pytest.raises(RuntimeError, match="deliberately broken"):
        rx.step_batch()


@pytest.mark.slow
def test_l1_decode_error_is_an_erasure(tmp_path, monkeypatch):
    rx = _locked_receiver(tmp_path)
    assert rx.step_batch()

    # malformed-but-CRC-valid signalling (L1DecodeError) is an erasure:
    # the batch proceeds on the cached/repaired dynamic configuration
    def reserved(cells, pre):
        raise l1_mod.L1DecodeError("reserved L1_POST modulation 7")
    monkeypatch.setattr(acquisition, "decode_l1_from_p2", reserved)
    before = rx.stats.frames
    assert rx.step_batch()
    assert rx.stats.frames == before + 1
    assert rx.stats.bch_dirty == 0


def test_reserved_l1_post_mod_raises_decode_error():
    pre = l1_mod.L1Pre()
    pre.l1_post_mod = 7                         # reserved code point
    pre.l1_post_size = 100
    pre.l1_post_info_size = 40
    cells = np.zeros(l1_mod.L1_PRE_CELLS + 100, np.complex64)
    with pytest.raises(l1_mod.L1DecodeError):
        acquisition.decode_l1_from_p2(cells, pre)
