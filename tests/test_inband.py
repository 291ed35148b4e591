"""In-band type A signalling (EN 302 755 clause 5.2.3.1): codec round
trips, BB-frame padding carriage, and the stream tracker surviving
sustained P2-L1 erasure on the data path alone.  The reference only
parses/displays the IN_BAND_A/B flags (p2_symbol.cpp:772-773)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import inband
from sdr_receiver_dvb_t2_tpu.io.bbframe import BBFramePacker, BBFrameParser
from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter, TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import (ChannelConfig, impair,
                                                    quantize)
from sdr_receiver_dvb_t2_tpu.io import sources, sinks
from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


def test_inband_a_codec_roundtrip():
    blk = inband.InBandA(
        plp_l1_change_counter=3, sub_slice_interval=12345,
        start_rf_idx=1, current_plp_start=54321, current_plp_num_blocks=7,
        other=[inband.InBandOtherPlp(plp_id=4, plp_start=99, plp_num_blocks=2),
               inband.InBandOtherPlp(plp_id=9, plp_start=1 << 20,
                                     plp_num_blocks=1023)])
    bits = inband.build_inband_a(blk)
    assert len(bits) == inband.inband_a_bits(2)
    # parse from a longer padding field (trailing zeros, as transmitted)
    pad = np.concatenate([bits, np.zeros(37, np.uint8)])
    got = inband.parse_inband_a(pad)
    assert got is not None
    assert got.plp_l1_change_counter == 3
    assert got.sub_slice_interval == 12345
    assert got.start_rf_idx == 1
    sb = got.starts_blocks(current_plp_id=0)
    assert sb[0] == (54321, 7)
    assert sb[4] == (99, 2)
    assert sb[9] == (1 << 20, 1023)


def test_inband_a_parse_rejects_junk():
    # all-zero padding (the no-in-band case) must NOT parse as a block
    assert inband.parse_inband_a(np.zeros(256, np.uint8)) is None
    # wrong PADDING_TYPE
    blk = inband.InBandA(current_plp_num_blocks=5)
    bits = inband.build_inband_a(blk)
    bad = bits.copy()
    bad[1] = 1                          # PADDING_TYPE 00 -> 01 (type B)
    assert inband.parse_inband_a(bad) is None
    # non-zero reserved field
    bad = bits.copy()
    bad[2 + 8:2 + 16] = 1               # RESERVED_1
    assert inband.parse_inband_a(bad) is None
    # truncated block
    assert inband.parse_inband_a(bits[:40]) is None


def test_packer_padding_hook_keeps_ts_intact():
    """A padding hook shrinks DFL on selected BB frames; the parser must
    still reassemble the TS stream exactly and the padding must be
    recoverable from the descrambled frame."""
    from sdr_receiver_dvb_t2_tpu.params import prbs
    k_bch = 7032
    blk = inband.InBandA(current_plp_start=777, current_plp_num_blocks=4)
    bits = inband.build_inband_a(blk)
    packer = BBFramePacker(
        k_bch=k_bch, hem=True,
        padding_hook=lambda i: bits if i % 3 == 0 else None)
    ts = random_ts_stream(60, seed=1)
    frames = packer.pack(ts)
    assert len(frames) >= 6
    parser = BBFrameParser()
    out = [parser.parse(f) for f in frames]
    got = np.concatenate(out).tobytes()
    assert parser.header_errors == 0
    assert got and ts.tobytes().startswith(got)
    # the padded frames carry the block at the head of the padding field
    scr = prbs.bb_scrambler(k_bch)
    for i, f in enumerate(frames):
        by = np.packbits(np.asarray(f, np.uint8) ^ scr)
        dfl = int(by[4]) << 8 | int(by[5])
        if i % 3 == 0:
            assert dfl < k_bch - 80
            pad = np.unpackbits(by[10 + dfl // 8:])
            got_blk = inband.parse_inband_a(pad)
            assert got_blk is not None
            assert got_blk.starts_blocks(0)[0] == (777, 4)
        else:
            assert dfl == k_bch - 80


@pytest.mark.slow
def test_inband_stream_tracking_survives_p2_erasure(tmp_path):
    """TX emits in-band type A; the stream harvests it from the data path
    and, with the P2 L1 read knocked out for SEVERAL consecutive batches,
    keeps repairing the dynamic configuration from in-band alone (L1
    repetition's dyn_next is single-use; in-band re-arms every batch) and
    stays TS-exact."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    n_frames = 9
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames, in_band_a=True))
    assert tx.l1_post.plp[0].in_band_a_flag == 1
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    ts = random_ts_stream((n_frames + 2) * bytes_per_frame // 188, seed=7)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10_000_000, cfo_hz=12e3,
                                   sro_ppm=9.0, snr_db=26.0, seed=5))
    path = tmp_path / "capture_dvbt2_inband_0_10000000_8.raw"
    quantize(dev, "u8", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=2)
    assert stats.state == "locked", stats
    assert stats.inband_a_blocks >= 1, stats
    assert rx._inband_next is not None           # armed for repair

    # knock out THREE consecutive batches' P2 L1 reads: only the in-band
    # data path can carry the dynamic configuration across that
    orig = rx.rx.l1_cells
    calls = {"n": 0}

    def flaky(plane):
        if calls["n"] < 3:
            calls["n"] += 1
            # L1DecodeError is the sanctioned erasure signal; any other
            # exception now propagates as a bug (round-4 exception
            # scoping, tests/test_round4_fixes.py)
            from sdr_receiver_dvb_t2_tpu.params.l1 import L1DecodeError
            raise L1DecodeError("injected P2 fade")
        return orig(plane)

    rx.rx.l1_cells = flaky
    for _ in range(3):
        assert rx.step_batch()
    assert getattr(rx, "_inband_repaired", 0) == 3
    assert getattr(rx, "_l1_dyn_errors", 0) == 0
    rx.rx.l1_cells = orig
    while rx.stats.frames < 6 and rx.step_batch():
        pass
    assert rx.stats.ldpc_failures == 0, rx.stats

    sync, got = ts.tobytes(), sink.data.tobytes()
    idx = sync.find(got[:376])
    assert idx >= 0
    n = min(len(got), len(sync) - idx)
    assert n > 188 * 30
    assert got[:n] == sync[idx:idx + n]
