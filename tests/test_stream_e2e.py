"""End-to-end streaming: impaired raw capture file -> blind acquisition ->
tracking -> TS bytes matching the transmitted stream."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter, TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import (ChannelConfig, impair,
                                                    quantize)
from sdr_receiver_dvb_t2_tpu.io import sources, sinks
from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


def _make_capture(tmp_path, n_frames=9, cfo_hz=31e3, sro_ppm=19.0,
                  snr_db=26.0, fmt="8", device_rate=10_000_000):
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188
    ts = random_ts_stream(n_pkts, seed=42)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=device_rate, cfo_hz=cfo_hz,
                                   sro_ppm=sro_ppm, snr_db=snr_db,
                                   phase0=1.1, dc_offset=0.02 - 0.01j,
                                   iq_gain_db=0.2, iq_phase_deg=1.0,
                                   seed=3))
    raw = quantize(dev, {"8": "u8", "16": "s16", "fc": "f32"}[fmt],
                   scale=0.4)
    path = tmp_path / f"capture_dvbt2_test_0_{device_rate}_{fmt}.raw"
    raw.tofile(path)
    return str(path), ts, mode


@pytest.mark.slow
def test_stream_blind_receive_u8(tmp_path):
    path, ts_in, mode = _make_capture(tmp_path)
    rate, fmt = sources.parse_raw_filename(path)
    assert rate == 10_000_000 and fmt == "u8"

    src = sources.RawFileSource(path)
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=4)

    assert stats.state == "locked", stats
    assert stats.frames >= 4
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats
    assert abs(stats.cfo_hz - 31e3) < 500, stats.cfo_hz
    assert stats.snr_db > 15

    ts_out = sink.data
    assert len(ts_out) > 188 * 40
    # the receiver starts mid-stream; find the alignment and compare
    sync = ts_in.tobytes()
    got = ts_out.tobytes()
    idx = sync.find(got[:188 * 2])
    assert idx >= 0, "recovered TS not found in transmitted stream"
    n = min(len(got), len(sync) - idx)
    assert got[:n] == sync[idx:idx + n]


@pytest.mark.slow
def test_stream_s16_format(tmp_path):
    path, ts_in, mode = _make_capture(tmp_path, n_frames=8, cfo_hz=-12e3,
                                      sro_ppm=-8.0, fmt="16")
    src = sources.RawFileSource(path)
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    stats = stream_mod.StreamingReceiver(src, sink, cfg).run(max_frames=3)
    assert stats.state == "locked"
    assert stats.ldpc_failures == 0
    assert abs(stats.cfo_hz + 12e3) < 500


@pytest.mark.slow
def test_stream_relock_after_dropout(tmp_path):
    """Signal -> noise gap -> signal: the receiver must detect the lost
    lock via P1 misses and re-acquire on the second segment."""
    path, ts_in, mode = _make_capture(tmp_path, n_frames=6, cfo_hz=5e3,
                                      sro_ppm=0.0, fmt="fc")
    seg = np.fromfile(path, dtype=np.float32).view(np.complex64)
    rng = np.random.default_rng(7)
    gap = (rng.standard_normal(400_000) + 1j * rng.standard_normal(400_000)
           ).astype(np.complex64) * np.sqrt(np.mean(np.abs(seg) ** 2))
    stream = np.concatenate([seg[:len(seg) // 2], gap, seg])

    src = sources.ArraySource(stream, 10_000_000)
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=5)
    # at least one relock happened and decoding continued afterwards
    assert stats.frames >= 3
    assert sink.packets_sent > 30


@pytest.mark.slow
def test_stream_8k_mode(tmp_path):
    """Blind acquisition on a different FFT size / GI / pilot pattern
    (exercises the S2 decode and GI-hypothesis scan paths)."""
    mode = T2Mode(fft_mode=FftMode.FFT_8K, guard=GuardInterval.G1_32,
                  pilot_pattern=PilotPattern.PP3, extended_carriers=True,
                  n_data_symbols=12)
    plp = PlpConfig(constellation=Constellation.QAM64,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.SHORT,
                    time_il_length=1, num_blocks_max=10)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=6,
                              num_t2_frames=8))
    bytes_per_frame = 6 * (plp.k_bch // 8 - 10)
    ts = random_ts_stream(10 * bytes_per_frame // 188, seed=21)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10e6, cfo_hz=-22e3,
                                   sro_ppm=11.0, snr_db=27.0, seed=9))
    path = tmp_path / "cap8k_0_10000000_16.raw"
    quantize(dev, "s16", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=3)
    assert stats.state == "locked"
    assert rx.mode.fft_size == 8192
    assert rx.mode.guard == GuardInterval.G1_32
    assert rx.mode.pilot_pattern == PilotPattern.PP3
    assert stats.ldpc_failures == 0 and stats.bch_dirty == 0
    assert abs(stats.cfo_hz + 22e3) < 500
    got, sync = sink.data.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """save_state/load_state: a fresh receiver warm-starts on the rest of
    the stream without re-running the blind GI/L1 acquisition."""
    path, ts_in, mode = _make_capture(tmp_path, n_frames=9)
    src = sources.RawFileSource(path)
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx1 = stream_mod.StreamingReceiver(src, sinks.BufferTsSink(), cfg)
    assert rx1.acquire()
    rx1.step_batch()
    state = stream_mod.save_state(rx1)
    src.close()

    # resume on the same capture in a new receiver (simulates a restart)
    src2 = sources.RawFileSource(path)
    sink2 = sinks.BufferTsSink()
    rx2 = stream_mod.StreamingReceiver(src2, sink2, cfg)
    assert stream_mod.load_state(rx2, state)
    assert rx2.mode.fft_size == mode.fft_size
    stats = rx2.run(max_frames=3)
    assert stats.ldpc_failures == 0 and stats.bch_dirty == 0
    got, sync = sink2.data.tobytes(), ts_in.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


@pytest.mark.slow
def test_stream_l1_dynamic_change(tmp_path):
    """PLP_NUM_BLOCKS changes mid-stream (per-frame dynamic L1): the
    receiver must rebuild for the new configuration and keep decoding."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    segs, ts_segs = [], []
    for n_fec, seed in ((4, 31), (3, 32)):
        tx = Transmitter(TxConfig(mode=mode, plp=plp,
                                  fec_blocks_per_frame=n_fec,
                                  num_t2_frames=5))
        ts = random_ts_stream(
            6 * n_fec * (plp.k_bch // 8 - 10) // 188, seed=seed)
        segs.append(tx.modulate(ts)[:5 * mode.frame_samples])
        ts_segs.append(ts)
    iq = np.concatenate(segs)
    dev = impair(iq, ChannelConfig(device_rate=10e6, snr_db=30.0, seed=6))
    path = tmp_path / "dyn_0_10000000_16.raw"
    quantize(dev, "s16", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=8)
    assert stats.state == "locked"
    assert stats.frames >= 4
    # the receiver adapted: current config reflects the second segment
    assert rx.rx.cfg.n_fec_per_frame == 3
    got = sink.data.tobytes()
    # both segments' TS prefixes must appear intact in order
    a = ts_segs[0].tobytes()
    b = ts_segs[1].tobytes()
    at_a = a.find(got[:376])
    assert at_a >= 0
    # find where segment-2 data starts in the output
    probe = b[:376]
    at_out = got.find(probe[:188])
    assert at_out > 0, "second segment's TS never appeared"


@pytest.mark.slow
def test_stream_normal_mode(tmp_path):
    """Normal Mode (NM) end to end: per-packet CRC-8 chain instead of HEM
    sync-byte removal (the reference's tested path is HEM; NM exercises
    the CRC/TEI machinery)."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=9, hem=False))
    bytes_per_frame = 4 * (plp.k_bch // 8)
    ts = random_ts_stream(10 * bytes_per_frame // 188, seed=51)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10e6, cfo_hz=9e3,
                                   snr_db=28.0, seed=8))
    path = tmp_path / "nm_0_10000000_16.raw"
    quantize(dev, "s16", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=4)
    assert stats.state == "locked"
    assert stats.ldpc_failures == 0 and stats.bch_dirty == 0
    got = sink.data
    pkts = got.reshape(-1, 188)
    assert not np.any(pkts[:, 1] & 0x80)       # no TEI flags on clean RX
    sync = ts.tobytes()
    at = sync.find(got.tobytes()[:376])
    assert at >= 0 and got.tobytes() == sync[at:at + len(got)]


@pytest.mark.slow
def test_stream_anti_spur_tracker(tmp_path):
    """A strong CW spur in the raw spectrum is auto-detected, tracked and
    notched (the reference's anti-spur option, dvbt2_demodulator.h:120-127
    — there armed by hand, here automatic)."""
    path, ts_in, mode = _make_capture(tmp_path, n_frames=8, cfo_hz=9e3,
                                      sro_ppm=4.0, snr_db=28.0)
    rate, _fmt = sources.parse_raw_filename(path)
    raw = np.fromfile(path, np.uint8).astype(np.float32)
    iq = (raw[0::2] - 127.5) / 128 + 1j * (raw[1::2] - 127.5) / 128
    rms = float(np.sqrt(np.mean(np.abs(iq) ** 2)))
    omega_true = 2 * np.pi * 1.31e6 / rate
    n = np.arange(len(iq))
    spur_amp = 0.5 * rms
    iq = 0.75 * (iq + spur_amp * np.exp(1j * (omega_true * n + 0.7)))
    spurred = tmp_path / "cap_spur_0_10000000_8.raw"
    out = np.empty(2 * len(iq), np.float32)
    out[0::2], out[1::2] = iq.real, iq.imag
    np.clip(np.round(out * 128 + 127.5), 0, 255).astype(np.uint8
                                                        ).tofile(spurred)

    src = sources.RawFileSource(str(spurred))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  notch_spur=True, use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=5)

    assert stats.state == "locked", stats
    assert rx.spur is not None and rx.spur["amp"] != 0j
    # the tracker must have found the spur's frequency and amplitude
    assert abs(rx.spur["omega"] - omega_true) < 1e-5, rx.spur
    want_amp = 0.75 * spur_amp
    assert abs(abs(rx.spur["amp"]) - want_amp) < 0.3 * want_amp, rx.spur
    assert stats.bch_dirty == 0, stats
    got, sync = sink.data.tobytes(), ts_in.tobytes()
    idx = sync.find(got[:376])
    assert idx >= 0 and got == sync[idx:idx + len(got)]


@pytest.mark.slow
def test_stream_saturated_llr_regime(tmp_path):
    """High-SNR, high-order streaming: at >30 dB the demapper saturates
    LLRs, the regime where the round-2 stuck-bit defect lived (a wrong bit
    with intrinsic above its extrinsic capacity was uncorrectable; see
    BENCH.md).  256QAM through the full front end must decode clean."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM256,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=2,
                              num_t2_frames=7))
    n_pkts = 9 * 2 * (plp.k_bch // 8 - 10) // 188
    ts = random_ts_stream(n_pkts, seed=77)
    dev = impair(tx.modulate(ts), ChannelConfig(device_rate=10e6,
                                                cfo_hz=4e3, snr_db=33.0,
                                                seed=8))
    path = tmp_path / "sat_0_10000000_16.raw"
    quantize(dev, "s16", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=4)
    assert stats.state == "locked", stats
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats
    assert stats.snr_db > 28
    got, sync = sink.data.tobytes(), ts.tobytes()
    idx = sync.find(got[:376])
    assert idx >= 0
    n = min(len(got), len(sync) - idx)
    assert got[:n] == sync[idx:idx + n]


@pytest.mark.slow
def test_stream_fef_mixed_capture(tmp_path):
    """Mixed T2+FEF stream (EN 302 755 clause 8.4): the capture OPENS with
    a FEF part (so the earliest strong P1 carries a non-T2 S1 that
    acquisition must recognise and skip) and another FEF part follows
    every 2nd T2 frame.  The receiver hops the gaps by L1 FRAME_IDX
    arithmetic mid-batch and recovers the TS exactly.  The reference
    parses the FEF L1 fields but has no FEF handling in its demodulator
    at all (its L1 decode would fail on the first post-FEF frame)."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    n_frames, fef_len = 8, 3 * 2048 + 1234
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames,
                              fef_interval=2, fef_length=fef_len))
    assert tx.l1_pre.s2_field2 == 1
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188
    ts = random_ts_stream(n_pkts, seed=21)
    iq = tx.modulate(ts)
    fs = mode.frame_samples
    # modulate emits as many frames as TS data allows; whatever the count,
    # the FEF geometry must hold: one fef_len gap per 2 frames
    n_tx = next(n for n in range(1, 32)
                if n * fs + (n // 2) * fef_len == len(iq))
    assert n_tx >= n_frames
    iq = np.concatenate([tx.build_fef_part(), iq])

    device_rate = 10_000_000
    dev = impair(iq, ChannelConfig(device_rate=device_rate, cfo_hz=9e3,
                                   sro_ppm=11.0, snr_db=27.0, phase0=0.4,
                                   seed=6))
    raw = quantize(dev, "u8", scale=0.4)
    path = tmp_path / f"capture_dvbt2_fef_0_{device_rate}_8.raw"
    raw.tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=3,
                                  acq_elem_samples=4 * fs + 2 * fef_len,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=6)

    assert stats.state == "locked", stats
    assert rx._fef == (2, fef_len)
    assert stats.frames >= 6
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats
    assert abs(stats.cfo_hz - 9e3) < 500, stats.cfo_hz

    sync, got = ts.tobytes(), sink.data.tobytes()
    idx = sync.find(got[:188 * 2])
    assert idx >= 0, "recovered TS not found in transmitted stream"
    n = min(len(got), len(sync) - idx)
    assert n > 188 * 40
    assert got[:n] == sync[idx:idx + n]


@pytest.mark.slow
def test_l1_repetition_stream_and_fallback(tmp_path):
    """L1 repetition (EN 302 755 clause 7.2.3.1): the TX appends the next
    frame's L1-dynamic block (the L1-post grows; blind acquisition must
    size it from L1-pre), the stream decodes TS-exact, and when one
    batch's L1 read is knocked out the tracker repairs the dynamic
    configuration from the previous batch's dyn_next instead of
    counting a blind error."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    n_frames = 9
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames, l1_repetition=True))
    assert tx.l1_pre.l1_repetition_flag == 1
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    ts = random_ts_stream((n_frames + 2) * bytes_per_frame // 188, seed=6)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10_000_000, cfo_hz=12e3,
                                   sro_ppm=9.0, snr_db=26.0, seed=5))
    path = tmp_path / "capture_dvbt2_l1rep_0_10000000_8.raw"
    quantize(dev, "u8", scale=0.4).tofile(path)

    src = sources.RawFileSource(str(path))
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=3)
    assert stats.state == "locked", stats
    assert rx._l1_dyn_next is not None          # repetition is being read

    # knock out ONE batch's L1 read: the repair path must kick in
    orig = rx.rx.l1_cells
    calls = {"n": 0}

    def flaky(plane):
        if calls["n"] == 0:
            calls["n"] += 1
            # the sanctioned erasure signal (round-4 exception scoping)
            from sdr_receiver_dvb_t2_tpu.params.l1 import L1DecodeError
            raise L1DecodeError("injected L1 fade")
        return orig(plane)

    rx.rx.l1_cells = flaky
    assert rx.step_batch()
    assert getattr(rx, "_l1_dyn_repaired", 0) == 1
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
