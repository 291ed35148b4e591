"""SFN multipath: blind reception through a strong in-guard echo.

DVB-T2's defining deployment is the single-frequency network, where a
second transmitter appears as a ~0 dB echo delayed by up to the guard
interval (EN 302 755 clause 9.1; the GI exists for exactly this).  The
reference receiver handles this implicitly through its per-carrier
channel interpolation (data_symbol.cpp); here the banded-matmul
interpolation plan (ops/rx_chain.equalize_plane) must resolve the deep
frequency-selective nulls a near-0 dB echo carves, and the LDPC code
must absorb the erased carriers.
"""
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

MODE = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
              pilot_pattern=PilotPattern.PP3, extended_carriers=False,
              n_data_symbols=30)
PLP = PlpConfig(constellation=Constellation.QAM16, code_rate=CodeRate.C1_2,
                fec_frame=FecFrame.SHORT, rotation=True, time_il_length=1)


def _sfn_capture(tmp_path, echoes, n_frames=8, snr_db=24.0, cfo_hz=9e3,
                 sro_ppm=8.0, mode=MODE):
    tx = Transmitter(TxConfig(mode=mode, plp=PLP, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    bytes_per_frame = 4 * (PLP.k_bch // 8 - 10)
    ts = random_ts_stream((n_frames + 2) * bytes_per_frame // 188, seed=17)
    iq = tx.modulate(ts)
    dev = impair(iq, ChannelConfig(device_rate=10_000_000, cfo_hz=cfo_hz,
                                   sro_ppm=sro_ppm, snr_db=snr_db,
                                   echoes=echoes, seed=9))
    path = tmp_path / "capture_dvbt2_sfn_0_10000000_8.raw"
    quantize(dev, "u8", scale=0.35).tofile(path)
    return str(path), ts


def _run_blind(path, max_frames=5, mode=MODE):
    src = sources.RawFileSource(path)
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    stats = rx.run(max_frames=max_frames)
    return stats, sink.data.tobytes(), rx


def _assert_ts_match(ts_in, got, min_pkts):
    sync = ts_in.tobytes()
    idx = sync.find(got[:188 * 2])
    assert idx >= 0, "recovered TS not found in transmitted stream"
    n = min(len(got), len(sync) - idx)
    assert n > 188 * min_pkts
    assert got[:n] == sync[idx:idx + n]


def test_wiener_interp_resolves_guard_length_echo():
    """The banded-matmul Wiener rows (ops/rx_chain._banded_interp_weights)
    must estimate a two-path 0 dB channel to better than -30 dB — linear
    weights collapse to ~0 dB here (the echo rotates H(k) by ~3.7 rad
    between union-grid pilots)."""
    import jax.numpy as jnp
    from sdr_receiver_dvb_t2_tpu.params import pilots
    from sdr_receiver_dvb_t2_tpu.ops import rx_chain
    from sdr_receiver_dvb_t2_tpu.ops.cplx import C

    eq = rx_chain.get_eq_tables(MODE)
    assert eq.ph_rot is not None          # mode is SFN-gated
    L, K = MODE.frame_symbols, MODE.k_total
    rng = np.random.default_rng(0)
    k = np.arange(K)
    H = 1.0 + 1.0j * np.exp(-2j * np.pi * k * 200 / MODE.fft_size)
    plane = np.empty((L, K), np.complex128)
    ep = eq.eq_plan
    for l in range(L):
        x = rng.standard_normal(K) + 1j * rng.standard_normal(K)
        x /= np.abs(x)
        n = int(ep.n_pilots[l])
        pidx = np.asarray(ep.pilot_idx[l][:n])
        x[pidx] = pilots.reference_symbol(MODE, l)[pidx]
        plane[l] = H * x
    plane += (rng.standard_normal((L, K)) + 1j
              * rng.standard_normal((L, K))) * np.sqrt(10 ** -3.0 / 2)

    carriers = C(jnp.asarray(plane.real, jnp.float32),
                 jnp.asarray(plane.imag, jnp.float32))
    packed = rx_chain._pack_bf16(carriers).reshape(-1)
    h_d = rx_chain._grouped_interp(packed, eq.device_consts()["w"],
                                   eq.group_syms, eq.regroup, K)
    est = np.asarray(h_d.re) + 1j * np.asarray(h_d.im)
    err = est[4:L - 4] - H[None]
    mse = np.mean(np.abs(err) ** 2) / np.mean(np.abs(H) ** 2)
    assert 10 * np.log10(mse) < -30.0, 10 * np.log10(mse)


@pytest.mark.slow
def test_sfn_0db_echo_blind_stream(tmp_path):
    """A 0 dB echo at 78% of the guard interval (two equidistant-ish SFN
    transmitters): blind lock, clean LDPC, bit-exact TS."""
    # GI 1/8 at 2K = 256 elementary samples; PP3 (Dx=6) supports delay
    # spread to Tu/6 = 341, so 200 is inside both limits.
    path, ts = _sfn_capture(tmp_path, echoes=((0, 1.0), (200, 1.0j)))
    stats, got, _ = _run_blind(path)
    assert stats.state == "locked", stats
    assert stats.ldpc_failures == 0, stats
    assert stats.bch_dirty == 0, stats
    _assert_ts_match(ts, got, 20)


MODE_UNGATED = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_32,
                      pilot_pattern=PilotPattern.PP4, extended_carriers=False,
                      n_data_symbols=30)


@pytest.mark.slow
def test_sfn_escalation_on_reach_ungated_mode(tmp_path):
    """A mode whose pilot reach covers the guard (2K G1/32 PP4: reach 85
    vs guard 64) defaults to cheap linear rows — but an in-guard echo at
    56 samples rotates H(k) by 4.1 rad between scattered pilots, so the
    acquisition-time delay-spread measurement must force the Wiener plan
    (RxConfig.sfn).  Guards both directions: the echo capture decodes
    TS-exact with sfn=True, and a clean capture keeps the linear plan
    (sfn=False, no ph_rot) so the 32K bench path never pays for SFN."""
    path, ts = _sfn_capture(tmp_path, echoes=((0, 1.0), (56, 0.95j)),
                            mode=MODE_UNGATED)
    stats, got, rx = _run_blind(path, mode=MODE_UNGATED)
    assert stats.state == "locked", stats
    assert rx.rx.cfg.sfn, "delay-spread measurement did not escalate"
    assert rx.rx._plan.eq.ph_rot is not None
    assert stats.ldpc_failures == 0, stats
    _assert_ts_match(ts, got, 20)

    clean, ts2 = _sfn_capture(tmp_path, echoes=(), mode=MODE_UNGATED)
    stats2, got2, rx2 = _run_blind(clean, mode=MODE_UNGATED)
    assert stats2.state == "locked", stats2
    assert not rx2.rx.cfg.sfn, "clean channel escalated spuriously"
    assert rx2.rx._plan.eq.ph_rot is None
    assert stats2.ldpc_failures == 0, stats2
    _assert_ts_match(ts2, got2, 20)


@pytest.mark.slow
def test_mesh_blind_acquire_escalates_sfn():
    """parallel.acquire.blind_acquire carries the delay-spread decision
    onto the mesh: ONE channel with long echoes forces the pod's shared
    chain plan (SPMD — one plan serves every channel) onto the Wiener
    rows, and an all-clean capture keeps the linear plan."""
    from sdr_receiver_dvb_t2_tpu.parallel import acquire as pacq
    mode = MODE_UNGATED
    n_frames = 6
    bytes_per_frame = 4 * (PLP.k_bch // 8 - 10)

    def channel(seed, echoes):
        ts = random_ts_stream((n_frames + 2) * bytes_per_frame // 188,
                              seed=seed)
        tx = Transmitter(TxConfig(mode=mode, plp=PLP,
                                  fec_blocks_per_frame=4,
                                  num_t2_frames=n_frames))
        return impair(tx.modulate(ts),
                      ChannelConfig(device_rate=10e6, snr_db=28.0,
                                    cfo_hz=3e3, sro_ppm=2.0,
                                    echoes=echoes, seed=seed))

    clean = channel(61, ())
    echoed = channel(62, ((0, 1.0), (56, 0.95j)))
    n = min(len(clean), len(echoed))
    lock = pacq.blind_acquire(np.stack([clean[:n], echoed[:n]]), 10e6)
    assert lock is not None, "blind acquisition failed"
    assert lock.cfg.sfn, "echoed channel did not escalate the pod plan"

    lock2 = pacq.blind_acquire(np.stack([clean[:n], clean[:n]]), 10e6)
    assert lock2 is not None
    assert not lock2.cfg.sfn, "clean pod escalated spuriously"


@pytest.mark.slow
def test_sfn_echo_appears_midstream(tmp_path):
    """A second transmitter joining the SFN while the receiver is locked
    with the cheap linear plan: the batches go dead (nothing decodes),
    the dead-batch watchdog forces a relock, re-acquisition re-measures
    the delay spread, escalates to the Wiener plan, and the stream
    recovers — the documented escalation chain, end to end."""
    mode = MODE_UNGATED
    n_frames = 14
    tx = Transmitter(TxConfig(mode=mode, plp=PLP, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    bytes_per_frame = 4 * (PLP.k_bch // 8 - 10)
    ts = random_ts_stream((n_frames + 2) * bytes_per_frame // 188, seed=41)
    iq = tx.modulate(ts)
    taps = np.zeros(57, np.complex128)
    taps[0], taps[56] = 1.0, 0.95j
    onset = 6 * mode.frame_samples          # echo turns on mid-frame-6
    ech = np.convolve(iq, taps)[:len(iq)]
    iq = np.concatenate([iq[:onset], ech[onset:]])
    dev = impair(iq, ChannelConfig(device_rate=10_000_000, cfo_hz=9e3,
                                   sro_ppm=8.0, snr_db=24.0, seed=9))
    path = tmp_path / "capture_dvbt2_sfn_0_10000000_8.raw"
    quantize(dev, "u8", scale=0.35).tofile(path)

    stats, got, rx = _run_blind(str(path), max_frames=11, mode=mode)
    assert stats.state == "locked", stats
    assert rx.rx.cfg.sfn, "relock did not escalate to the Wiener plan"
    sync = ts.tobytes()
    # pre-echo head decoded exact (the transition batch may emit
    # TEI-flagged packets before the dead-batch watchdog fires)...
    at = sync.find(got[:376])
    assert at >= 0, "recovered TS not found in transmitted stream"
    head = got[:188 * 15]
    assert sync[at:at + len(head)] == head
    # ...and the post-relock tail decodes exact again
    tail = got[-188 * 8:]
    at = sync.find(tail[:376])
    assert at >= 0, "post-relock TS not found in transmitted stream"
    assert sync[at:at + len(tail)] == tail


@pytest.mark.slow
def test_sfn_pre_echo_blind_stream(tmp_path):
    """A -2 dB PRE-echo (the receiver syncs to the weaker, later path at
    t=0 power-wise; classic SFN corner case) plus a third path."""
    path, ts = _sfn_capture(
        tmp_path,
        echoes=((0, 0.79), (60, 1.0 * np.exp(1j * 2.0)),
                (150, 0.35 * np.exp(-1j * 0.7))),
        snr_db=22.0)
    stats, got, _ = _run_blind(path)
    assert stats.state == "locked", stats
    assert stats.ldpc_failures == 0, stats
    _assert_ts_match(ts, got, 20)
