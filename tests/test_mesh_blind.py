"""Blind acquisition onto the mesh (VERDICT round-2 missing #2): the pod
path must cold-start from raw IQ alone — P1 search, CFO, GI/L1 scan —
with NO impairment-model arithmetic anywhere in the setup."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                        TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import ChannelConfig, impair
from sdr_receiver_dvb_t2_tpu.io.bbframe import BBFrameParser
from sdr_receiver_dvb_t2_tpu.parallel import acquire, pod, sharding
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


def _setup(n_frames):
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    return mode, plp, tx


@pytest.mark.slow
def test_blind_acquire_to_mesh_stream():
    """Two channels with different unknown timing offsets and CFOs: blind
    acquisition derives per-channel pos0/mu0/freq, then the tracked mesh
    stream decodes both TS-exact."""
    mode, plp, _tx = _setup(1)
    device_rate = 10e6
    n_frames = 14
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188

    rng = np.random.default_rng(5)
    rows, ts_in = [], []
    imps = [(70.0, 2.0, 1311), (-110.0, -2.5, 2897)]  # cfo, sro, offset
    for c, (cfo_hz, sro_ppm, off) in enumerate(imps):
        ts = random_ts_stream(n_pkts, seed=900 + c)
        tx_c = Transmitter(TxConfig(mode=mode, plp=plp,
                                    fec_blocks_per_frame=4,
                                    num_t2_frames=n_frames))
        dev = impair(tx_c.modulate(ts),
                     ChannelConfig(device_rate=device_rate, snr_db=30.0,
                                   cfo_hz=cfo_hz, sro_ppm=sro_ppm,
                                   seed=40 + c))
        # unknown per-channel delay: noise-only preamble of `off` samples
        pre = (0.003 * (rng.standard_normal(off)
                        + 1j * rng.standard_normal(off))).astype(np.complex64)
        rows.append(np.concatenate([pre, dev]))
        ts_in.append(ts)
    n_min = min(len(r) for r in rows)
    raw = np.stack([r[:n_min] for r in rows])

    lock = acquire.blind_acquire(raw, device_rate)
    assert lock is not None, "blind acquisition failed"
    assert lock.cfg.mode.fft_mode == mode.fft_mode
    assert lock.cfg.plp.code_rate == plp.code_rate
    assert lock.cfg.n_fec_per_frame == 4
    # the two channels were offset differently -> different pos0
    assert lock.pos0[0] != lock.pos0[1]
    # CFO seeds must carry the right sign per channel
    from sdr_receiver_dvb_t2_tpu.params.modes import SAMPLE_RATE
    step = lock.step
    cfo_seed_hz = lock.freq * (SAMPLE_RATE * 2 * step) / (2 * np.pi) / (
        2 * step)
    assert cfo_seed_hz[0] > 20 and cfo_seed_hz[1] < -20, cfo_seed_hz

    mesh = sharding.make_mesh(2, 1)
    rx = pod.MultiChannelReceiver(lock.cfg, mesh)
    aligned = lock.aligned(raw)
    steps = list(rx.stream(aligned, lock.mu0, step, freq=lock.freq,
                           max_steps=10, track=True))
    assert len(steps) == 10
    dirty = [int(s["bch_dirty"]) for _, s in steps]
    # P1-seeded CFO means lock from the very first steps; allow settling
    assert sum(dirty[2:]) == 0, dirty

    for c in range(2):
        bb = BBFrameParser()
        chunks = []
        for hard, _ in steps[2:]:
            for f in range(hard.shape[1]):
                for i in range(4):
                    chunks.append(bb.parse(np.asarray(
                        hard[c, f, i, :plp.k_bch]).astype(np.uint8)))
        ts_out = np.concatenate([x for x in chunks if len(x)])
        got, sync = ts_out.tobytes(), ts_in[c].tobytes()
        at = sync.find(got[:376])
        assert at >= 0 and got == sync[at:at + len(got)], c


def test_frontend_elem_matches_mesh_convention():
    """frontend_elem's elementary grid must equal the sharded front end's:
    feeding the analytically-aligned mu reproduces the capture's frame
    start at elementary sample 0 (cross-check against the convention the
    existing sharded tests derive)."""
    mode, plp, tx = _setup(1)
    device_rate = 10e6
    from sdr_receiver_dvb_t2_tpu.params.modes import SAMPLE_RATE
    from sdr_receiver_dvb_t2_tpu.ops import frontend as fe
    step = device_rate / (2 * SAMPLE_RATE)
    ts = random_ts_stream(40, seed=1)
    dev = impair(tx.modulate(ts), ChannelConfig(device_rate=device_rate,
                                                snr_db=35.0, seed=2))
    # analytic alignment from the sharded tests (test_sharded.py)
    ratio = SAMPLE_RATE / device_rate
    n_taps = len(fe.fir_taps("medium"))
    mu_analytic = ((n_taps - 1) / 4.0 - 1.0) / ratio
    # shift into frontend_elem's valid band by whole raw samples
    shift = int(np.ceil((acquire._MU_LO + 0.5 - mu_analytic)))
    pad = np.zeros(shift, np.complex64)
    elem = acquire.frontend_elem(np.concatenate([pad, dev]),
                                 mu_analytic + shift, step, 0.0, 4096)
    # elementary sample 0 is the frame start = P1 start; its detector
    # must fire at (near) zero
    from sdr_receiver_dvb_t2_tpu.ops import p1_detect, cplx
    t0, peak, _ = p1_detect.detect(cplx.from_np(elem))
    assert float(peak) > 0.5
    assert abs(int(t0)) <= 2, int(t0)
