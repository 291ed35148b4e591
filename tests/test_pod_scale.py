"""BASELINE pod-scale configuration: 64 concurrent RF channels decoding
in lockstep on one mesh (channels-per-chip layout, parallel/pod.py).

The real deployment puts 64 channels on 64 chips (pod.pod_64ch_mesh); the
CPU CI host has 8 virtual devices, so this runs the SAME sharded program
with 8 channels per device — the sharding, per-channel tracking state,
and host fan-in/fan-out code paths are identical, only the device count
differs.  Every channel gets its own timing offset, CFO and noise;
acquisition is fully blind per channel (parallel/acquire)."""
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

N_CH = 64


def test_pod_64ch_mesh_needs_64_devices():
    """pod_64ch_mesh is the 64-chip layout; on fewer devices it must say
    so instead of silently shrinking the configuration."""
    with pytest.raises(ValueError, match="64 devices"):
        pod.pod_64ch_mesh()


@pytest.mark.slow
def test_pod_64_concurrent_channels_blind():
    """64 channels, each with independent delay/CFO/noise, blind-acquired
    and streamed with per-channel tracking: all decode TS-exact."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    device_rate = 10e6
    n_frames = 5
    bytes_per_frame = 4 * (plp.k_bch // 8 - 10)
    n_pkts = (n_frames + 2) * bytes_per_frame // 188
    ts = random_ts_stream(n_pkts, seed=77)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    clean = tx.modulate(ts)

    rng = np.random.default_rng(9)
    offs = rng.integers(100, 4000, N_CH)
    cfos = np.linspace(-180.0, 180.0, N_CH)
    rows = []
    for c in range(N_CH):
        dev = impair(clean, ChannelConfig(device_rate=device_rate,
                                          snr_db=30.0, cfo_hz=float(cfos[c]),
                                          seed=500 + c))
        pre = (0.003 * (rng.standard_normal(offs[c])
                        + 1j * rng.standard_normal(offs[c])
                        )).astype(np.complex64)
        rows.append(np.concatenate([pre, dev]))
    n_min = min(len(r) for r in rows)
    raw = np.stack([r[:n_min] for r in rows])

    # blind per-channel acquisition (head bounded: offsets + ~2 frames)
    lock = acquire.blind_acquire(raw, device_rate, head_elem=260_000)
    assert lock is not None, "blind acquisition failed"
    assert lock.cfg.mode.fft_mode == mode.fft_mode
    assert len(np.unique(lock.pos0)) > 32      # channels truly independent

    mesh = sharding.make_mesh(8, 1)            # 64 ch over 8 devices
    rx = pod.MultiChannelReceiver(lock.cfg, mesh)
    aligned = lock.aligned(raw)
    steps = list(rx.stream(aligned, lock.mu0, lock.step, freq=lock.freq,
                           max_steps=3, track=True))
    assert len(steps) == 3
    dirty = [int(s["bch_dirty"]) for _, s in steps]
    assert sum(dirty[1:]) == 0, dirty

    # the blind per-channel CFO seeds follow each channel's own LO error,
    # and the tracked state stays per-channel shaped
    seed_hz = lock.freq * device_rate / (2 * np.pi)
    strong = np.abs(cfos) > 60
    assert (np.sign(seed_hz[strong]) == np.sign(cfos[strong])).all()
    assert np.abs(seed_hz - cfos).max() < 60.0, seed_hz - cfos
    assert np.asarray(steps[-1][1]["cfo_hz_applied"]).shape == (N_CH,)

    # every channel's TS must round-trip
    for c in range(0, N_CH, 7):
        bb = BBFrameParser()
        chunks = []
        for hard, _ in steps[1:]:
            for f in range(hard.shape[1]):
                for i in range(4):
                    chunks.append(bb.parse(np.asarray(
                        hard[c, f, i, :plp.k_bch]).astype(np.uint8)))
        ts_out = np.concatenate([x for x in chunks if len(x)])
        got, sync = ts_out.tobytes(), ts.tobytes()
        at = sync.find(got[:376])
        assert at >= 0 and got == sync[at:at + len(got)], c
