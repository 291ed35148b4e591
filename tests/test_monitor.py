"""Live in-run monitor (VERDICT r4 next #6): the reference GUI's four
views (spectrum / constellation / LDPC histogram / L1 text,
main_window.cpp:416-476) as a periodically refreshed terminal panel that
can be watched while the receiver runs."""
import io

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.runtime import monitor as mon_mod


def test_sparkline_shapes_and_range():
    s = mon_mod.sparkline(np.linspace(0, 1, 300), width=64)
    assert len(s) == 64
    assert s[0] == " " and s[-1] == "█"
    # constant input must not divide by zero
    s2 = mon_mod.sparkline(np.ones(10), width=10)
    assert len(s2) == 10


def test_scatter_grid_density():
    rng = np.random.default_rng(0)
    # a QPSK-ish cloud: four corners must be the densest character cells
    pts = (np.sign(rng.standard_normal(4000))
           + 1j * np.sign(rng.standard_normal(4000))
           + 0.05 * (rng.standard_normal(4000)
                     + 1j * rng.standard_normal(4000)))
    grid = mon_mod.scatter_grid(pts, width=40, height=21)
    assert len(grid) == 21 and all(len(g) == 40 for g in grid)
    joined = "".join(grid)
    assert "@" in joined                     # dense cluster present
    assert joined.count(" ") > len(joined) // 2   # mostly empty
    # empty input renders blanks, not an exception
    assert mon_mod.scatter_grid(np.empty(0, complex))[0].strip() == ""


def test_hist_bars():
    bars = mon_mod.hist_bars(np.array([0, 5, 0, 1]))
    assert len(bars) == 2
    assert bars[0].strip().startswith("1 iters")
    assert "5" in bars[0] and "1" in bars[1]
    assert mon_mod.hist_bars(np.zeros(4))[0].strip().startswith("(no ")


def test_pod_monitor_render():
    pm = mon_mod.PodMonitor(interval=0.0, out=io.StringIO(), clear=False)
    stats = dict(snr_db=21.5, alive=np.array([True, False]),
                 snr_db_ch=np.array([21.5, 0.0]),
                 bch_dirty_ch=np.array([0, 7]),
                 relock_fail=np.array([0, 3]),
                 events=["relock: ch1 exhausted 3 blind searches"])
    assert pm.maybe_render(stats, np.array([120, 0]), 5)
    panel = pm.out.getvalue()
    assert "alive=1/2" in panel
    assert "DOWN" in panel and "up" in panel
    assert "exhausted" in panel
    assert "pod snr" in panel
    # interval gating: an immediate second call with interval>0 skips
    pm2 = mon_mod.PodMonitor(interval=3600.0, out=io.StringIO(),
                             clear=False)
    assert pm2.maybe_render(stats, np.array([1, 1]), 0)
    assert not pm2.maybe_render(stats, np.array([1, 1]), 1)
    assert len(pm2.snr_history) == 2         # history still accumulates


@pytest.mark.slow
def test_monitor_live_receiver(tmp_path):
    """Full loop: the panel renders from a RUNNING StreamingReceiver with
    all four views populated, and the receive output stays TS-exact."""
    from tests.test_stream_e2e import _make_capture
    from sdr_receiver_dvb_t2_tpu.io import sources, sinks
    from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod

    path, ts_in, mode = _make_capture(tmp_path, n_frames=6)
    src = sources.RawFileSource(path)
    sink = sinks.BufferTsSink()
    cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                  acq_elem_samples=3 * mode.frame_samples,
                                  use_pallas=False)
    rx = stream_mod.StreamingReceiver(src, sink, cfg)
    assert rx.acquire(), rx.stats.state
    buf = io.StringIO()
    npz = tmp_path / "mon.npz"
    mon = mon_mod.Monitor(interval=0.0, out=buf, clear=False,
                          npz_path=str(npz))
    n = 0
    while rx.step_batch() and n < 3:
        assert mon.maybe_render(rx)
        n += 1
    panel = buf.getvalue()
    for token in ("spectrum", "constellation", "ldpc:", "L1:", "PLP 0",
                  "snr=", "cfo="):
        assert token in panel, token
    z = np.load(npz)
    assert {"spectrum_db", "constellation", "ldpc_hist"} <= set(z.files)
    assert len(z["constellation"]) > 100
    got = sink.data.tobytes()
    at = ts_in.tobytes().find(got[:376])
    assert at >= 0 and got == ts_in.tobytes()[at:at + len(got)]
