"""Auxiliary runtime pieces: diagnostics exporters, AGC stepper, sinks."""
import numpy as np

from sdr_receiver_dvb_t2_tpu.runtime import diagnostics, agc
from sdr_receiver_dvb_t2_tpu.io import sinks


def test_power_spectrum_peaks_at_tone():
    n = 1 << 14
    fs = 10e6
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * 1.25e6 * t).astype(np.complex64)
    freqs, db = diagnostics.power_spectrum(iq, nfft=4096, sample_rate=fs)
    assert abs(freqs[np.argmax(db)] - 1.25e6) < fs / 4096 * 2


def test_constellation_subsamples():
    cells = np.arange(100000, dtype=np.complex64)
    out = diagnostics.constellation(cells, max_points=1000)
    assert len(out) == 1000 and out[0] == 0 and out[-1] == cells[-1]


def test_ldpc_stats_histogram():
    st = diagnostics.LdpcStats(max_iters=15, period=8)
    for _ in range(2):
        st.update(3, np.array([True, True, False, True]))
    assert st.hist[3] == 8 and st.failures == 2 and st.total == 8
    assert "25.00% failed" in st.summary()
    assert st.maybe_report() is not None


class _FakeSdr:
    def __init__(self):
        self.gain = 20.0
        self.calls = []

    def gain_min(self):
        return 0.0

    def gain_max(self):
        return 40.0

    def set_gain_db(self, g):
        self.gain = g
        self.calls.append(g)


def test_agc_steps_with_hysteresis():
    src = _FakeSdr()
    a = agc.Agc(src, agc.AgcConfig(settle_s=0.0))
    assert a.enabled and src.gain == 20.0
    assert a.update(0.5) == 19.0          # too hot -> step down
    assert a.update(0.2) is None          # in window -> hold
    assert a.update(0.01) == 20.0         # too cold -> step up


def test_agc_disabled_for_files():
    class NoGain:
        pass
    a = agc.Agc(NoGain())
    assert not a.enabled and a.update(0.9) is None


def test_udp_sink_chunks(tmp_path):
    import socket
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    sink = sinks.UdpTsSink("127.0.0.1", port)
    data = np.arange(188 * 15 % 256, dtype=np.uint8)
    data = np.resize(np.arange(256, dtype=np.uint8), 188 * 15)
    sink.write(data)
    got = b""
    for _ in range(2):
        got += rx.recv(65536)
    assert len(got) == 188 * 14            # two 7-packet datagrams
    sink.close()                           # flushes the remainder
    got += rx.recv(65536)
    assert got == data.tobytes()
    rx.close()


def test_threaded_source_roundtrip(tmp_path):
    from sdr_receiver_dvb_t2_tpu.io import sources
    rng = np.random.default_rng(0)
    # multiple of the ingest block: RawFileSource drops a partial tail
    raw = rng.integers(0, 256, 2 * 18 * (1 << 14), dtype=np.uint8)
    path = tmp_path / "x_1000000_8.raw"
    raw.tofile(path)
    src = sources.ThreadedSource(sources.RawFileSource(str(path)),
                                 block_samples=1 << 14)
    got = []
    while True:
        blk = src.read(50_000)
        if blk is None:
            break
        got.append(blk)
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, raw[:len(out)])
    assert len(out) == len(raw)
    assert src.dropped_samples == 0
    src.close()


def test_plot_dumps_renders_png(tmp_path):
    """tools/plot_dumps.py: the reference's plot views render from a
    --dump-constellation NPZ without a display."""
    import importlib.util
    from pathlib import Path
    import numpy as np
    spec = importlib.util.spec_from_file_location(
        "plot_dumps", Path(__file__).resolve().parent.parent
        / "tools" / "plot_dumps.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.default_rng(2)
    npz = tmp_path / "d.npz"
    np.savez(npz,
             frame_iq=(rng.standard_normal(5000)
                       + 1j * rng.standard_normal(5000)),
             spectrum=np.fft.fft(rng.standard_normal(512)),
             constellation=(rng.standard_normal(3000)
                            + 1j * rng.standard_normal(3000)),
             p1_metric=rng.random(2048))
    out = tmp_path / "d.png"
    assert mod.render(str(npz), str(out), show=False) == 0
    assert out.stat().st_size > 10000
