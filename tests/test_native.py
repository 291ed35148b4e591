"""Native C++ runtime vs the pure-Python reference implementations."""
import threading

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import bbframe, native

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no C++ toolchain available")


def _frames(hem, n_pkts=60, k_bch=7032, seed=0):
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    ts = random_ts_stream(n_pkts, seed=seed)
    packer = bbframe.BBFramePacker(k_bch=k_bch, hem=hem)
    return ts, packer.pack(ts)


@pytest.mark.parametrize("hem", [True, False])
def test_native_parser_matches_python(hem):
    ts, frames = _frames(hem)
    py = bbframe.BBFrameParser()
    nat = native.NativeBBFrameParser()
    out_py, out_nat = [], []
    for f in frames:
        out_py.append(py.parse(f))
        out_nat.append(nat.parse(f))
    a = np.concatenate(out_py)
    b = np.concatenate(out_nat)
    np.testing.assert_array_equal(a, b)
    assert nat.mode_hem == hem
    assert nat.header_errors == 0
    # round trip against the original TS
    got, sync = b.tobytes(), ts.tobytes()
    idx = sync.find(got[:376])
    assert idx >= 0 and got == sync[idx:idx + len(got)]


def test_native_parser_resync_on_corruption(hem=True):
    _ts, frames = _frames(hem, n_pkts=120)
    nat = native.NativeBBFrameParser()
    py = bbframe.BBFrameParser()
    for i, f in enumerate(frames):
        g = f.copy()
        if i == 2:
            g[:40] ^= 1                       # destroy the header
        a, b = py.parse(g), nat.parse(g)
        np.testing.assert_array_equal(a, b)
    assert nat.header_errors == 1
    assert py.header_errors == 1


def test_crc8_bytes_matches():
    rng = np.random.default_rng(0)
    lib = native.load()
    for n in (1, 7, 187, 1024):
        data = rng.integers(0, 256, n, dtype=np.uint8)
        got = lib.dvbt2_crc8_bytes(native._as_u8p(data), n)
        assert got == bbframe.crc8_bytes(data)


def test_iq_ring_spsc():
    ring = native.IqRing(1 << 16)
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, 1 << 18, dtype=np.uint8)
    out = []

    def producer():
        pos = 0
        while pos < len(src):
            blk = src[pos:pos + 4096]
            if ring.push(blk):
                pos += len(blk)

    t = threading.Thread(target=producer)
    t.start()
    got = 0
    while got < len(src):
        blk = ring.pop(8192)
        if len(blk):
            out.append(blk)
            got += len(blk)
    t.join()
    np.testing.assert_array_equal(np.concatenate(out), src)
    assert ring.fill == 0


def test_iq_ring_overrun_drops():
    ring = native.IqRing(1024)
    blk = np.zeros(800, dtype=np.uint8)
    assert ring.push(blk)
    assert not ring.push(blk)         # would overflow -> dropped
    assert ring.dropped == 800
