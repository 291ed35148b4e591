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


def _set_syncd_ffff(frame_bits):
    """Rewrite a packed frame's SYNCD to 0xFFFF (recomputing the MODE/CRC)."""
    from sdr_receiver_dvb_t2_tpu.params import prbs
    bits = frame_bits ^ prbs.bb_scrambler(len(frame_bits))
    bits[56:72] = 1
    mode = bbframe._mode_field(bits[:72], hem=True)
    bits[72:80] = np.unpackbits(np.uint8(mode))
    return bits ^ prbs.bb_scrambler(len(bits))


def test_continuation_frame_syncd_ffff():
    """SYNCD=0xFFFF (no UP start) must extend the stream, not drop data.

    When the receiver is already aligned, a continuation-marked frame must
    produce the same output as the normally-marked one."""
    _ts, frames = _frames(hem=True, n_pkts=120)
    for parser_cls in (bbframe.BBFrameParser, native.NativeBBFrameParser):
        ref, alt = parser_cls(), parser_cls()
        out_ref = [ref.parse(f) for f in frames]
        patched = [frames[0]] + [_set_syncd_ffff(f.copy()) for f in frames[1:]]
        out_alt = [alt.parse(f) for f in patched]
        np.testing.assert_array_equal(np.concatenate(out_ref),
                                      np.concatenate(out_alt))
        assert alt.crc_errors == 0


def test_nm_crc_chain_rearms_after_resync():
    """After a resync, the NM CRC chain must re-arm: the first recovered
    packet is unverifiable and must NOT be TEI-flagged."""
    ts, frames = _frames(hem=False, n_pkts=200)
    for parser_cls in (bbframe.BBFrameParser, native.NativeBBFrameParser):
        parser = parser_cls()
        out = []
        for i, f in enumerate(frames):
            g = f.copy()
            if i == 3:
                g[:40] ^= 1                 # kill one frame's header
            out.append(parser.parse(g))
        ts_out = np.concatenate([o for o in out if len(o)])
        pkts = ts_out.reshape(-1, 188)
        assert not np.any(pkts[:, 1] & 0x80), parser_cls.__name__


def test_parser_fuzz_no_crash():
    """Random garbage frames must never crash or emit partial packets."""
    rng = np.random.default_rng(123)
    for parser_cls in (bbframe.BBFrameParser, native.NativeBBFrameParser):
        parser = parser_cls()
        for _ in range(60):
            n = int(rng.choice([7032, 10632, 16200]))
            bits = rng.integers(0, 2, n, dtype=np.uint8)
            out = parser.parse(bits)
            assert len(out) % 188 == 0
        # interleave garbage with real frames: recovery still works
        _ts, frames = _frames(hem=True, n_pkts=40)
        good = 0
        for f in frames:
            parser.parse(rng.integers(0, 2, len(f), dtype=np.uint8))
            good += len(parser.parse(f))
        assert good > 0


def _null_ts_mix(n_pkts, null_every, seed=0):
    """Random TS stream with null packets (PID 0x1FFF) interleaved."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    base = random_ts_stream(n_pkts, seed=seed).reshape(-1, 188)
    null = np.concatenate([np.array([0x47, 0x1F, 0xFF, 0x10], np.uint8),
                           np.full(184, 0xFF, np.uint8)])
    out = []
    for i, p in enumerate(base):
        out.append(p)
        if (i + 1) % null_every == 0:
            out.append(null)
            out.append(null)
    return np.concatenate(out)


@pytest.mark.parametrize("hem", [True, False])
def test_npd_roundtrip_reinserts_nulls(hem):
    """TX deletes null packets (DNP counts), RX re-inserts them byte-exactly
    — beyond the reference, which only displays the NPD flag
    (bb_de_header.cpp:497-510)."""
    ts = _null_ts_mix(80, null_every=5)
    packer = bbframe.BBFramePacker(k_bch=7032, hem=hem, npd=True)
    frames = packer.pack(ts)
    for parser in (bbframe.BBFrameParser(), native.NativeBBFrameParser()):
        got = np.concatenate([parser.parse(f) for f in frames])
        sync, raw = got.tobytes(), ts.tobytes()
        idx = raw.find(sync[:376])
        assert idx >= 0 and sync == raw[idx:idx + len(sync)]
        assert parser.matype["npd"] == 1
        assert parser.null_reinserted > 0


@pytest.mark.parametrize("issy_len,npd", [(2, False), (3, False), (3, True)])
def test_issy_nm_passthrough(issy_len, npd):
    """NM ISSY streams decode TS-exactly with the per-UP ISSY field
    stripped and counted — EN 302 755 clauses 5.1.8 (ISSY appended to each
    UP, UPL extended) and 5.1.4 (the CRC-8 chain covers the ISSY/DNP
    suffixes).  The reference only displays the ISSYI flag and would
    mis-parse these streams (bb_de_header.cpp:501-503)."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    ts = _null_ts_mix(60, null_every=6) if npd else \
        random_ts_stream(60, seed=1)
    packer = bbframe.BBFramePacker(k_bch=7032, hem=False, issyi=True,
                                   npd=npd, issy_len=issy_len)
    frames = packer.pack(ts)
    assert len(frames) > 2
    for parser in (bbframe.BBFrameParser(), native.NativeBBFrameParser()):
        got = np.concatenate([parser.parse(f) for f in frames])
        sync, raw = got.tobytes(), ts.tobytes()
        idx = raw.find(sync[:376])
        assert idx >= 0 and sync == raw[idx:idx + len(sync)]
        assert parser.matype["issyi"] == 1
        assert parser.unsupported == 0
        assert parser.crc_errors == 0          # chain covers ISSY+DNP
        assert parser.issy_stripped == len(got) // 188 \
            - parser.null_reinserted
        assert parser.last_issy >= 0           # fixture ISCR, opaque value
        if npd:
            assert parser.null_reinserted > 0


def test_issy_hem_passthrough():
    """HEM ISSY rides in the header's UPL+SYNC fields (clause 5.2.2): the
    data field is unchanged, the value is exposed per frame."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    ts = random_ts_stream(60, seed=1)
    packer = bbframe.BBFramePacker(k_bch=7032, hem=True, issyi=True)
    frames = packer.pack(ts)
    for parser in (bbframe.BBFrameParser(), native.NativeBBFrameParser()):
        got = np.concatenate([parser.parse(f) for f in frames])
        sync, raw = got.tobytes(), ts.tobytes()
        idx = raw.find(sync[:376])
        assert idx >= 0 and sync == raw[idx:idx + len(sync)]
        assert parser.matype["issyi"] == 1
        assert parser.unsupported == 0
        assert parser.issy_stripped == len(frames)
        # fixture ISCR counts input packets; the last frame's header
        # carries the counter at build time
        assert parser.last_issy == 60


def test_issy_malformed_upl_rejected():
    """An NM ISSYI frame whose UPL leaves no legal 2-3 byte ISSY length is
    rejected loudly (unsupported), not silently desynced."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    ts = random_ts_stream(60, seed=1)
    # pack WITHOUT issy fields, then flip the ISSYI header bit: UPL stays
    # 188 bytes -> no room for an ISSY field
    packer = bbframe.BBFramePacker(k_bch=7032, hem=False, issyi=False)
    frames = packer.pack(ts)
    from sdr_receiver_dvb_t2_tpu.params import prbs
    sc = prbs.bb_scrambler(7032)
    bad = []
    for f in frames:
        bits = (np.asarray(f) ^ sc).astype(np.uint8)
        bits[4] = 1                            # MATYPE-1 ISSYI bit
        hdr = bits[:72]
        mode = bbframe._mode_field(hdr, hem=False)
        bits[72:80] = np.unpackbits(np.uint8(mode))
        bad.append(bits ^ sc)
    for parser in (bbframe.BBFrameParser(), native.NativeBBFrameParser()):
        out = [parser.parse(f) for f in bad]
        assert all(len(o) == 0 for o in out)
        assert parser.unsupported == len(bad)
        assert parser.matype["issyi"] == 1


def test_parse_batch_matches_sequential():
    ts, frames = _frames(True, n_pkts=120)
    packed = np.stack([np.packbits(f) for f in frames])
    seq = native.NativeBBFrameParser()
    ref = np.concatenate([seq.parse(f) for f in frames])
    bat = native.NativeBBFrameParser()
    got = bat.parse_batch(packed)
    np.testing.assert_array_equal(ref, got)
