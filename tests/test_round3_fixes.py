"""Round-3 fix regressions: NPD expansion, stats clipping, per-PLP sinks,
L1 group-order hooks, spur re-detection arming."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import bbframe, native


def _null_heavy_ts(n_data=12, nulls_per=200, seed=0):
    """TS stream where each data packet is followed by ~200 nulls — NPD
    deletion then re-inflates output ~200x over the BB-frame bytes."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    base = random_ts_stream(n_data, seed=seed).reshape(-1, 188)
    null = np.concatenate([np.array([0x47, 0x1F, 0xFF, 0x10], np.uint8),
                           np.full(184, 0xFF, np.uint8)])
    out = []
    for p in base:
        out.append(p)
        out.extend([null] * nulls_per)
    return np.concatenate(out)


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_npd_heavy_expansion_not_truncated():
    """NPD re-insertion can expand output up to ~256x the frame bytes; the
    parser must deliver every packet (growable retained buffer) and count
    nothing as truncated."""
    ts = _null_heavy_ts()
    packer = bbframe.BBFramePacker(k_bch=7032, hem=True, npd=True)
    frames = packer.pack(ts)
    parser = native.NativeBBFrameParser()
    outs = [parser.parse(f) for f in frames]
    got = np.concatenate(outs)
    # at least one frame must have expanded far beyond the old 64x guess
    assert max(len(o) for o in outs) > 64 * (7032 // 8)
    sync, raw = got.tobytes(), ts.tobytes()
    idx = raw.find(sync[:376])
    assert idx >= 0 and sync == raw[idx:idx + len(sync)]
    assert parser.truncated == 0
    assert parser.null_reinserted > 0


@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_npd_heavy_expansion_batch():
    ts = _null_heavy_ts(n_data=10, nulls_per=150, seed=3)
    packer = bbframe.BBFramePacker(k_bch=7032, hem=False, npd=True)
    frames = packer.pack(ts)
    packed = np.stack([np.packbits(f) for f in frames])
    parser = native.NativeBBFrameParser()
    got = parser.parse_batch(packed)
    sync, raw = got.tobytes(), ts.tobytes()
    idx = raw.find(sync[:376])
    assert idx >= 0 and sync == raw[idx:idx + len(sync)]
    assert parser.truncated == 0


def test_ldpc_stats_clips_out_of_range_iters():
    """Wrapped/negative per-codeword trials must never crash np.bincount
    (int8 kernel lane wraps past 127 iters)."""
    from sdr_receiver_dvb_t2_tpu.runtime.diagnostics import LdpcStats
    st = LdpcStats(max_iters=15)
    st.update(np.array([-3, 200, 5]), np.array([False, True, True]))
    assert st.total == 3
    assert st.hist.sum() == 3


def test_pallas_decoder_caps_max_iters():
    """A decoder configured beyond the int8 trials range is capped at
    construction instead of wrapping negative at run time."""
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas
    # construction only — never invoked (CPU): the cap is applied eagerly
    ldpc_pallas.make_pallas_decoder("SHORT_C1_4", max_iters=1000,
                                    interpret=True)


def test_plp_sink_factory_routing(tmp_path):
    from sdr_receiver_dvb_t2_tpu.cli import _plp_sink_factory
    from sdr_receiver_dvb_t2_tpu.io import sinks

    f = _plp_sink_factory("udp://127.0.0.1:7654")
    s = f(3, 7)
    assert isinstance(s, sinks.UdpTsSink) and s.addr == ("127.0.0.1", 7657)
    s.close()

    f = _plp_sink_factory(f"ts:{tmp_path}/out-plp%d.ts")
    s = f(1, 5)
    s.write(np.zeros(188, np.uint8))
    s.close()
    assert (tmp_path / "out-plp5.ts").exists()

    f = _plp_sink_factory(f"ts:{tmp_path}/plpdir/")
    s = f(2, 9)
    s.write(np.zeros(188, np.uint8))
    s.close()
    assert (tmp_path / "plpdir" / "plp9.ts").exists()

    f = _plp_sink_factory(f"{tmp_path}/plain.ts")
    s = f(1, 2)
    s.write(np.zeros(188, np.uint8))
    s.close()
    assert (tmp_path / "plain-plp2.ts").exists()


def test_l1_group_order_hooks_roundtrip(monkeypatch):
    """The Table 17/18 hook machinery: with NON-tail group orders plugged
    in, the modulator and the soft depuncture must stay consistent (this
    is the one-place change that makes the soft path spec-exact once the
    real tables are dropped in)."""
    from sdr_receiver_dvb_t2_tpu.params import l1_fec
    from sdr_receiver_dvb_t2_tpu.ops import l1_soft
    rng = np.random.default_rng(0)

    # L1-pre: 36 parity groups (12960/360); use a rotated order
    pre_order = list(np.roll(np.arange(36), 7))
    monkeypatch.setattr(l1_fec, "L1_PRE_PUNCT_GROUP_ORDER", pre_order)
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    tx = l1_fec.encode_l1_pre(bits)
    llr = (1.0 - 2.0 * tx.astype(np.float32)) * 24.0
    # flip a few bits to prove the parity actually participates
    llr[[3, 500, 900, 1500]] *= -1
    out = l1_soft.decode_l1_pre_fec(llr)
    assert out is not None
    np.testing.assert_array_equal(out, bits)

    # L1-post: pad order over 20 info groups (7200/360) + punct order over
    # 25 parity groups (9000/360)
    monkeypatch.setattr(l1_fec, "L1_POST_PAD_GROUP_ORDER",
                        list(np.roll(np.arange(20), 11)))
    monkeypatch.setattr(l1_fec, "L1_POST_PUNCT_GROUP_ORDER",
                        list(np.roll(np.arange(25), 5)))
    k_sig = 400
    info = rng.integers(0, 2, k_sig).astype(np.uint8)
    coded = l1_fec.encode_l1_post(info, l1_post_mod=1, n_p2=1)
    fec_order = l1_fec.undo_l1_post_interleave(coded, 1)
    llr = (1.0 - 2.0 * fec_order.astype(np.float32)) * 24.0
    llr[[10, 250, 700]] *= -1
    out = l1_soft.decode_l1_post_fec(llr, k_sig)
    assert out is not None
    np.testing.assert_array_equal(out, info)


def test_spur_redetect_arming():
    """detect_spur re-arms periodically while the tracked amplitude stays
    ~0 and after an explicit reset (relock)."""
    from sdr_receiver_dvb_t2_tpu.runtime.stream import StreamingReceiver
    rx = StreamingReceiver.__new__(StreamingReceiver)
    rx.spur = None
    assert rx._spur_redetect_due()            # never armed -> detect
    rx.spur = dict(omega=0.1, amp=0.5 + 0j, phase=0.0, m_prev=None)
    assert not rx._spur_redetect_due()        # actively notching -> leave it
    rx.spur = dict(omega=0.0, amp=0j, phase=0.0, m_prev=None)
    fired = [rx._spur_redetect_due() for _ in range(64)]
    assert fired[-1] and not any(fired[:-1])  # idle 64 blocks -> re-detect
