"""L1 soft-FEC decode: the punctured SHORT_C1_4 / SHORT_C1_2 path must
recover signalling at SNRs where the reference-style hard slice fails."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.ops import l1_soft
from sdr_receiver_dvb_t2_tpu.params import l1_fec


def _bpsk_llr(bits, snr_db, rng, scale=24.0):
    x = 1.0 - 2.0 * bits.astype(np.float32)
    sigma = 10 ** (-snr_db / 20)
    y = x + sigma * rng.standard_normal(len(x)).astype(np.float32)
    return y * scale, (y < 0).astype(np.uint8)


def test_l1_group_orders_spec_structure():
    """EN 302 755 Table 17/18 orders: permutations of the right group
    counts, and the fixed L1-pre puncture budget reproduces the spec's
    '31 full groups + first 328 bits of the 32nd' rule."""
    assert sorted(l1_fec.L1_PRE_PUNCT_GROUP_ORDER) == list(range(36))
    assert sorted(l1_fec.L1_POST_PAD_GROUP_ORDER) == list(range(20))
    assert sorted(l1_fec.L1_POST_PUNCT_GROUP_ORDER) == list(range(25))
    keep = l1_fec.L1_PRE_TX_BITS - 200 - 168        # surviving parity
    n_punc = 12960 - keep
    assert divmod(n_punc, 360) == (31, 328)
    pos = l1_fec.parity_keep_positions(12960, keep,
                                       l1_fec.L1_PRE_PUNCT_GROUP_ORDER)
    assert len(pos) == keep and len(np.unique(pos)) == keep
    # the 31 fully-punctured groups contribute no survivors; the partial
    # group (order[31] = 23) keeps its LAST 32 bits (head-punctured)
    order = l1_fec.L1_PRE_PUNCT_GROUP_ORDER
    dead = {g for g in order[:31]}
    assert not any(int(p) // 360 in dead for p in pos)
    part = [int(p) for p in pos if int(p) // 360 == order[31]]
    assert part == list(range(order[31] * 360 + 328, (order[31] + 1) * 360))


def test_l1_post_padding_positions_follow_table17():
    """K_sig bits must land outside the Table-17 padded groups."""
    k_sig = 1000                                     # pads 16 full + 272
    pos = l1_fec.info_bit_positions(7032, k_sig,
                                    l1_fec.L1_POST_PAD_GROUP_ORDER)
    assert len(pos) == k_sig and (np.diff(pos) > 0).all()
    full, rem = divmod(7032 - k_sig, 360)
    order = l1_fec.L1_POST_PAD_GROUP_ORDER
    dead = set(order[:full])
    groups = pos // 360
    assert not any(int(g) in dead for g in groups)


def test_l1_pre_fec_beats_hard_slice():
    rng = np.random.default_rng(4)
    info = rng.integers(0, 2, 200).astype(np.uint8)
    tx = l1_fec.encode_l1_pre(info)
    llr, hard = _bpsk_llr(tx, 5.0, rng)   # ~3% raw BER: hard dead, soft fine
    # the reference-style hard slice is certainly corrupted at this SNR
    assert (l1_fec.decode_l1_pre_systematic(hard) != info).any()
    got = l1_soft.decode_l1_pre_fec(llr)
    assert got is not None
    np.testing.assert_array_equal(got, info)


def test_l1_pre_fec_flags_garbage():
    rng = np.random.default_rng(9)
    llr = rng.normal(0, 24, l1_fec.L1_PRE_TX_BITS).astype(np.float32)
    assert l1_soft.decode_l1_pre_fec(llr) is None


def test_l1_post_fec_roundtrip_qam16():
    rng = np.random.default_rng(6)
    k_sig = 350
    info = rng.integers(0, 2, k_sig).astype(np.uint8)
    coded_stream = l1_fec.encode_l1_post(info, l1_post_mod=2, n_p2=1)
    # modulate to QAM16 cells, add noise, soft-demap
    from sdr_receiver_dvb_t2_tpu.params import qam
    from sdr_receiver_dvb_t2_tpu.params.modes import Constellation
    cells = qam.map_bits(coded_stream, Constellation.QAM16)
    sigma = 10 ** (-12.0 / 20)                # 12 dB: hard path still breaks
    noisy = cells + sigma * (rng.standard_normal(len(cells))
                             + 1j * rng.standard_normal(len(cells))) / np.sqrt(2)
    hard = qam.hard_bits(noisy, Constellation.QAM16)
    hard_info = l1_fec.undo_l1_post_interleave(hard, 2)[:k_sig]
    assert (hard_info != info).any()          # hard slice corrupted
    llr_stream = l1_soft.cell_llrs(noisy, 2)
    llr_coded = l1_fec.undo_l1_post_interleave_soft(llr_stream, 2)
    got = l1_soft.decode_l1_post_fec(llr_coded, k_sig)
    assert got is not None
    np.testing.assert_array_equal(got, info)
