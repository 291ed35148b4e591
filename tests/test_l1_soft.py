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
