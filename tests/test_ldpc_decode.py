"""LDPC decoder tests (CPU, small codes/batches for speed)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.params import ldpc
from sdr_receiver_dvb_t2_tpu.ops.ldpc_decode import make_decoder


def _noisy_llr(code, B, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=(B, code.k), dtype=np.uint8)
    cw = code.encode(bits)
    sigma = 10 ** (-snr_db / 20)
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = np.clip(np.round(4 * y / sigma ** 2), -127, 127).astype(np.float32)
    return cw, llr


@pytest.mark.parametrize("name,snr", [("SHORT_C1_2", 1.5), ("SHORT_C3_4", 5.0)])
def test_decode_corrects_awgn(name, snr):
    code = ldpc.get_code(name)
    cw, llr = _noisy_llr(code, B=4, snr_db=snr)
    dec = make_decoder(name, max_iters=40)
    hard, ok, iters = dec(llr)
    assert np.array(ok).all()
    assert (np.array(hard) == cw).all()
    assert np.asarray(iters).max() > 0


def test_decode_clean_zero_iters():
    code = ldpc.get_code("SHORT_C1_2")
    cw, _ = _noisy_llr(code, B=2, snr_db=50)
    llr = (1.0 - 2.0 * cw.astype(np.float32)) * 32
    dec = make_decoder("SHORT_C1_2", max_iters=40)
    hard, ok, iters = dec(llr)
    assert np.array(ok).all()
    assert (np.asarray(iters) == 0).all()
    assert (np.array(hard) == cw).all()


def test_decode_reports_failure_on_garbage():
    code = ldpc.get_code("SHORT_C1_2")
    rng = np.random.default_rng(3)
    llr = rng.integers(-20, 20, size=(2, code.n)).astype(np.float32)
    dec = make_decoder("SHORT_C1_2", max_iters=8)
    _, ok, iters = dec(llr)
    assert not np.array(ok).any()
    assert (np.asarray(iters) == 8).all()


def test_saturated_wrong_bits_recoverable():
    """Regression: a confidently-wrong bit must stay correctable.

    Offset-min-sum messages clamp at +-31, so a wrong bit whose intrinsic
    exceeds its degree * 31 total extrinsic capacity would be permanently
    stuck (lam = ch + sum(msg) can never cross zero).  The decoders clamp
    channel LLRs below the weakest (degree-2 staircase) bit's capacity —
    without it, ONE saturated-wrong cell killed its whole codeword on real
    high-SNR captures."""
    code = ldpc.get_code("SHORT_C1_2")
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, code.k, dtype=np.uint8)
    cw = code.encode(bits)
    dec = make_decoder("SHORT_C1_2", max_iters=15)
    for amp, n_flip in [(127, 1), (127, 8), (127, 32), (96, 4)]:
        llr = (1 - 2 * cw.astype(np.float32)) * amp
        idx = rng.choice(code.n, n_flip, replace=False)
        llr[idx] = -llr[idx]
        hard, ok, _ = dec(llr[None, :])
        assert np.asarray(ok)[0], (amp, n_flip)
        assert (np.asarray(hard)[0] == cw).all(), (amp, n_flip)
