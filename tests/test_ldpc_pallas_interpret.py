"""Interpret-mode coverage for the Pallas LDPC kernel (runs on CPU).

The TPU tests in test_ldpc_pallas.py skip without hardware; this file runs
the SAME kernel through ``pl.pallas_call(..., interpret=True)`` so the
message algebra, the fused rolled pass-2 update, the RMW duplicate-slot
path and the per-codeword trials stat are exercised in every CPU CI run.
SHORT codes only — interpret mode executes the layer loop in Python-traced
XLA and NORMAL codes would take minutes.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from sdr_receiver_dvb_t2_tpu.params import ldpc as ldpc_mod
from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas


def _roundtrip(name, n_cw=4, sigma=4.0, max_iters=30, seed=1):
    rng = np.random.default_rng(seed)
    code = ldpc_mod.get_code(name)
    bits = rng.integers(0, 2, size=(n_cw, code.k), dtype=np.uint8)
    cws = np.stack([code.encode(b) for b in bits])
    llr = ((1 - 2 * cws.astype(np.float32)) * 12
           + rng.normal(0, sigma, cws.shape)).round().clip(-127, 127)
    ko = ldpc_pallas.kernel_bit_order(name)
    llr_t = np.ascontiguousarray(llr[:, ko].T)
    pad = np.zeros((llr_t.shape[0], 128 - n_cw), np.float32)
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=1,
                                          max_iters=max_iters, interpret=True)
    hard_t, ok, iters = dec(jnp.asarray(np.concatenate([llr_t, pad], axis=1)))
    return (np.asarray(hard_t)[:, :n_cw].T, np.asarray(ok)[:n_cw],
            np.asarray(iters)[:n_cw], cws, code)


@pytest.mark.parametrize("name", ["SHORT_C1_2", "SHORT_C2_3"])
def test_interpret_corrects_awgn(name):
    # SHORT_C2_3 rows contain duplicate variable groups -> RMW tail slots
    hard, ok, iters, cws, code = _roundtrip(name)
    assert ok.all()
    np.testing.assert_array_equal(hard, cws[:, :code.k])
    assert (iters > 0).all() and (iters <= 30).all()


def test_interpret_per_codeword_trials():
    """One clean codeword + noisy ones: per-codeword iters must differ."""
    name = "SHORT_C1_2"
    rng = np.random.default_rng(7)
    code = ldpc_mod.get_code(name)
    bits = rng.integers(0, 2, size=(3, code.k), dtype=np.uint8)
    cws = np.stack([code.encode(b) for b in bits])
    llr = (1 - 2 * cws.astype(np.float32)) * 24.0
    llr[1:] += rng.normal(0, 6.0, llr[1:].shape)
    llr = llr.round().clip(-127, 127)
    ko = ldpc_pallas.kernel_bit_order(name)
    llr_t = np.ascontiguousarray(llr[:, ko].T)
    pad = np.zeros((llr_t.shape[0], 125), np.float32)
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=1,
                                          max_iters=20, interpret=True)
    _, ok, iters = dec(jnp.asarray(np.concatenate([llr_t, pad], axis=1)))
    ok, iters = np.asarray(ok)[:3], np.asarray(iters)[:3]
    assert ok.all()
    # codeword 0 is noise-free: its layered sweep is clean on iteration 1;
    # noisy ones may need more — and the stat must be tracked per codeword
    assert iters[0] == 1
    assert (iters >= 1).all()
