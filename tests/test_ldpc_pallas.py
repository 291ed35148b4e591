"""Pallas LDPC kernel tests — require a real TPU (skipped on CPU runs).

The kernel's DMA/VMEM pattern is not faithfully emulated by interpret
mode; algorithmic correctness on CPU is covered by test_ldpc_decode.py for
the XLA decoder, which shares the message algebra and code plans.  The
kernel uses the transposed interface: llr_T [N, W] in kernel bit-row
order (see ldpc_pallas.kernel_bit_order), hard_T [k, W] out.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu = any(d.platform == "tpu" or "TPU" in str(getattr(d, "device_kind", ""))
          for d in jax.devices())
pytestmark = pytest.mark.skipif(not tpu, reason="needs TPU hardware")


def _decode_roundtrip(name, n_cw=4, snr_sigma=4.0, max_iters=30, seed=1):
    from sdr_receiver_dvb_t2_tpu.params import ldpc as ldpc_mod
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas
    rng = np.random.default_rng(seed)
    code = ldpc_mod.get_code(name)
    bits = rng.integers(0, 2, size=(n_cw, code.k), dtype=np.uint8)
    cws = np.stack([code.encode(b) for b in bits])
    llr = ((1 - 2 * cws.astype(np.float32)) * 12
           + rng.normal(0, snr_sigma, cws.shape)).round().clip(-127, 127)
    ko = ldpc_pallas.kernel_bit_order(name)
    llr_t = np.ascontiguousarray(llr[:, ko].T)
    pad = np.zeros((llr_t.shape[0], 128 - n_cw), np.float32)
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=1,
                                          max_iters=max_iters)
    hard_t, ok, iters = dec(jnp.asarray(np.concatenate([llr_t, pad], axis=1)))
    return (np.asarray(hard_t)[:, :n_cw].T, np.asarray(ok)[:n_cw],
            int(np.asarray(iters)[:n_cw].max()), cws, code)


def test_pallas_decoder_corrects_and_flags():
    hard, ok, iters, cws, code = _decode_roundtrip("SHORT_C1_2")
    assert ok.all()
    np.testing.assert_array_equal(hard, cws[:, :code.k])
    assert 0 < iters <= 30


def test_pallas_flags_failures_on_garbage():
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas
    from sdr_receiver_dvb_t2_tpu.params import ldpc as ldpc_mod
    rng = np.random.default_rng(3)
    name = "SHORT_C1_2"
    code = ldpc_mod.get_code(name)
    llr_t = jnp.asarray((rng.integers(0, 2, size=(code.n, 128)) * 2 - 1
                         ).astype(np.float32) * 20)
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=1,
                                          max_iters=8)
    _, ok, iters = dec(llr_t)
    assert not bool(jnp.all(ok))
    assert int(np.asarray(iters).max()) == 8


@pytest.mark.parametrize("name", ["NORMAL_C1_2", "NORMAL_C3_5", "NORMAL_C2_3",
                                  "SHORT_C1_2", "SHORT_C3_4", "SHORT_C5_6",
                                  "B8", "B9"])
def test_pallas_all_rate_shapes(name):
    """Rates with k % r != 0 exercise the sliced-parity BlockSpec path;
    B8/B9 are the T2-Lite-only rate-1/3 and 2/5 tables (annex I) — the
    Lite receive path's kernels on real hardware."""
    hard, ok, _, cws, code = _decode_roundtrip(name)
    assert ok.all(), name
    np.testing.assert_array_equal(hard, cws[:, :code.k])


def test_pallas_multi_tile():
    from sdr_receiver_dvb_t2_tpu.params import ldpc as ldpc_mod
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas
    rng = np.random.default_rng(5)
    name = "SHORT_C2_3"
    code = ldpc_mod.get_code(name)
    n_cw = 256
    bits = rng.integers(0, 2, size=(n_cw, code.k), dtype=np.uint8)
    cws = np.stack([code.encode(b) for b in bits])
    llr = ((1 - 2 * cws.astype(np.float32)) * 12
           + rng.normal(0, 4.0, cws.shape)).round().clip(-127, 127)
    ko = ldpc_pallas.kernel_bit_order(name)
    llr_t = jnp.asarray(np.ascontiguousarray(llr[:, ko].T))
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=2,
                                          max_iters=30)
    hard_t, ok, _ = dec(llr_t)
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(hard_t).T, cws[:, :code.k])


def test_pallas_fused_bch_syndrome_normal():
    """bch_h mode on hardware, production shape (NORMAL_C2_3, 2 tiles):
    the fused MXU syndrome must match the standalone screen on clean and
    corrupted codewords."""
    from sdr_receiver_dvb_t2_tpu.params import bch as bch_par
    from sdr_receiver_dvb_t2_tpu.params import ldpc as ldpc_mod
    from sdr_receiver_dvb_t2_tpu.ops import bch_ops, ldpc_pallas
    rng = np.random.default_rng(7)
    name, k_bch, m, t = "NORMAL_C2_3", 43040, 16, 10
    code = ldpc_mod.get_code(name)
    assert k_bch + m * t == code.k
    n_cw = 256
    payload = rng.integers(0, 2, (n_cw, k_bch), dtype=np.uint8)
    bch_cw = np.stack([bch_par.encode(p, m, t) for p in payload])
    cws = np.stack([code.encode(b) for b in bch_cw])
    llr = ((1 - 2 * cws.astype(np.float32)) * 12
           + rng.normal(0, 4.0, cws.shape)).round().clip(-127, 127)
    llr[5] = rng.normal(0, 20.0, code.n).round().clip(-127, 127)  # garbage
    ko = ldpc_pallas.kernel_bit_order(name)
    llr_t = jnp.asarray(np.ascontiguousarray(llr[:, ko].T))
    h = bch_ops._h_matrix(k_bch, m, t)
    dec = ldpc_pallas.make_pallas_decoder(name, batch=128, n_tiles=2,
                                          max_iters=15, bch_h=h)
    hard_t, ok, iters, clean = dec(llr_t)
    clean = np.asarray(clean)

    class _P:
        pass
    p = _P()
    p.k_bch, p.bch_m, p.bch_t, p.n_bch = k_bch, m, t, code.k
    ref = np.asarray(bch_ops.syndrome_flags_t(hard_t, p))
    np.testing.assert_array_equal(clean, ref)
    good = np.ones(n_cw, bool)
    good[5] = False
    assert clean[good].all() and not clean[5]
    assert np.asarray(ok)[good].all()
