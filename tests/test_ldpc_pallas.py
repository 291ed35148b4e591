"""Pallas LDPC kernel tests — require a real TPU (skipped on CPU runs).

The kernel's DMA/aliasing pattern is not faithfully emulated by interpret
mode; algorithmic correctness on CPU is covered by test_ldpc_decode.py for
the XLA decoder, which shares the message algebra and code plans.
"""
import numpy as np
import pytest

import jax

tpu = any(d.platform == "tpu" or "TPU" in str(getattr(d, "device_kind", ""))
          for d in jax.devices())
pytestmark = pytest.mark.skipif(not tpu, reason="needs TPU hardware")


def test_pallas_decoder_corrects_and_flags():
    from sdr_receiver_dvb_t2_tpu.params import ldpc
    from sdr_receiver_dvb_t2_tpu.ops.ldpc_pallas import make_pallas_decoder

    name = "SHORT_C1_2"
    code = ldpc.get_code(name)
    rng = np.random.default_rng(0)
    B = 128
    cw = np.tile(code.encode(rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)),
                 (32, 1))
    sigma = 10 ** (-2.0 / 20)
    x = 1.0 - 2.0 * cw.astype(np.float32)
    llr = np.clip(np.round(
        4 * (x + sigma * rng.standard_normal(cw.shape)) / sigma ** 2),
        -127, 127).astype(np.float32)
    dec = make_pallas_decoder(name, batch=B, max_iters=25)
    hard, ok, iters = dec(llr)
    assert np.array(ok).all()
    assert (np.array(hard) == cw).all()
    assert 0 < int(iters) <= 25
