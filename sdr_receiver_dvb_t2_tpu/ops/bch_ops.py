"""Device-side BCH syndrome screening (MXU GF(2) matmul).

The all-but-certain case after a successful LDPC decode is "no residual
errors"; checking that is a GF(2) inner product of the codeword with the
parity-check matrix — a dense f32 matmul on the MXU followed by mod-2.
Only flagged codewords take the host Berlekamp-Massey path
(params/bch.py), which the reference never implemented at all
(/root/reference/src/DVB_T2/bch_decoder.cpp:130).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import bch
from ..params.modes import PlpConfig


@functools.lru_cache(maxsize=None)
def _h_matrix(k_bch: int, m: int, t: int):
    h = bch.parity_check_matrix(k_bch, m, t).astype(np.float32)
    return np.asarray(h)


def syndrome_flags(cw_bits: jnp.ndarray, plp: PlpConfig) -> jnp.ndarray:
    """[B, n_bch] hard bits (0/1) -> [B] bool, True = syndrome clean."""
    h = _h_matrix(plp.k_bch, plp.bch_m, plp.bch_t)
    s = jnp.dot(cw_bits.astype(jnp.float32), h,
                preferred_element_type=jnp.float32)
    s = jnp.mod(s, 2.0)
    return jnp.logical_not(jnp.any(s > 0.5, axis=1))


def syndrome_flags_t(bits_t: jnp.ndarray, plp: PlpConfig) -> jnp.ndarray:
    """Transposed variant: [n_bch, W] hard bits -> [W] bool clean flags.

    Same GF(2) MXU matmul with the codeword axis on lanes — matches the
    transposed LDPC kernel output so no relayout is needed.  int8 x int8
    with int32 accumulation is exact (sums <= n_bch < 2^31) and runs the
    MXU at 4x its bf16 rate.
    """
    h = _h_matrix(plp.k_bch, plp.bch_m, plp.bch_t)       # [n_bch, m*t]
    s = jnp.einsum("nm,nw->mw", h.astype(np.int8),
                   bits_t.astype(jnp.int8),
                   preferred_element_type=jnp.int32)
    return jnp.logical_not(jnp.any((s & 1).astype(bool), axis=0))


def pack_bits_t(bits_t: jnp.ndarray) -> jnp.ndarray:
    """[n, W] hard bits (0/1 int8) -> [n//8, W] uint8, MSB-first per byte.

    Device-side byte packing before the device->host transfer: the TS
    output path moves 8x fewer bytes and the host receives BB-frame BYTES
    directly (np.packbits convention), so de-encapsulation needs no
    unpack.  n must be a multiple of 8 (every DVB-T2 K_bch/N_bch is).
    """
    n, w = bits_t.shape
    assert n % 8 == 0, n
    x = bits_t.astype(jnp.int32).reshape(n // 8, 8, w)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1],
                          jnp.int32).reshape(1, 8, 1)
    return jnp.sum(x * weights, axis=1).astype(jnp.uint8)


def correct_host(cw_bits: np.ndarray, plp: PlpConfig):
    """Host-side BM/Chien correction; [n_bch] -> (k_bch bits, n_err)."""
    fixed, nerr = bch.decode(cw_bits, plp.bch_m, plp.bch_t)
    return fixed[:plp.k_bch], nerr
