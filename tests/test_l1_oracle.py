"""Cross-validation of L1 signalling against the REFERENCE parser: the
repo builds AND parses L1 from one declarative field list (params/l1.py),
so a mirrored misreading of EN 302 755 clause 7's tables would cancel in
every closed-loop test.  The oracle (tests/oracle/shim_l1.cc) runs the
reference's hand-written p2_symbol bit walker — including its L1-post
hard demod, mux16/mux64 demultiplexer, column deinterleaver and
descrambler (/root/reference/src/DVB_T2/p2_symbol.cpp:282-1073) — on the
repo transmitter's L1 cells and must recover every field.
"""
import numpy as np
import pytest

oracle = pytest.importorskip("tests.oracle")
if oracle.load() is None:
    pytest.skip("reference tree or toolchain unavailable",
                allow_module_level=True)

from sdr_receiver_dvb_t2_tpu.models.transmitter import Transmitter, TxConfig
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)

PRE_FIELDS = [
    "type", "bwt_ext", "s1", "s2_field1", "s2_field2",
    "l1_repetition_flag", "guard_interval", "papr", "l1_post_mod",
    "l1_cod", "l1_fec_type", "l1_post_size", "l1_post_info_size",
    "pilot_pattern", "tx_id_availability", "cell_id", "network_id",
    "t2_system_id", "num_t2_frames", "num_data_symbols", "regen_flag",
    "l1_post_extension", "num_rf", "current_rf_index", "t2_version",
    "l1_post_scrambled", "t2_base_lite"]
POST_HDR = ["sub_slices_per_frame", "num_plp", "num_aux"]
RF_FIELDS = ["rf_idx", "frequency"]
FEF_FIELDS = ["fef_type", "fef_length", "fef_interval", "fef_length_msb"]
PLP_FIELDS = [
    "id", "plp_type", "plp_payload_type", "ff_flag", "first_rf_idx",
    "first_frame_idx", "plp_group_id", "plp_cod", "plp_mod",
    "plp_rotation", "plp_fec_type", "plp_num_blocks_max", "frame_interval",
    "time_il_length", "time_il_type", "in_band_a_flag", "in_band_b_flag",
    "plp_mode", "static_flag", "static_padding_flag"]
DYN_FIELDS = ["frame_idx", "sub_slice_interval", "type_2_start",
              "l1_change_counter", "start_rf_idx"]
DYN_PLP_FIELDS = ["id", "start", "num_blocks"]


def _check_all_fields(tx):
    """Reference-parsed serialization vs the repo's own L1 objects."""
    out = oracle.l1_parse(tx.l1_cells()).tolist()
    it = iter(out)
    pre, post = tx.l1_pre, tx.l1_post
    for name in PRE_FIELDS:
        assert next(it) == getattr(pre, name), f"pre.{name}"
    for name in POST_HDR:
        assert next(it) == getattr(post, name), f"post.{name}"
    for i in range(pre.num_rf):
        for name in RF_FIELDS:
            assert next(it) == getattr(post.rf[i], name), f"rf{i}.{name}"
    fef_got = {name: next(it) for name in FEF_FIELDS}
    if not pre.s2_field2:
        for name in ("fef_type", "fef_length", "fef_interval"):
            assert fef_got[name] == 0, f"post.{name}"
    else:
        # REFERENCE BUG (p2_symbol.cpp:853-856): fef_info reads FEF_TYPE
        # as FIVE bits — EN 302 755 Table 13 and the reference's OWN
        # 34-bit fef shift (p2_symbol.cpp:346: s2_field2 * 34) both say
        # four — so its FEF_LENGTH/FEF_INTERVAL reads are one bit late.
        # The reference never consumes these fields (it has no FEF
        # support), which is why the bug is invisible there.  The
        # off-by-one relationship still validates OUR bit positions:
        assert fef_got["fef_type"] == ((post.fef_type << 1)
                                       | (post.fef_length >> 21))
        assert fef_got["fef_length"] == (((post.fef_length << 1)
                                          | (post.fef_interval >> 7))
                                         & ((1 << 22) - 1))
        # fef_interval's trailing bit comes from the next field; only the
        # leading 7 bits are comparable
        assert fef_got["fef_interval"] >> 1 == (
            ((post.fef_interval << 1) & 0xFF) >> 1)
    assert fef_got["fef_length_msb"] == post.fef_length_msb
    for i in range(post.num_plp):
        for name in PLP_FIELDS:
            assert next(it) == getattr(post.plp[i], name), \
                f"plp{i}.{name}"

    for name in DYN_FIELDS:
        assert next(it) == getattr(post.dyn, name), f"dyn.{name}"
    for i in range(post.num_plp):
        for name in DYN_PLP_FIELDS:
            assert next(it) == getattr(post.dyn.plp[i], name), \
                f"dyn.plp{i}.{name}"
    if pre.l1_repetition_flag:
        # REFERENCE BUGS — its dyn_next parse was clearly never exercised
        # (the reference never consumes dyn_next and its README has no
        # repetition-tested configuration):
        # 1. p2_symbol.cpp:669-676 computes the dyn_next start as
        #    configurable + (num_plp-1)*48 + (num_aux-1)*48 + 71, i.e.
        #    one PLP entry, one aux entry AND the 8-bit RESERVED_3 short
        #    of the true offset (EN 302 755 Table 16: 71 + 48*num_plp +
        #    8 + 48*num_aux) — for one PLP, zero aux it reads 104 bits
        #    EARLY, from inside the dyn block;
        # 2. p2_symbol.cpp:1041 ORs the parsed dyn_next NUM_BLOCKS into
        #    l1.dyn.plp[i] instead of l1.dyn_next.plp[i];
        # 3. l1.dyn_next.plp is never resized (UB; the oracle shim seeds
        #    it).
        # Comparing those reads is meaningless; our dyn_next layout is
        # produced and parsed by the SAME declarative field list as dyn
        # (params/l1.py), which the reference DOES validate above.
        for _ in range(len(DYN_FIELDS)
                       + post.num_plp * len(DYN_PLP_FIELDS)):
            next(it)
    assert next(it, None) is None, "serialization length mismatch"


def _mode(**kw):
    base = dict(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                n_data_symbols=30)
    base.update(kw)
    return T2Mode(**base)


def _plp(**kw):
    base = dict(constellation=Constellation.QAM16, code_rate=CodeRate.C1_2,
                fec_frame=FecFrame.SHORT, rotation=True, time_il_length=1)
    base.update(kw)
    return PlpConfig(**base)


def test_l1_fields_single_plp_qpsk_post():
    tx = Transmitter(TxConfig(mode=_mode(), plp=_plp(),
                              fec_blocks_per_frame=4, num_t2_frames=5))
    _check_all_fields(tx)


def test_l1_fields_multi_plp_qam16_post():
    """Two PLPs + 16QAM L1-post: exercises the reference's mux16
    demultiplexer + column deinterleaver on our modulated cells."""
    plps = [_plp(plp_id=0),
            _plp(plp_id=1, constellation=Constellation.QAM64,
                 code_rate=CodeRate.C2_3, rotation=False)]
    tx = Transmitter(TxConfig(mode=_mode(), plps=plps, fec_blocks=[3, 5],
                              num_t2_frames=4, l1_post_mod=2))
    assert tx.l1_pre.l1_post_mod == 2
    _check_all_fields(tx)


def test_l1_fields_fef_repetition_qam64_post():
    """FEF fields + L1 repetition (dyn_next block) + 64QAM L1-post
    (mux64 path)."""
    tx = Transmitter(TxConfig(mode=_mode(), plp=_plp(),
                              fec_blocks_per_frame=4, num_t2_frames=6,
                              fef_interval=2, fef_length=3 * 2048 + 1234,
                              l1_repetition=True, l1_post_mod=3))
    assert tx.l1_pre.s2_field2 == 1
    assert tx.l1_pre.l1_repetition_flag == 1
    _check_all_fields(tx)


def test_l1_fields_inband_flags():
    tx = Transmitter(TxConfig(mode=_mode(), plp=_plp(),
                              fec_blocks_per_frame=4, num_t2_frames=5,
                              in_band_a=True))
    assert tx.l1_post.plp[0].in_band_a_flag == 1
    _check_all_fields(tx)


def test_l1_reference_rejects_corrupt_crc():
    tx = Transmitter(TxConfig(mode=_mode(), plp=_plp(),
                              fec_blocks_per_frame=4, num_t2_frames=5))
    cells = tx.l1_cells().copy()
    cells[50] = -cells[50]                     # flip one L1-pre BPSK cell
    with pytest.raises(ValueError, match="code -1"):
        oracle.l1_parse(cells)
