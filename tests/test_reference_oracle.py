"""Cross-validation against the REFERENCE implementation itself
(VERDICT round-2 missing #1): the reference's Qt-free engines are
compiled as a test oracle (tests/oracle) and compared against this
framework on identical inputs.  These tests would catch a mirrored
TX/RX misreading of EN 302 755 that the repo's own closed TX->RX loop
cannot see.

Reference sources: /root/reference/src/DVB_T2/LDPC/* (decoder),
address_freq_deinterleaver.cpp:136-209 (interleaver addresses),
pilot_generator.cpp (carrier maps + pilot amplitudes)."""
import numpy as np
import pytest

oracle = pytest.importorskip("tests.oracle")
if oracle.load() is None:
    pytest.skip("reference tree or toolchain unavailable",
                allow_module_level=True)

from sdr_receiver_dvb_t2_tpu.params import freq_interleaver, ldpc, pilots
from sdr_receiver_dvb_t2_tpu.params.modes import (T2Mode, FftMode,
                                                  GuardInterval,
                                                  PilotPattern)

# (fft, guard, pp, extended, n_data_symbols) — legal combinations that
# exercise every FFT size, both carrier modes, and an FC-symbol case
MODES = [
    (FftMode.FFT_1K, GuardInterval.G1_8, PilotPattern.PP1, False, 20),
    (FftMode.FFT_2K, GuardInterval.G1_8, PilotPattern.PP7, False, 30),
    (FftMode.FFT_4K, GuardInterval.G1_16, PilotPattern.PP4, False, 24),
    (FftMode.FFT_8K, GuardInterval.G1_8, PilotPattern.PP8, True, 20),
    (FftMode.FFT_16K, GuardInterval.G1_16, PilotPattern.PP3, True, 20),
    (FftMode.FFT_32K, GuardInterval.G1_128, PilotPattern.PP7, True, 12),
]


def _mode(fft, gi, pp, ext, nd):
    return T2Mode(fft_mode=fft, guard=gi, pilot_pattern=pp,
                  extended_carriers=ext, n_data_symbols=nd).validate()


@pytest.mark.parametrize("fft,gi,pp,ext,nd", MODES)
def test_geometry_matches_reference(fft, gi, pp, ext, nd):
    mode = _mode(fft, gi, pp, ext, nd)
    g = oracle.geometry(mode.fft_size, int(pp), ext, guard=int(gi))
    assert g["k_total"] == mode.k_total
    assert g["n_p2"] == mode.n_p2
    assert g["c_p2"] == mode.c_p2
    assert g["c_data"] == mode.c_data
    if mode.has_fc:
        assert g["c_fc"] == mode.c_fc
        assert g["n_fc"] == mode.n_fc


@pytest.mark.parametrize("fft,gi,pp,ext,nd", MODES)
def test_freq_interleaver_matches_reference(fft, gi, pp, ext, nd):
    """The reference computes the RX LUT h[tx_address] = payload index;
    our tx_permutation IS the tx_address array, so h[perm] == arange."""
    mode = _mode(fft, gi, pp, ext, nd)
    ref = oracle.freq_addresses(mode.fft_size, int(pp), ext, guard=int(gi))

    def check(n_cells, sym_idx, h_ref):
        perm = freq_interleaver.tx_permutation(mode, n_cells, sym_idx)
        np.testing.assert_array_equal(h_ref[:n_cells][perm],
                                      np.arange(n_cells), err_msg=str(
                                          (mode.fft_size, sym_idx)))

    # P2 symbols: reference uses the EVEN address set for all P2 symbols
    # of even index and ODD for odd (clause 8.5); compare both parities
    check(mode.c_p2, 0, ref["h_odd_p2"]
          if _parity_uses_odd(mode, 0) else ref["h_even_p2"])
    if mode.n_p2 > 1:
        check(mode.c_p2, 1, ref["h_odd_p2"]
              if _parity_uses_odd(mode, 1) else ref["h_even_p2"])
    # data symbols (first two after P2)
    for l in (mode.n_p2, mode.n_p2 + 1):
        if l >= mode.frame_symbols - (1 if mode.has_fc else 0):
            continue
        check(mode.c_data, l, ref["h_odd_data"]
              if _parity_uses_odd(mode, l) else ref["h_even_data"])
    # frame-closing symbol
    if mode.has_fc:
        l = mode.frame_symbols - 1
        check(mode.n_fc, l, ref["h_odd_fc"]
              if _parity_uses_odd(mode, l) else ref["h_even_fc"])


def _parity_uses_odd(mode, sym_idx):
    """Which reference LUT applies to frame symbol sym_idx.  The
    reference demodulator applies h_ODD to EVEN symbol indices
    (data_symbol.cpp:129, p2_symbol.cpp:108, fc_symbol.cpp:101) — its
    LUT *names* come from the TX-side address generator, where the
    roles invert under RX."""
    return sym_idx % 2 == 0


@pytest.mark.parametrize("fft,gi,pp,ext,nd", MODES)
def test_pilots_match_reference(fft, gi, pp, ext, nd):
    """Carrier maps (payload positions) and signed pilot reference values
    per symbol, digit-for-digit against the reference generator."""
    mode = _mode(fft, gi, pp, ext, nd)
    ref = oracle.pilots(mode.fft_size, int(pp), ext, nd, int(mode.has_fc),
                        guard=int(gi))
    n_p2, kt = ref["n_p2"], ref["k_total"]
    for l in range(mode.frame_symbols):
        if l < n_p2:
            r_map = ref["p2_map"]
            r_ref = ref["p2_ref"][l]
        elif mode.has_fc and l == mode.frame_symbols - 1:
            r_map = ref["fc_map"]
            r_ref = ref["fc_ref"]
        else:
            r_map = ref["data_map"][l - n_p2]
            r_ref = ref["data_ref"][l - n_p2]
        mine_idx = pilots.data_cell_indices(mode, l)
        ref_idx = np.nonzero(r_map == oracle.DATA_CARRIER)[0]
        np.testing.assert_array_equal(mine_idx, ref_idx,
                                      err_msg=f"symbol {l} payload map")
        mine_ref = pilots.reference_symbol(mode, l)
        pil = np.nonzero(r_ref != 0)[0]
        np.testing.assert_allclose(mine_ref[pil], r_ref[pil], rtol=1e-5,
                                   err_msg=f"symbol {l} pilot values")


# ---------------------------------------------------------------------------
# LDPC cross-validation


@pytest.mark.parametrize("name", sorted(oracle.LDPC_TABLE))
def test_encoder_satisfies_reference_decoder(name):
    """Codewords from OUR encoder must be valid under the REFERENCE
    decoder's parity checks, for every one of the 13 DVB-T2 tables: a
    mirrored table/encoder misreading would fail here immediately."""
    code = ldpc.get_code(name)
    orc = oracle.LdpcOracle(name)
    assert (orc.n, orc.k) == (code.n, code.k)
    rng = np.random.default_rng(3)
    for seed in range(2):
        info = rng.integers(0, 2, code.k).astype(np.uint8)
        cw = code.encode(info)
        llr = ((1 - 2 * cw.astype(np.int32)) * 24).astype(np.int8)
        hard, ok, rc = orc.decode(llr, trials=8)
        assert ok, f"reference decoder rejects our codeword ({name})"
        np.testing.assert_array_equal(hard, cw[:code.k])


@pytest.mark.parametrize("name", ["SHORT_C1_2", "SHORT_C2_3"])
def test_decoder_matches_reference_on_awgn(name):
    """Identical noisy int8 LLR inputs through our portable decoder and
    the reference engine: both must correct to the same codeword."""
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_decode
    code = ldpc.get_code(name)
    orc = oracle.LdpcOracle(name)
    dec = ldpc_decode.make_decoder(name, max_iters=15)
    rng = np.random.default_rng(11)
    n_cw = 4
    cws, llrs = [], []
    for i in range(n_cw):
        info = rng.integers(0, 2, code.k).astype(np.uint8)
        cw = code.encode(info)
        x = (1 - 2 * cw.astype(np.float32))
        y = x + rng.normal(0, 0.58, code.n)
        llr = np.clip(np.round(8.0 * 2 * y / 0.58 ** 2), -127, 127
                      ).astype(np.int8)
        cws.append(cw)
        llrs.append(llr)
    llrs = np.stack(llrs)
    hard_mine, ok_mine, _ = dec(llrs)
    for i in range(n_cw):
        hard_ref, ok_ref, _ = orc.decode(llrs[i], trials=15)
        if ok_mine[i] and ok_ref:
            np.testing.assert_array_equal(np.asarray(hard_mine[i])[:code.k],
                                          hard_ref)
            np.testing.assert_array_equal(hard_ref, cws[i][:code.k])


def test_saturated_llr_recovery_matches_reference():
    """Saturated-wrong-bit stress (BENCH.md): WRONG bits at |llr| = 127
    on degree-3 variable nodes (NORMAL_C2_3 has 108 such info groups;
    3*31 = 93 < 127) sit beyond the extrinsic capacity of any decoder
    whose posterior update is symmetrically clamped at the +-31 message
    range.  The two implementations escape differently and this test
    pins BOTH mechanisms against the same input:
      * the reference adds the UNCLAMPED check output to its posterior
        and clamps only the stored message (layered_decoder.hh:99-107,
        generic.hh update()), letting posteriors drift past degree*31;
      * our decoders clamp channel LLRs to +-56 < 93 before symmetric
        +-31 message algebra (ldpc_pallas.py / ldpc_decode.py).
    Both must fully recover; a regression in either escape hatch (or a
    mirrored misreading of the table structure) fails here."""
    name = "NORMAL_C2_3"
    code = ldpc.get_code(name)
    orc = oracle.LdpcOracle(name)
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_decode
    dec = ldpc_decode.make_decoder(name, max_iters=25)
    # info bits living in degree-3 groups of the QC table
    degs = np.array([len(g) for g in code.table.groups])
    lo_groups = np.nonzero(degs == 3)[0]
    assert lo_groups.size, "table structure changed"
    rng = np.random.default_rng(7)
    info = rng.integers(0, 2, code.k).astype(np.uint8)
    cw = code.encode(info)
    llr = ((1 - 2 * cw.astype(np.int32)) * 127).astype(np.int8)
    wrong = lo_groups[:3] * 360 + rng.integers(0, 360, 3)
    llr[wrong] = -llr[wrong]                 # saturated WRONG low-deg bits
    hard_ref, ok_ref, _ = orc.decode(llr, trials=25)
    assert ok_ref
    np.testing.assert_array_equal(hard_ref, cw[:code.k])
    hard_mine, ok_mine, _ = dec(llr[None, :])
    np.testing.assert_array_equal(np.asarray(hard_mine[0])[:code.k],
                                  cw[:code.k])


# ---------------------------------------------------------------------------
# MISO pilot cross-validation (EN 302 755 clause 9.2.2.3 / 9.2.5)


# MISO-legal (fft, pp) combos only (EN 302 755 table 58; modes.py
# MISO_PILOT_PATTERNS) — illegal combos have no defined inversion set
MISO_MODES = [
    (FftMode.FFT_1K, GuardInterval.G1_8, PilotPattern.PP1, False, 20),
    (FftMode.FFT_2K, GuardInterval.G1_8, PilotPattern.PP3, False, 30),
    (FftMode.FFT_4K, GuardInterval.G1_16, PilotPattern.PP4, False, 24),
    (FftMode.FFT_8K, GuardInterval.G1_8, PilotPattern.PP8, True, 20),
    (FftMode.FFT_16K, GuardInterval.G1_16, PilotPattern.PP3, True, 20),
    (FftMode.FFT_32K, GuardInterval.G1_128, PilotPattern.PP8, True, 12),
]


@pytest.mark.parametrize("fft,gi,pp,ext,nd", MISO_MODES)
@pytest.mark.parametrize("tx", [1, 2])
def test_miso_pilots_match_reference(fft, gi, pp, ext, nd, tx):
    """MISO carrier maps, transmit-group-2 inversion positions and signed
    reference values, digit-for-digit against the reference generator for
    both transmit groups."""
    mode = T2Mode(fft_mode=fft, guard=gi, pilot_pattern=pp,
                  extended_carriers=ext, n_data_symbols=nd,
                  miso=True).validate()
    ref = oracle.pilots_miso(mode.fft_size, int(pp), ext, nd,
                             int(mode.has_fc), tx, guard=int(gi))
    assert ref["c_p2"] == mode.c_p2
    assert ref["c_data"] == mode.c_data
    n_p2 = ref["n_p2"]
    INVERTED = (7, 8, 9)          # P2/SP/CP *_INVERTED carrier-type codes
    for l in range(mode.frame_symbols):
        if l < n_p2:
            r_map, r_ref = ref["p2_map"], ref["p2_ref"][l]
        elif mode.has_fc and l == mode.frame_symbols - 1:
            r_map, r_ref = ref["fc_map"], ref["fc_ref"]
        else:
            r_map, r_ref = (ref["data_map"][l - n_p2],
                            ref["data_ref"][l - n_p2])
        np.testing.assert_array_equal(
            pilots.data_cell_indices(mode, l),
            np.nonzero(r_map == oracle.DATA_CARRIER)[0],
            err_msg=f"symbol {l} payload map")
        if tx == 2:
            inv_ref = np.isin(r_map, INVERTED)
            inv_mine = pilots.miso_inversion_mask(mode, l)
            np.testing.assert_array_equal(
                inv_mine, inv_ref, err_msg=f"symbol {l} inversion set")
        mine_ref = pilots.reference_symbol_tx(mode, l, tx)
        pil = np.nonzero(r_ref != 0)[0]
        np.testing.assert_allclose(mine_ref[pil], r_ref[pil], rtol=1e-5,
                                   err_msg=f"symbol {l} tx{tx} pilots")
