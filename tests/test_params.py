"""Unit tests for the parameter/table layer (pure NumPy, no JAX)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.params import (
    bch, bit_interleaver, cell_interleaver, freq_interleaver, ldpc,
    modes, pilots, prbs, tables, time_interleaver,
)
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame,
)


# ---------------------------------------------------------------------------
# PRBS / PN sequences
# ---------------------------------------------------------------------------

def test_pilot_prbs_first_bits():
    # EN 302 755 clause 9.2.1: sequence starts 1111111111100...
    seq = prbs.pilot_prbs(32)
    assert list(seq[:11]) == [1] * 11
    assert seq.sum() < 32


def test_frame_pn_length_and_prefix():
    pn = prbs.frame_pn_sequence()
    assert len(pn) == 2624
    # table 41 first byte 0x4D = 01001101
    assert list(pn[:8]) == [0, 1, 0, 0, 1, 1, 0, 1]


def test_bb_scrambler_period_start():
    s = prbs.bb_scrambler(20)
    assert s.shape == (20,)
    assert set(np.unique(s)) <= {0, 1}


def test_p1_randomizer_pm1():
    r = prbs.p1_mss_randomizer()
    assert len(r) == 384
    assert set(np.unique(r)) == {-1, 1}


# ---------------------------------------------------------------------------
# Mode tables / carrier maps
# ---------------------------------------------------------------------------

CONFIGS = [
    T2Mode(FftMode.FFT_32K, GuardInterval.G1_128, PilotPattern.PP7, True),
    T2Mode(FftMode.FFT_32K, GuardInterval.G1_8, PilotPattern.PP2, True, n_data_symbols=20),
    T2Mode(FftMode.FFT_16K, GuardInterval.G1_16, PilotPattern.PP3, False, n_data_symbols=30),
    T2Mode(FftMode.FFT_16K, GuardInterval.G19_256, PilotPattern.PP4, True, n_data_symbols=30),
    T2Mode(FftMode.FFT_8K, GuardInterval.G1_8, PilotPattern.PP8, True, n_data_symbols=30),
    T2Mode(FftMode.FFT_8K, GuardInterval.G1_4, PilotPattern.PP1, False, n_data_symbols=30),
    T2Mode(FftMode.FFT_4K, GuardInterval.G1_16, PilotPattern.PP5, False, n_data_symbols=30),
    T2Mode(FftMode.FFT_2K, GuardInterval.G1_32, PilotPattern.PP7, False, n_data_symbols=30),
    T2Mode(FftMode.FFT_1K, GuardInterval.G1_16, PilotPattern.PP1, False, n_data_symbols=30),
]


@pytest.mark.parametrize("mode", CONFIGS, ids=lambda m: f"{m.fft_size}-{m.pilot_pattern.name}")
def test_carrier_map_counts_match_etsi_tables(mode):
    """DATA carrier counts must equal the standard's C_P2/C_data/N_FC."""
    mode.validate()
    p2 = pilots.p2_carrier_map(mode)
    assert int((p2 == pilots.DATA).sum()) == mode.c_p2
    for cyc in range(mode.dy):
        dm = pilots.data_carrier_map(mode, cyc)
        assert int((dm == pilots.DATA).sum()) == mode.c_data, cyc
    if mode.has_fc:
        fc = pilots.fc_carrier_map(mode)
        assert int((fc == pilots.DATA).sum()) == mode.n_fc


def test_reference_symbol_amplitudes():
    mode = CONFIGS[0]
    ref = pilots.reference_symbol(mode, mode.n_p2 + 1)   # a data symbol
    nz = ref[ref != 0]
    expected = np.array([mode.sp_amplitude, mode.cp_amplitude])
    dist = np.abs(np.abs(nz)[:, None] - expected[None, :]).min(axis=1)
    assert dist.max() < 1e-5
    p2ref = pilots.reference_symbol(mode, 0)
    nz2 = p2ref[p2ref != 0]
    assert np.abs(np.abs(nz2) - mode.p2_amplitude).max() < 1e-5


# ---------------------------------------------------------------------------
# Interleavers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", CONFIGS[:5], ids=lambda m: f"{m.fft_size}-{m.pilot_pattern.name}")
def test_freq_interleaver_bijective(mode):
    for n_cells in {mode.c_p2, mode.c_data} | ({mode.n_fc} if mode.has_fc else set()):
        h_even, h_odd = freq_interleaver.tx_permutations(mode.fft_size, n_cells)
        for h in (h_even, h_odd):
            assert len(h) == n_cells
            assert np.array_equal(np.sort(h), np.arange(n_cells))


def test_freq_interleaver_32k_even_is_inverse_of_odd():
    h_even, h_odd = freq_interleaver.tx_permutations(32768, 22432)
    assert np.array_equal(h_even[h_odd], np.arange(22432))


@pytest.mark.parametrize("n_cells", [8100, 4050, 2700, 2025, 32400, 16200, 10800])
def test_cell_interleaver_bijective(n_cells):
    perm = cell_interleaver.tx_permutations(n_cells, 4)
    for r in range(4):
        assert np.array_equal(np.sort(perm[r]), np.arange(n_cells))
    # per-block shifts must differ
    assert len({tuple(p) for p in perm}) == 4


def test_time_interleaver_roundtrip():
    n_cells, n_fec = 8100, 3
    rng = np.random.default_rng(0)
    cells = (rng.standard_normal((n_fec, n_cells))
             + 1j * rng.standard_normal((n_fec, n_cells))).astype(np.complex64)
    stream = time_interleaver.tx_interleave(cells, n_fec)
    back = time_interleaver.rx_deinterleave(stream, n_cells, n_fec)
    np.testing.assert_allclose(back, cells, rtol=1e-6)


@pytest.mark.parametrize("const,fec,rate", [
    (Constellation.QPSK, FecFrame.NORMAL, CodeRate.C1_2),
    (Constellation.QAM16, FecFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM16, FecFrame.SHORT, CodeRate.C1_2),
    (Constellation.QAM64, FecFrame.NORMAL, CodeRate.C2_3),
    (Constellation.QAM64, FecFrame.SHORT, CodeRate.C3_4),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C2_3),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C4_5),
    (Constellation.QAM256, FecFrame.SHORT, CodeRate.C5_6),
])
def test_bit_interleaver_bijective(const, fec, rate):
    tx = bit_interleaver.tx_map(const, fec, rate)
    n = modes.FEC_SIZE_NORMAL if fec == FecFrame.NORMAL else modes.FEC_SIZE_SHORT
    assert len(tx) == n
    assert np.array_equal(np.sort(tx), np.arange(n))
    rx = bit_interleaver.rx_gather(const, fec, rate)
    assert np.array_equal(tx[rx], np.arange(n))


# ---------------------------------------------------------------------------
# LDPC
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["NORMAL_C1_2", "NORMAL_C2_3", "NORMAL_C5_6",
                                  "SHORT_C1_2", "SHORT_C3_4"])
def test_ldpc_encode_satisfies_checks(name):
    code = ldpc.get_code(name)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=code.k, dtype=np.uint8)
    cw = code.encode(bits)
    assert cw.shape == (code.n,)
    assert code.check(cw)
    bad = cw.copy()
    bad[100] ^= 1
    assert not code.check(bad)


@pytest.mark.parametrize("name", ["NORMAL_C2_3", "SHORT_C1_2"])
def test_ldpc_plan_consistency(name):
    code = ldpc.get_code(name)
    plan = code.plan
    # every info bit's links appear exactly deg times in var_of_check
    counts = np.bincount(plan.var_of_check[plan.var_of_check >= 0], minlength=code.k)
    assert np.array_equal(counts, plan.deg_var)
    assert plan.cnt_check.sum() + 2 * code.r - 1 == code.table.links_total
    # check_of_var round trip: the check slot it names must point back
    v = np.arange(code.k)
    for d in range(plan.deg_max):
        sel = plan.check_of_var[:, d]
        ok = sel >= 0
        r, c = sel[ok] // plan.cnl, sel[ok] % plan.cnl
        assert np.array_equal(plan.var_of_check[r, c], v[ok])


# ---------------------------------------------------------------------------
# BCH
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,k", [(16, 32208), (14, 7032)])
def test_bch_roundtrip_and_correction(m, k):
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 2, size=k, dtype=np.uint8)
    cw = bch.encode(msg, m)
    assert len(cw) == k + 12 * m
    assert not bch.syndromes(cw, m).any()
    # flip up to t=12 errors and correct
    bad = cw.copy()
    pos = rng.choice(len(cw), size=12, replace=False)
    bad[pos] ^= 1
    fixed, n = bch.decode(bad, m)
    assert n == 12
    np.testing.assert_array_equal(fixed, cw)
    # 13 errors must be flagged as failure (or miscorrect-detected)
    bad2 = cw.copy()
    pos2 = rng.choice(len(cw), size=13, replace=False)
    bad2[pos2] ^= 1
    _, n2 = bch.decode(bad2, m)
    assert n2 == -1 or n2 > 0  # usually -1; miscorrection possible in theory


def test_bch_parity_check_matrix():
    m, k = 14, 7032
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, size=k, dtype=np.uint8)
    cw = bch.encode(msg, m)
    h = bch.parity_check_matrix(k, m)
    assert np.all((cw.astype(np.int64) @ h.astype(np.int64)) % 2 == 0)


def test_t2_lite_rate_params_match_tables():
    """T2-Lite BCH/LDPC sizes (EN 302 755 annex I) pinned against the
    bundled annex C table archive (B8 = rate 1/3, B9 = rate 2/5)."""
    from sdr_receiver_dvb_t2_tpu.params import tables
    from sdr_receiver_dvb_t2_tpu.params.modes import (BCH_PARAMS,
                                                      LDPC_TABLE_NAME,
                                                      CodeRate, FecFrame)
    for rate in (CodeRate.C1_3, CodeRate.C2_5):
        name = LDPC_TABLE_NAME[(FecFrame.SHORT, rate)]
        t = tables.ldpc_table(name)
        n_bch, k_bch = BCH_PARAMS[(FecFrame.SHORT, rate)]
        assert t.N == 16200
        assert t.K == n_bch, (name, t.K, n_bch)
        assert n_bch - k_bch == 168        # t=12 over GF(2^14), all SHORT
