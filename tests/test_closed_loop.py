"""Closed-loop TX -> RX oracle tests: bit-exact TS recovery, ideal channel."""
import dataclasses

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.models.transmitter import (
    Transmitter, TxConfig, random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.receiver_ref import ReferenceReceiver
from sdr_receiver_dvb_t2_tpu.params import p1
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame, Papr)


CASES = [
    # (mode, plp, blocks_per_frame, l1_post_mod, hem)
    pytest.param(
        T2Mode(FftMode.FFT_8K, GuardInterval.G1_32, PilotPattern.PP3, True,
               n_data_symbols=20),
        PlpConfig(constellation=Constellation.QAM64, code_rate=CodeRate.C2_3,
                  fec_frame=FecFrame.SHORT, time_il_length=3),
        6, 1, True, id="8k-64qam-short-hem-fc"),
    pytest.param(
        T2Mode(FftMode.FFT_32K, GuardInterval.G1_128, PilotPattern.PP7, True,
               n_data_symbols=10),
        PlpConfig(constellation=Constellation.QAM256, code_rate=CodeRate.C2_3,
                  fec_frame=FecFrame.NORMAL, time_il_length=3),
        3, 1, True, id="32k-256qam-normal-hem"),
    pytest.param(
        T2Mode(FftMode.FFT_16K, GuardInterval.G19_256, PilotPattern.PP4, True,
               n_data_symbols=12),
        PlpConfig(constellation=Constellation.QPSK, code_rate=CodeRate.C1_2,
                  fec_frame=FecFrame.SHORT, rotation=False, time_il_length=2),
        4, 0, False, id="16k-qpsk-short-nm-bpsk_l1"),
    pytest.param(
        T2Mode(FftMode.FFT_4K, GuardInterval.G1_16, PilotPattern.PP5, False,
               n_data_symbols=16),
        PlpConfig(constellation=Constellation.QAM16, code_rate=CodeRate.C3_5,
                  fec_frame=FecFrame.SHORT, time_il_length=1),
        5, 2, True, id="4k-16qam-c35-16qam_l1"),
    pytest.param(
        T2Mode(FftMode.FFT_2K, GuardInterval.G1_32, PilotPattern.PP7, False,
               n_data_symbols=24),
        PlpConfig(constellation=Constellation.QAM64, code_rate=CodeRate.C3_4,
                  fec_frame=FecFrame.SHORT, time_il_length=3),
        3, 3, True, id="2k-64qam-c34-64qam_l1"),
]


@pytest.mark.parametrize("mode,plp,blocks,l1mod,hem", CASES)
def test_closed_loop_bit_exact(mode, plp, blocks, l1mod, hem):
    cfg = TxConfig(mode=mode, plp=plp, hem=hem, l1_post_mod=l1mod,
                   fec_blocks_per_frame=blocks)
    tx = Transmitter(cfg)
    ts_in = random_ts_stream(400)
    iq = tx.modulate(ts_in)
    n_frames = len(iq) // mode.frame_samples
    assert n_frames >= 1
    rx = ReferenceReceiver(mode)
    recovered = []
    for f in range(n_frames):
        res = rx.receive_frame(
            iq[f * mode.frame_samples:(f + 1) * mode.frame_samples], plp)
        assert res is not None, "L1 decode failed"
        assert res.ldpc_ok.all()
        assert (res.bch_errors == 0).all()
        # L1 round trip
        assert res.l1_post.plp[0].plp_mod == plp.constellation.value
        assert res.l1_post.plp[0].plp_cod == plp.code_rate.value
        # FRAME_IDX wraps at NUM_T2_FRAMES within the superframe
        assert res.l1_post.dyn.frame_idx == f % cfg.num_t2_frames
        recovered.append(res.ts_bytes)
    out = np.concatenate(recovered)
    assert len(out) > 0
    # TX buffers partial packets across frames; compare the overlap
    assert np.array_equal(out, ts_in[:len(out)])
    # all recovered packets are aligned and sync'd
    assert (out.reshape(-1, 188)[:, 0] == 0x47).all()


def test_p1_generate_decode_roundtrip():
    for s1 in (0, 1, 3):
        for s2 in (0, 5, 11, 15):
            sym = p1.generate(s1, s2)
            assert sym.shape == (2048,)
            a = sym[p1.P1_C:p1.P1_C + p1.P1_A]
            spec = np.fft.fftshift(np.fft.fft(a))
            got = p1.decode_a_spectrum(spec)
            assert got is not None
            assert got[:2] == (s1, s2) and got[2] == 0


def test_p1_decode_with_integer_offset():
    sym = p1.generate(0, 5)
    a = sym[p1.P1_C:p1.P1_C + p1.P1_A]
    # integer CFO of +3 carrier spacings shifts the spectrum by +3 bins
    n = np.arange(p1.P1_A)
    a_shift = a * np.exp(2j * np.pi * 3 * n / p1.P1_A)
    spec = np.fft.fftshift(np.fft.fft(a_shift))
    got = p1.decode_a_spectrum(spec)
    assert got is not None and got[:2] == (0, 5) and got[2] == 3


def test_p1_guard_structure():
    """C and B parts must be frequency-shifted copies of A's edges."""
    sym = p1.generate(0, 5)
    c, a, b = sym[:542], sym[542:1566], sym[1566:]
    n = np.arange(1024)
    shift = np.exp(2j * np.pi * n / 1024)
    np.testing.assert_allclose(c, a[:542] * shift[:542], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(b, a[542:] * shift[542:], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("fft,gi,pp,ext,nds", [
    (FftMode.FFT_1K, GuardInterval.G1_16, PilotPattern.PP4, False, 20),
    (FftMode.FFT_4K, GuardInterval.G1_32, PilotPattern.PP5, False, 16),
    (FftMode.FFT_16K, GuardInterval.G19_256, PilotPattern.PP4, True, 6),
])
def test_blind_acquisition_all_fft_sizes(fft, gi, pp, ext, nds):
    """acquire_mode identifies GI/PP/EXT blindly on every FFT size."""
    from sdr_receiver_dvb_t2_tpu.runtime import acquisition
    from sdr_receiver_dvb_t2_tpu.params import p1 as p1_mod
    plp = PlpConfig(constellation=Constellation.QPSK,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=False, time_il_length=1)
    mode = T2Mode(fft_mode=fft, guard=gi, pilot_pattern=pp,
                  extended_carriers=ext, n_data_symbols=nds).validate()
    n_fec = min(4, (mode.frame_cells - 2500) // plp.cells_per_fec_block)
    tx = Transmitter(TxConfig(mode=mode, plp=plp,
                              fec_blocks_per_frame=n_fec, num_t2_frames=2))
    ts = random_ts_stream(3 * n_fec * (plp.k_bch // 8 - 10) // 188)
    iq = tx.modulate(ts)
    rng = np.random.default_rng(0)
    iq = iq + ((rng.standard_normal(len(iq))
                + 1j * rng.standard_normal(len(iq))).astype(np.complex64)
               * np.sqrt(np.mean(np.abs(iq) ** 2) / 1e3))
    s2 = {1024: 3, 2048: 0, 4096: 2, 8192: 1, 16384: 4}[mode.fft_size]
    res = acquisition.acquire_mode(iq[p1_mod.P1_LEN:], 0, s2)
    assert res is not None
    assert res.mode.guard == gi
    assert res.mode.pilot_pattern == pp
    assert res.mode.extended_carriers == ext


@pytest.mark.slow
def test_tr_papr_round_trip():
    """TR-PAPR mode: reserved-tone cells are excluded from the payload map
    on both sides; TS survives exactly."""
    from sdr_receiver_dvb_t2_tpu.models import receiver as receiver_mod
    mode = T2Mode(
        fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
        pilot_pattern=PilotPattern.PP7, extended_carriers=False,
        papr=Papr.TR, n_data_symbols=30).validate()
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=2))
    ts = random_ts_stream(150, seed=1)
    iq = tx.modulate(ts)[:2 * mode.frame_samples].reshape(2, -1)
    rng = np.random.default_rng(0)
    iq = (iq + (rng.standard_normal(iq.shape)
                + 1j * rng.standard_normal(iq.shape))
          * np.sqrt(np.mean(np.abs(iq) ** 2) / 1e3)).astype(np.complex64)
    rx = receiver_mod.TpuReceiver(receiver_mod.RxConfig(
        mode=mode, plp=plp, n_fec_per_frame=4, n_ti=1, use_pallas=False))
    rx.prime(iq[0])
    res = rx.receive(iq)
    assert np.all(res.ldpc_ok)
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


def test_tr_papr_actually_reduces_peaks():
    """The TX fixture computes a real clause-9.3.2 tone-reservation
    correction (iterative peak cancellation), not zeroed tones: the
    reserved cells carry energy within the spec's amplitude-5 cap and
    the symbol PAPR drops measurably.  This also makes the round-trip
    test above exercise the receiver's exclusion of NON-zero TR cells."""
    from sdr_receiver_dvb_t2_tpu.params import pilots
    mode = T2Mode(
        fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
        pilot_pattern=PilotPattern.PP7, extended_carriers=False,
        papr=Papr.TR, n_data_symbols=30).validate()
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=2))
    rng = np.random.default_rng(5)
    cells = ((1 - 2 * rng.integers(0, 2, mode.c_data))
             + 1j * (1 - 2 * rng.integers(0, 2, mode.c_data))
             ).astype(np.complex64) / np.sqrt(2)
    sym = mode.n_p2 + 1                        # a plain data symbol
    didx = pilots.data_cell_indices(mode, sym)
    carriers = pilots.reference_frame(mode)[sym].astype(np.complex64)
    carriers[didx] = cells

    def papr_db(c):
        x = tx._ofdm_symbol(c)
        p = np.abs(x) ** 2
        return 10 * np.log10(p.max() / p.mean())

    reduced = tx._tr_reduce(carriers, sym)
    tr = pilots.tr_cell_indices(mode, sym)
    assert len(tr) > 0
    assert np.any(np.abs(reduced[tr]) > 0.1), "reserved tones unused"
    assert np.all(np.abs(reduced[tr]) <= 5.0 + 1e-6), "amplitude cap"
    # payload/pilot carriers untouched
    mask = np.ones(mode.k_total, bool)
    mask[tr] = False
    assert np.array_equal(reduced[mask], carriers[mask])
    gain = papr_db(carriers) - papr_db(reduced)
    assert gain > 0.8, f"PAPR gain only {gain:.2f} dB"


def test_ace_papr_round_trip():
    """ACE PAPR (clause 9.3.1): outer constellation points are extended
    outward by the TX clipping loop, the frame PAPR measurably drops,
    and the receiver decodes the extended cells TS-exact without any
    cooperation (outward extension only adds demap margin)."""
    from sdr_receiver_dvb_t2_tpu.models import receiver as receiver_mod
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=False, time_il_length=1)
    ts = random_ts_stream(150, seed=4)
    frames = {}
    for papr in (Papr.OFF, Papr.ACE):
        mode = T2Mode(
            fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
            pilot_pattern=PilotPattern.PP7, extended_carriers=False,
            papr=papr, n_data_symbols=30).validate()
        tx = Transmitter(TxConfig(mode=mode, plp=plp,
                                  fec_blocks_per_frame=4, num_t2_frames=2))
        frames[papr] = tx.modulate(ts)[:2 * mode.frame_samples]

    def papr_db(x):
        p = np.abs(x) ** 2
        return 10 * np.log10(p.max() / p.mean())

    gain = papr_db(frames[Papr.OFF]) - papr_db(frames[Papr.ACE])
    assert gain > 0.5, f"ACE gain only {gain:.2f} dB"

    mode = T2Mode(
        fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
        pilot_pattern=PilotPattern.PP7, extended_carriers=False,
        papr=Papr.ACE, n_data_symbols=30).validate()
    iq = frames[Papr.ACE].reshape(2, -1)
    rng = np.random.default_rng(0)
    iq = (iq + (rng.standard_normal(iq.shape)
                + 1j * rng.standard_normal(iq.shape))
          * np.sqrt(np.mean(np.abs(iq) ** 2) / 1e3)).astype(np.complex64)
    rx = receiver_mod.TpuReceiver(receiver_mod.RxConfig(
        mode=mode, plp=plp, n_fec_per_frame=4, n_ti=1, use_pallas=False))
    rx.prime(iq[0])
    res = rx.receive(iq)
    assert np.all(res.ldpc_ok)
    got, sync = res.ts_bytes.tobytes(), ts.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]

    with pytest.raises(ValueError):
        Transmitter(TxConfig(
            mode=mode,
            plp=dataclasses.replace(plp, rotation=True),
            fec_blocks_per_frame=4, num_t2_frames=2))
