"""Headline benchmark: 32K-FFT DVB-T2 receive throughput per chip.

Measures the steady-state device pipeline on the flagship configuration
(32K FFT, GI 1/128, PP7 extended, 256QAM rotated, LDPC 64800 r2/3 — the
reference's tested HEM mode, /root/reference/README:29-41): OFDM demod ->
pilot equalization + frequency deinterleave -> time/cell/bit deinterleave +
soft demap -> LDPC decode (Pallas on TPU) -> BCH syndrome screen.

Prints ONE JSON line:
  {"metric": "iq_msps_per_chip_32k", "value": <IQ Msamples/s>,
   "unit": "Msps", "vs_baseline": <real-time factor at 64/7 Msps>}

vs_baseline: the reference runs this pipeline at ~1x real time (8 MHz,
64/7 Msps) on an i5-8600 (BASELINE.md); value / 9.142857 is therefore the
speedup over the reference's implied headline number.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

CACHE = Path(__file__).resolve().parent / ".bench_cache_32k.npz"
ELEM_RATE = 64e6 / 7.0


def _config():
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_128,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                  n_data_symbols=59)
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1, num_blocks_max=254)
    return mode, plp


def _make_signal(mode, plp, n_frames=2, snr_db=27.0):
    """Real modulated frames + AWGN at elementary rate (cached on disk)."""
    if CACHE.exists():
        z = np.load(CACHE)
        if int(z["n_frames"]) == n_frames:
            return z["frames"], int(z["n_fec"]), int(z["l1_post_cells"])
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (
        Transmitter, TxConfig, random_ts_stream)
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    # fill the frame: capacity in FEC blocks
    tmp = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=1,
                               num_t2_frames=n_frames))
    l1_cells = l1_mod.L1_PRE_CELLS + tmp.l1_pre.l1_post_size
    n_fec = (mode.frame_cells - l1_cells) // plp.cells_per_fec_block
    tx = Transmitter(TxConfig(mode=mode, plp=plp,
                              fec_blocks_per_frame=n_fec,
                              num_t2_frames=n_frames))
    bytes_needed = (n_frames + 1) * n_fec * (plp.k_bch // 8)
    ts = random_ts_stream(bytes_needed // 188, seed=7)
    iq = tx.modulate(ts)[:n_frames * mode.frame_samples]
    iq = iq.reshape(n_frames, mode.frame_samples)
    rng = np.random.default_rng(11)
    npow = np.mean(np.abs(iq) ** 2) / 10 ** (snr_db / 10)
    iq = iq + ((rng.standard_normal(iq.shape) + 1j * rng.standard_normal(iq.shape))
               * np.sqrt(npow / 2)).astype(np.complex64)
    frames = iq.astype(np.complex64)
    np.savez(CACHE, frames=frames, n_fec=n_fec,
             l1_post_cells=tmp.l1_pre.l1_post_size, n_frames=n_frames)
    return frames, n_fec, tmp.l1_pre.l1_post_size


def main():
    from sdr_receiver_dvb_t2_tpu.ops import (cplx, rx_chain, ldpc_decode,
                                             ldpc_pallas, bch_ops)
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod

    mode, plp = _config()
    on_tpu = jax.devices()[0].platform == "tpu"
    n_frames = 8 if on_tpu else 2
    frames, n_fec, l1_post_cells = _make_signal(mode, plp, n_frames)

    plan = rx_chain.get_plan(mode, plp, n_fec, 1,
                             l1_mod.L1_PRE_CELLS + l1_post_cells)
    n_cw = n_frames * n_fec
    if on_tpu:
        tiles = -(-n_cw // 128)
        decoder = ldpc_pallas.make_pallas_decoder(
            plp.ldpc_table_name, batch=128, n_tiles=tiles, max_iters=15,
            bch_h=bch_ops._h_matrix(plp.k_bch, plp.bch_m, plp.bch_t))
        n_pad = tiles * 128
    else:
        decoder = ldpc_decode.make_decoder_t(plp.ldpc_table_name,
                                             max_iters=15)
        n_pad = n_cw
    # Two chained jits (demod->LLR, then FEC): the tunnel runtime aborts on
    # very long single-program compiles, and stage-level jits match how the
    # streaming runtime dispatches anyway. No host round-trip in between.
    consts = plan.device_consts()

    @jax.jit
    def to_llr(frames_iq, c):
        llr_t, diag = rx_chain.frames_to_llr_t(frames_iq, plan, c)
        llr_t = llr_t.astype(jnp.int8)      # int8 handoff between stages
        if n_pad > llr_t.shape[1]:
            llr_t = jnp.concatenate(
                [llr_t, jnp.zeros((llr_t.shape[0], n_pad - llr_t.shape[1]),
                                  jnp.int8)], axis=1)
        return llr_t, jnp.mean(diag["snr_db"])

    @jax.jit
    def fec(llr_t):
        out = decoder(llr_t)
        if len(out) == 4:                    # Pallas: BCH screen fused
            hard_t, ok, iters, clean = out
            return ok[:n_cw], clean[:n_cw], iters
        hard_t, ok, iters = out
        clean = bch_ops.syndrome_flags_t(hard_t[:plp.n_bch, :n_cw], plp)
        return ok[:n_cw], clean, iters

    def pipeline(frames_iq):
        llr, snr = to_llr(frames_iq, consts)
        ok, clean, iters = fec(llr)
        return ok, clean, iters, snr

    dev_frames = jax.device_put(cplx.from_np(frames))
    llr_probe, _snr0 = to_llr(dev_frames, consts)
    ok, clean, iters, snr = jax.block_until_ready(pipeline(dev_frames))
    n_ok = int(np.sum(np.asarray(ok)))
    sys.stderr.write(
        f"bench sanity: platform={jax.devices()[0].platform} n_cw={n_cw} "
        f"ldpc_ok={n_ok}/{n_cw} bch_clean={int(np.sum(np.asarray(clean)))} "
        f"iters={int(np.max(np.asarray(iters)))} snr={float(snr):.1f} dB\n")

    # timed steady-state loop (value read forces completion; the tunnel's
    # block_until_ready does not reliably sync).  reps must be large: the
    # tunnel's first post-sync dispatch costs ~20 ms and only ~50+ queued
    # dispatches amortize it to the ~1 ms sustained floor a continuously
    # streaming receiver sees.
    reps = 50 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pipeline(dev_frames)
    _ = int(np.asarray(out[2]).max())
    dt = time.perf_counter() - t0
    samples = n_frames * mode.frame_samples * reps
    msps = samples / dt / 1e6
    rtf = msps * 1e6 / ELEM_RATE
    # the headline goes out FIRST (and flushed): the secondary metrics
    # below compile additional programs through the (slow) tunnel compiler
    # and must not cost the primary result if a runner timeout hits
    print(json.dumps({"metric": "iq_msps_per_chip_32k",
                      "value": round(msps, 3), "unit": "Msps",
                      "vs_baseline": round(rtf, 3)}), flush=True)

    # secondary metrics (BASELINE.md headline set), stderr only
    t0 = time.perf_counter()
    for _ in range(reps):
        f_out = fec(llr_probe)
    _ = int(np.asarray(f_out[2]).max())
    ldpc_dt = time.perf_counter() - t0
    ldpc_mbps = n_pad * 64800 * reps / ldpc_dt / 1e6
    sys.stderr.write(
        f"secondary: ldpc {ldpc_mbps:.0f} Mbit/s coded "
        f"({n_pad} codewords/batch); pipeline {rtf:.1f}x real time\n")

    # TRUE end-to-end streaming rate: the full receiver surface including
    # the packed device->host transfer and native BB de-encapsulation to TS
    # bytes (the compute-only headline excludes those).  The fetch is
    # DOUBLE-BUFFERED (receive_stream): batch N+1's device work is
    # dispatched before batch N's transfer synchronizes, so d2h overlaps
    # compute.  On this tunnel runtime the d2h link (~2-30 MB/s) bounds
    # the result either way; on a directly-attached chip the 8x-packed
    # transfer (~5.4 MB per 15.9M-sample batch) rides PCIe and the
    # end-to-end rate tracks the compute rate.
    from sdr_receiver_dvb_t2_tpu.models.receiver import TpuReceiver, RxConfig
    rx = TpuReceiver(RxConfig(mode=mode, plp=plp, n_fec_per_frame=n_fec,
                              n_ti=1, use_pallas=on_tpu))
    rx._l1_post_cells = l1_post_cells
    res = rx.receive(frames)                     # warm-up/compile
    e2e_reps = 6 if on_tpu else 1
    # synchronous baseline first (the pre-overlap number), then overlapped
    t0 = time.perf_counter()
    ts_total = 0
    for _ in range(e2e_reps):
        res = rx.receive(frames)
        ts_total += len(res.ts_bytes)
    sync_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for res in rx.receive_stream(frames for _ in range(e2e_reps)):
        pass
    e2e_dt = time.perf_counter() - t0
    e2e_msps = n_frames * mode.frame_samples * e2e_reps / e2e_dt / 1e6
    sync_msps = n_frames * mode.frame_samples * e2e_reps / sync_dt / 1e6
    sys.stderr.write(
        f"secondary: end-to-end (incl. d2h + TS out) {e2e_msps:.1f} Msps = "
        f"{e2e_msps * 1e6 / ELEM_RATE:.1f}x real time double-buffered "
        f"(synchronous: {sync_msps * 1e6 / ELEM_RATE:.1f}x), "
        f"{ts_total // 188 // e2e_reps} TS pkts/batch "
        f"(tunnel d2h-bound; see BENCH notes)\n")

    # round-3 capability paths on the REAL chip (VERDICT r3 next #4):
    # Wiener/temporal-union equalization (SFN) and MISO Alamouti.  Each is
    # throughput-measured on the same two-stage pipeline as the headline;
    # failures must not cost the already-printed headline.
    for variant in (_bench_sfn, _bench_miso):
        try:
            variant(on_tpu)
        except Exception as e:                    # pragma: no cover
            sys.stderr.write(f"secondary {variant.__name__} FAILED: "
                             f"{type(e).__name__}: {e}\n")


def _pipeline_throughput(tag, mode, plp, frames, n_fec, l1_post_cells,
                         on_tpu, sfn=False):
    """Time the two-stage (demod->LLR, FEC) pipeline for one variant."""
    from sdr_receiver_dvb_t2_tpu.ops import (cplx, rx_chain, ldpc_decode,
                                             ldpc_pallas, bch_ops)
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    n_frames = frames.shape[0]
    plan = rx_chain.get_plan(mode, plp, n_fec, 1,
                             l1_mod.L1_PRE_CELLS + l1_post_cells, sfn=sfn)
    n_cw = n_frames * n_fec
    if on_tpu:
        tiles = -(-n_cw // 128)
        decoder = ldpc_pallas.make_pallas_decoder(
            plp.ldpc_table_name, batch=128, n_tiles=tiles, max_iters=15,
            bch_h=bch_ops._h_matrix(plp.k_bch, plp.bch_m, plp.bch_t))
        n_pad = tiles * 128
    else:
        decoder = ldpc_decode.make_decoder_t(plp.ldpc_table_name,
                                             max_iters=15)
        n_pad = n_cw
    consts = plan.device_consts()

    @jax.jit
    def to_llr(frames_iq, c):
        llr_t, diag = rx_chain.frames_to_llr_t(frames_iq, plan, c)
        llr_t = llr_t.astype(jnp.int8)
        if n_pad > llr_t.shape[1]:
            llr_t = jnp.concatenate(
                [llr_t, jnp.zeros((llr_t.shape[0], n_pad - llr_t.shape[1]),
                                  jnp.int8)], axis=1)
        return llr_t, jnp.mean(diag["snr_db"])

    @jax.jit
    def fec(llr_t):
        out = decoder(llr_t)
        if len(out) == 4:
            hard_t, ok, iters, clean = out
            return ok[:n_cw], clean[:n_cw], iters
        hard_t, ok, iters = out
        clean = bch_ops.syndrome_flags_t(hard_t[:plp.n_bch, :n_cw], plp)
        return ok[:n_cw], clean, iters

    def pipeline(frames_iq):
        llr, snr = to_llr(frames_iq, consts)
        ok, clean, iters = fec(llr)
        return ok, clean, iters, snr

    dev_frames = jax.device_put(cplx.from_np(frames))
    ok, clean, iters, snr = jax.block_until_ready(pipeline(dev_frames))
    n_clean = int(np.sum(np.asarray(clean)))
    reps = 25 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pipeline(dev_frames)
    _ = int(np.asarray(out[2]).max())
    dt = time.perf_counter() - t0
    msps = n_frames * mode.frame_samples * reps / dt / 1e6
    sys.stderr.write(
        f"secondary: {tag} {msps:.1f} Msps = "
        f"{msps * 1e6 / ELEM_RATE:.1f}x real time "
        f"(bch_clean {n_clean}/{n_cw}, snr {float(snr):.1f} dB)\n")


def _variant_frames(cache, make):
    if cache.exists():
        z = np.load(cache)
        return z["frames"], int(z["n_fec"]), int(z["l1_post_cells"])
    frames, n_fec, l1pc = make()
    np.savez(cache, frames=frames, n_fec=n_fec, l1_post_cells=l1pc)
    return frames, n_fec, l1pc


def _frame_capacity(mode, plp, n_frames):
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                            TxConfig)
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    tmp = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=1,
                               num_t2_frames=n_frames))
    l1_cells = l1_mod.L1_PRE_CELLS + tmp.l1_pre.l1_post_size
    n_fec = (mode.frame_cells - l1_cells) // plp.cells_per_fec_block
    return n_fec, tmp.l1_pre.l1_post_size


def _bench_sfn(on_tpu):
    """Wiener rows + temporal-union pilots (the SFN equalizer) on a 32K
    mode whose per-row pilot reach is below the guard — the plan is
    SFN-grade by construction (ops/equalizer.sfn_reach_gated), with an
    in-guard echo in the signal so the path is exercised for real."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (
        Transmitter, TxConfig, random_ts_stream)
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_32,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                  n_data_symbols=59).validate()
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1, num_blocks_max=254)
    n_frames = 4 if on_tpu else 1

    def make():
        n_fec, l1pc = _frame_capacity(mode, plp, n_frames + 1)
        tx = Transmitter(TxConfig(mode=mode, plp=plp,
                                  fec_blocks_per_frame=n_fec,
                                  num_t2_frames=n_frames + 1))
        ts = random_ts_stream(
            (n_frames + 2) * n_fec * (plp.k_bch // 8) // 188, seed=13)
        iq = tx.modulate(ts)[:(n_frames + 1) * mode.frame_samples]
        # -10 dB echo at 60% of the guard; drop frame 0 (echo warm-up)
        d = int(0.6 * mode.guard_size)
        echo = np.concatenate([np.zeros(d, np.complex64), iq[:-d]])
        iq = iq + 0.32 * echo
        rng = np.random.default_rng(29)
        npow = np.mean(np.abs(iq) ** 2) / 10 ** (27.0 / 10)
        iq = iq + ((rng.standard_normal(len(iq))
                    + 1j * rng.standard_normal(len(iq)))
                   * np.sqrt(npow / 2)).astype(np.complex64)
        frames = iq[mode.frame_samples:].reshape(n_frames,
                                                 mode.frame_samples)
        return frames.astype(np.complex64), n_fec, l1pc

    cache = Path(__file__).resolve().parent / ".bench_cache_sfn.npz"
    frames, n_fec, l1pc = _variant_frames(cache, make)
    _pipeline_throughput("sfn/wiener 32K GI1/32", mode, plp, frames,
                         n_fec, l1pc, on_tpu)


def _bench_miso(on_tpu):
    """MISO (Alamouti) on 32K: distinct per-TX-group channels summed at
    the antenna; the receiver separates h1/h2 from the inverted pilots
    and pair-combines (beyond the reference, whose MISO is vestigial)."""
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (
        Transmitter, TxConfig, random_ts_stream)
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)
    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_128,
                  pilot_pattern=PilotPattern.PP8, extended_carriers=True,
                  n_data_symbols=59, miso=True).validate()
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1, num_blocks_max=254)
    n_frames = 4 if on_tpu else 1

    def make():
        n_fec, l1pc = _frame_capacity(mode, plp, n_frames)
        tx = Transmitter(TxConfig(mode=mode, plp=plp,
                                  fec_blocks_per_frame=n_fec,
                                  num_t2_frames=n_frames))
        ts = random_ts_stream(
            (n_frames + 1) * n_fec * (plp.k_bch // 8) // 188, seed=17)
        iq1, iq2 = tx.modulate(ts)
        n = n_frames * mode.frame_samples
        iq1, iq2 = iq1[:n], iq2[:n]
        g1 = np.zeros(64, np.complex64)
        g1[0], g1[23] = 0.9 * np.exp(1j * 0.3), 0.22 * np.exp(-1j * 2.1)
        g2 = np.zeros(64, np.complex64)
        g2[4], g2[41] = 0.6 * np.exp(1j * 1.2), 0.18 * np.exp(1j * 0.4)
        rxs = (np.convolve(iq1, g1)[:n] + np.convolve(iq2, g2)[:n])
        rng = np.random.default_rng(31)
        npow = np.mean(np.abs(rxs) ** 2) / 10 ** (27.0 / 10)
        rxs = rxs + ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
                     * np.sqrt(npow / 2)).astype(np.complex64)
        frames = rxs.reshape(n_frames, mode.frame_samples)
        return frames.astype(np.complex64), n_fec, l1pc

    cache = Path(__file__).resolve().parent / ".bench_cache_miso.npz"
    frames, n_fec, l1pc = _variant_frames(cache, make)
    _pipeline_throughput("miso/alamouti 32K PP8", mode, plp, frames,
                         n_fec, l1pc, on_tpu)


if __name__ == "__main__":
    main()
