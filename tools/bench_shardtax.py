#!/usr/bin/env python3
"""shard_map tax at n=1 on the real chip (BENCH.md scaling evidence).

Times the pod's sharded receive step (plane + fec shard_map jits, 1x1
mesh, window front end) against an UNSHARDED twin — the same front end,
equalizer, demap and decoder called in a plain jit with the collectives
removed (psum/pmean over a 1-extent axis are identity; the twin simply
omits them).  The difference is the pure overhead of running the
pipeline under shard_map — the fixed cost every mesh shape pays.

Both variants are timed device-side (dispatch N reps, force with ONE
small read) so the tunnel's d2h link cannot contaminate the comparison.

Run on the TPU host:   python tools/bench_shardtax.py [--frames 4]
(CPU fallback works but measures the virtual backend, not the chip.)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4,
                   help="frames per step (one shard holds all of them)")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from sdr_receiver_dvb_t2_tpu.ops import cplx, rx_chain, bch_ops
    from sdr_receiver_dvb_t2_tpu.parallel import sharding
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)

    on_tpu = jax.devices()[0].platform == "tpu"
    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_128,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                  n_data_symbols=59)
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1, num_blocks_max=254)
    from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                            TxConfig)
    tmp = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=1,
                               num_t2_frames=2))
    l1pc = tmp.l1_pre.l1_post_size
    n_fec = (mode.frame_cells - l1_mod.L1_PRE_CELLS
             - l1pc) // plp.cells_per_fec_block

    step = 1.0                      # device rate = 2x elementary, exactly
    mesh = sharding.make_mesh(1, 1)
    cfg = sharding.ShardedConfig(
        mode=mode, plp=plp, n_fec_per_frame=n_fec, n_ti=1,
        l1_post_cells=l1pc, frames_per_shard=args.frames)
    rx = sharding.ShardedReceiver(cfg, mesh)
    win = rx.window_len(step)
    rng = np.random.default_rng(3)
    raw = 0.1 * (rng.standard_normal((1, 1, win))
                 + 1j * rng.standard_normal((1, 1, win))
                 ).astype(np.complex64)
    r0 = np.full((1, 1), float(sharding.WINDOW_LEAD) + 0.25)
    w0, idx0, frac0, phase0 = rx.host_bases_windows(
        r0, np.full(1, step), np.zeros(1), np.zeros(1))

    # warm the public path once (builds the shard_map jits + decoder)
    plane = rx.plane_step_windows(raw, idx0, frac0, phase0,
                                  np.zeros(1), np.full(1, step))
    fec = rx.fec_step(plane, 0)
    print(f"sanity: decode ran, bb_bytes {fec.bb_bytes.shape}, "
          f"iters max {int(fec.ldpc_iters.max())}", file=sys.stderr)

    freq32, s_hi, s_lo = rx._normalize_state(1, 0.0, step)
    consts_sig = rx._consts_with_sig(0)
    raw_c = jax.device_put(cplx.from_np(raw))
    idx0_d = jnp.asarray(np.asarray(idx0, np.int32))
    frac0_d = jnp.asarray(np.asarray(frac0, np.float32))
    phase0_d = jnp.asarray(np.asarray(phase0, np.float32))
    plane_fn = rx._plane_win_fn
    fec_fn = rx._fec_fns[(0, 1)]
    h = rx._h_dev.get(0)
    if h is None:
        h = jnp.zeros((1, 1), jnp.bfloat16)

    csi_placeholder = jnp.zeros((), jnp.bfloat16)

    def run_sharded():
        packed, sig, csi, diag = plane_fn(
            raw_c, idx0_d, frac0_d, phase0_d, jnp.asarray(freq32),
            jnp.asarray(s_hi), jnp.asarray(s_lo), consts_sig)
        out_bytes, ok, iters, clean, snr = fec_fn(
            packed, csi if csi is not None else csi_placeholder,
            rx._consts[0], h)
        return snr                        # tiny: [1]

    # ---- unsharded twin: same ops, plain jit, no shard_map ------------
    taps = jnp.asarray(rx.taps)
    hb = jnp.asarray(rx.hb_taps)
    plan = rx.plans[0]
    fps = cfg.frames_per_shard
    decoder = rx._decoder_for(0, fps * n_fec)
    use_pallas = rx.use_pallas
    nb = plp.n_bch

    @jax.jit
    def twin(raw_w, idx0, frac0, phase0, freq, sh, sl, c, bch_h):
        x = jax.tree.map(lambda a: a[:, 0], raw_w)
        elem = rx._front_end(x, idx0[:, 0], frac0[:, 0], phase0[:, 0],
                             freq, sh, sl, taps, hb)
        frames = elem.reshape(-1, fps, mode.frame_samples)
        packed, diag = jax.vmap(
            lambda fr: rx_chain.frames_to_eq(fr, plan, c))(frames)
        # the plane stage's sig gather (psum-free: one shard)
        sig = jax.vmap(lambda pl: jax.lax.gather(
            pl.reshape(-1), c["sig_idx"], rx_chain._FAST_GATHER, (1,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            unique_indices=True))(packed[:, 0])
        csi = diag.get("csi")
        p2 = packed.reshape(fps, *packed.shape[2:])
        csi2 = csi.reshape(fps, *csi.shape[2:]) if csi is not None else None
        llr_t, snr = rx_chain.packed_to_llr_t(p2, plan, c, csi=csi2)
        n_cw = llr_t.shape[1]
        if use_pallas:
            if decoder.n_cw > n_cw:
                llr_t = jnp.pad(llr_t, ((0, 0), (0, decoder.n_cw - n_cw)))
            hard_t, ok, iters, clean = decoder.with_h(llr_t, bch_h)
            hard_t = hard_t[:, :n_cw]
        else:
            hard_t, ok, iters = decoder(llr_t)
        bytes_t = bch_ops.pack_bits_t(hard_t[:nb])
        # keep every output of the sharded body alive (no DCE), reduce to
        # one scalar so forcing costs one small read
        return (jnp.sum(bytes_t.astype(jnp.uint32))
                + jnp.sum(sig & 1) + jnp.sum(snr))

    def run_twin():
        return twin(raw_c, idx0_d, frac0_d, phase0_d, jnp.asarray(freq32),
                    jnp.asarray(s_hi), jnp.asarray(s_lo), consts_sig, h)

    def timeit(fn, reps):
        out = fn()
        _ = float(np.asarray(out).reshape(-1)[0])   # force completion
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = float(np.asarray(out).reshape(-1)[0])
        return (time.perf_counter() - t0) / reps * 1e3

    reps = args.reps if on_tpu else 2
    t_tw = timeit(run_twin, reps)
    t_sh = timeit(run_sharded, reps)
    n_samp = args.frames * mode.frame_samples
    print(f"platform={jax.devices()[0].platform} 32K flagship, "
          f"{args.frames} frames = {n_samp/1e6:.1f} M elementary samples")
    print(f"  unsharded twin (plain jit, no collectives) : {t_tw:7.2f} ms "
          f"= {n_samp/t_tw/1e3:.1f} Msps")
    print(f"  sharded step (1x1 mesh, shard_map plane+fec): {t_sh:7.2f} ms "
          f"= {n_samp/t_sh/1e3:.1f} Msps")
    print(f"  shard_map tax: {t_sh - t_tw:+.2f} ms "
          f"({(t_sh/t_tw - 1) * 100:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
