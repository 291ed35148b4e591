#!/usr/bin/env python3
"""Mesh-scaling benchmark: samples/s vs (n_ch, n_time) mesh shape.

Measures the sharded receive step's throughput on every mesh factorization
of the available devices, reporting scaling efficiency vs the 1-device
run — the harness for BASELINE.md's >85% scaling target (runs on real
chips when a multi-chip slice is attached; on CPU it uses the virtual
device mesh, which measures orchestration overhead rather than real
speedup, as all virtual devices share the host's cores).

Usage:
  python tools/bench_scaling.py            # all factorizations
  python tools/bench_scaling.py --devices 8 --steps 5
On a pod: run one process per host with jax.distributed.initialize() done
by the launcher (parallel/pod.py docstring), same script.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def analyze() -> int:
    """Analytic per-step communication budget of the pod configurations
    (BENCH.md scaling evidence): bytes moved by the collectives per step
    vs the step's compute time, at the flagship 32K mode.

    Runs host-side only (no devices needed): every quantity is a static
    property of the configuration.
    """
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sdr_receiver_dvb_t2_tpu.parallel import sharding
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame, SAMPLE_RATE)

    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_128,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                  n_data_symbols=59)
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1, num_blocks_max=254)
    cfg = sharding.ShardedConfig(mode=mode, plp=plp, n_fec_per_frame=202,
                                 n_ti=1, l1_post_cells=8000,
                                 frames_per_shard=1)
    device_rate = 2 * SAMPLE_RATE
    # per (channel, time-shard) per step
    fs = mode.frame_samples
    rb_raw = int(np.ceil(fs * 2.0)) + 64            # raw_block_for(step=1)
    halo_bytes = cfg.halo * 8                       # complex64 ppermute
    n_sig = l1_mod.L1_PRE_CELLS + cfg.l1_post_cells
    psum_bytes = n_sig * 4 + 2 * 4                  # sig u32 + gi_cfo/sro
    step_air_s = fs / SAMPLE_RATE
    # one chip decodes ~51.8x real time (BENCH headline) -> compute time
    compute_s = step_air_s / 51.8
    ici_bps = 100e9          # conservative per-link ICI (v5e class)
    print(f"flagship 32K mode: frame = {fs/1e6:.2f} M elementary samples "
          f"({step_air_s*1e3:.1f} ms of air), raw block {rb_raw/1e6:.2f} M "
          f"samples @ {device_rate/1e6:.1f} Msps")
    print(f"per-step compute per chip at the measured 51.8x: "
          f"{compute_s*1e3:.2f} ms")
    for (n_ch, n_time) in ((64, 1), (32, 2), (8, 8)):
        halo = 0 if n_time == 1 else halo_bytes
        psum = 0 if n_time == 1 else psum_bytes
        total = halo + psum
        t_comm = total / ici_bps
        frac = t_comm / compute_s * 100
        print(f"mesh {n_ch:2d}x{n_time}: halo {halo/1e3:8.1f} kB + psum "
              f"{psum/1e3:6.1f} kB per (ch,shard)/step = "
              f"{t_comm*1e6:6.2f} us on ICI @100 GB/s -> "
              f"{frac:.4f}% of compute")
    print("(64x1 — the BASELINE pod config — moves ZERO inter-chip bytes "
          "in steady state: RF channels are independent, the 'time' "
          "collectives are identity at extent 1, and the 'ch' axis "
          "carries no collective at all.)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=None,
                   help="virtual CPU device count (default: real devices)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--frames-per-shard", type=int, default=1)
    p.add_argument("--analyze", action="store_true",
                   help="print the analytic per-step communication budget "
                        "instead of running the mesh sweep")
    args = p.parse_args(argv)
    if args.analyze:
        return analyze()

    import os
    if args.devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from sdr_receiver_dvb_t2_tpu.models.transmitter import (
        Transmitter, TxConfig, random_ts_stream)
    from sdr_receiver_dvb_t2_tpu.models.channel import ChannelConfig, impair
    from sdr_receiver_dvb_t2_tpu.parallel import sharding
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame, SAMPLE_RATE)

    n_dev = len(jax.devices())
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=4))
    ts = random_ts_stream(900, seed=11)
    dev_iq = impair(tx.modulate(ts), ChannelConfig(device_rate=10e6,
                                                   snr_db=30.0, seed=2))

    device_rate = 10e6
    step = device_rate / (2 * SAMPLE_RATE)
    shapes = []
    for n_ch in range(1, n_dev + 1):
        if n_dev % n_ch == 0:
            shapes.append((n_ch, n_dev // n_ch))
    shapes = [(1, 1)] + [s for s in shapes if s != (1, 1)]

    results = []
    for n_ch, n_time in shapes:
        mesh = sharding.make_mesh(n_ch, n_time,
                                  devices=jax.devices()[:n_ch * n_time])
        cfg = sharding.ShardedConfig(
            mode=mode, plp=plp, n_fec_per_frame=4, n_ti=1,
            l1_post_cells=tx.l1_pre.l1_post_size,
            frames_per_shard=args.frames_per_shard)
        rx = sharding.ShardedReceiver(cfg, mesh)
        rb = rx.raw_block_for(step)
        raw = np.zeros((n_ch, n_time * rb), np.complex64)
        for c in range(n_ch):
            n = min(len(dev_iq), n_time * rb)
            raw[c, :n] = dev_iq[:n]
        ratio = SAMPLE_RATE / device_rate
        mu = ((rx.n_taps - 1) / 4.0 - 1.0) / ratio
        idx0, frac0, phase0 = rx.host_bases(mu, step, 0.0, 0.0, rb)
        hard, stats = rx.step(raw, idx0, frac0, phase0, 0.0, step)
        jax.block_until_ready(hard)                       # compile
        t0 = time.perf_counter()
        for _ in range(args.steps):
            hard, stats = rx.step(raw, idx0, frac0, phase0, 0.0, step)
        jax.block_until_ready(hard)
        dt = (time.perf_counter() - t0) / args.steps
        samples = n_ch * n_time * rb
        msps = samples / dt / 1e6
        results.append(dict(n_ch=n_ch, n_time=n_time, msps=round(msps, 2),
                            step_ms=round(dt * 1e3, 2)))
        base = results[0]["msps"]
        eff = msps / (base * n_ch * n_time) * 100
        print(f"mesh {n_ch}x{n_time}: {msps:8.1f} Msps "
              f"({dt*1e3:6.1f} ms/step, eff {eff:5.1f}% vs 1x1)",
              file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
