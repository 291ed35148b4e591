"""Bound the pod host loop at the BASELINE 64-channel configuration
(VERDICT round-3 next #7): measure the HOST-side work per pod.stream step
— frame-offset arithmetic, window bases, the vectorized window gather,
and the TS-assembly share — independent of device speed.

Run: python tools/bench_pod_host.py [n_channels]
Prints one line per component (ms/step) plus the real-time budget
comparison; results are recorded in BENCH.md.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(n_ch: int = 64) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sdr_receiver_dvb_t2_tpu.parallel import sharding
    from sdr_receiver_dvb_t2_tpu.io.bbframe import BBFrameParser
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame, SAMPLE_RATE)

    mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_128,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                  n_data_symbols=59)
    plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                    code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                    time_il_length=1)
    n_fec = 26
    cfg = sharding.ShardedConfig(mode=mode, plp=plp, n_fec_per_frame=n_fec,
                                 l1_post_cells=400, frames_per_shard=1)
    mesh = sharding.make_mesh(1, 1)      # host-side cost is mesh-agnostic
    rx = sharding.ShardedReceiver(cfg, mesh)
    from sdr_receiver_dvb_t2_tpu.parallel import pod
    mc = pod.MultiChannelReceiver(cfg, mesh)
    mc.n_time = 1

    device_rate = 10e6
    step = device_rate / (2 * SAMPLE_RATE)
    win = rx.window_len(step)
    fs = mode.frame_samples
    raw = (np.random.default_rng(0).standard_normal((n_ch, win + 4096))
           .astype(np.float32)).view(np.float32)
    raw = (raw + 1j * raw).astype(np.complex64)
    frame_time_ms = fs / SAMPLE_RATE * 1e3

    def timeit(fn, n=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n * 1e3

    frame_idx = np.zeros(n_ch, np.int64)
    t_off = timeit(lambda: mc._frame_offsets(frame_idx))

    r0 = np.full((n_ch, 1), 40.0)
    stepv = np.full(n_ch, step)
    ph = np.zeros(n_ch)
    fq = np.zeros(n_ch)
    t_bases = timeit(lambda: rx.host_bases_windows(r0, stepv, ph, fq))

    w0 = np.zeros((n_ch, 1), np.int64)
    ar = np.arange(win)
    t_fancy = timeit(
        lambda: raw[np.arange(n_ch)[:, None, None], w0[:, :, None] + ar],
        n=3)
    buf = np.empty((n_ch, 1, win), raw.dtype)

    def copy_loop():
        for c in range(n_ch):
            buf[c, 0] = raw[c, :win]

    t_gather = timeit(copy_loop, n=5)

    # TS assembly share: parse one step's worth of VALID scrambled BB
    # frames per channel (what the parser sees in steady state), through
    # the native C++ parser the pod CLI uses (cli.run_pod)
    from sdr_receiver_dvb_t2_tpu.io.bbframe import BBFramePacker
    from sdr_receiver_dvb_t2_tpu.io.native import make_bb_parser
    from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
    packer = BBFramePacker(k_bch=plp.k_bch)
    ts = random_ts_stream(2 * n_fec * (plp.k_bch // 8 - 10) // 188, seed=2)
    frames = packer.pack(ts)[:n_fec]
    bb_bytes = np.stack([np.packbits(f) for f in frames])  # [n_fec, kb/8]
    parsers = [make_bb_parser() for _ in range(n_ch)]
    native = type(parsers[0]).__name__

    def parse_all():
        for c in range(n_ch):
            parsers[c].parse_batch(bb_bytes)

    t_parse = timeit(parse_all, n=3)

    # LIVE ingest variant (VERDICT r4 next #4): the same per-step window
    # reads through a ChannelStore fed at the pod rate (win raw samples
    # per channel per step, arriving in SDR-sized chunks written straight
    # into borrowed pool granules — the read_into path), with trim_before
    # after every step.  Splits the cost into the INGEST WRITE (the
    # NIC/convert pass any live receiver pays, simulated as a memcpy
    # into the borrowed space) and the WINDOW ASSEMBLY (granule-source
    # twin of the capture-array window-copies line above, which it
    # REPLACES); the store itself adds no other per-sample work.
    store = pod.ChannelStore(n_ch)
    feed = raw[:, :win].copy()
    chunk = 65536
    state = dict(pos=np.zeros(n_ch, np.int64), t_append=0.0,
                 t_window=0.0)

    def live_step():
        t0 = time.perf_counter()
        for c in range(n_ch):
            end = state["pos"][c] + win
            while store.end(c) < end:
                dst = store.borrow(c)
                a = int(store.end(c) - state["pos"][c]) % win
                take = min(len(dst), chunk, win - a)
                dst[:take] = feed[c, a:a + take]   # the NIC/convert write
                store.commit(c, take)
        t1 = time.perf_counter()
        state["t_append"] += t1 - t0
        for c in range(n_ch):
            store.window_into(c, int(state["pos"][c]), win, buf[c, 0])
        state["t_window"] += time.perf_counter() - t1
        for c in range(n_ch):
            # stream()'s policy: keep 2*win of look-back (relock context)
            store.trim_before(c, int(state["pos"][c]) - win)
        state["pos"] += win

    n_live = 5
    for _ in range(3):          # pool reaches steady state at step 3
        live_step()             # (first touches + THP collapse settle)
    store.bytes_copied = 0
    state["t_append"] = state["t_window"] = 0.0
    t0 = time.perf_counter()
    for _ in range(n_live):
        live_step()
    t_live = (time.perf_counter() - t0) / n_live * 1e3
    held = max(store.held(c) for c in range(n_ch))
    copied_per_step = store.bytes_copied / n_live / 1e6
    t_append = state["t_append"] / n_live * 1e3
    t_window = state["t_window"] / n_live * 1e3

    total = t_off + t_bases + t_gather + t_parse
    print(f"pod host loop @ {n_ch} channels, 32K frame "
          f"({frame_time_ms:.1f} ms of air time per step/channel):")
    print(f"  frame offsets   {t_off:8.2f} ms/step")
    print(f"  window bases    {t_bases:8.2f} ms/step")
    print(f"  window copies   {t_gather:8.2f} ms/step "
          f"({n_ch * win * 8 / 1e6:.0f} MB; fancy-index gather would be "
          f"{t_fancy:.0f} ms)")
    print(f"  TS assembly     {t_parse:8.2f} ms/step "
          f"({n_ch * n_fec} valid BB frames, {native})")
    print(f"  TOTAL           {total:8.2f} ms/step vs {frame_time_ms:.1f} "
          f"ms budget -> host load {total / frame_time_ms:.2f}x of one "
          f"core")
    live_total = total - t_gather + t_live
    raw_mb = n_ch * win * 8 / 1e6
    print(f"LIVE ingest (ChannelStore pooled granules, read_into path, "
          f"{chunk}-sample chunks):")
    print(f"  ingest write    {t_append:8.2f} ms/step ({raw_mb:.0f} MB "
          f"into borrowed pool space — the NIC/convert pass any live "
          f"receiver pays)")
    print(f"  window assembly {t_window:8.2f} ms/step (granule-source "
          f"twin of the {t_gather:.0f} ms capture-array line; store "
          f"copies {copied_per_step:.0f} MB/step = "
          f"{copied_per_step / raw_mb:.2f}x the raw volume)")
    print(f"  held tail       {held * 8 / 1e6:8.1f} MB/channel max "
          f"({held} samples; bounded by window + relock context)")
    print(f"  LIVE TOTAL      {live_total:8.2f} ms/step -> host load "
          f"{live_total / frame_time_ms:.2f}x of one core "
          f"({live_total / frame_time_ms / 8:.2f} cores/host on an "
          f"8-host pod)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
