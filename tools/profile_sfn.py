"""Stage-marginal profile of the SFN (Wiener) pipeline on the real chip.

Methodology per CLAUDE.md: time cumulative pipelines (each jit ends in a
jnp.sum so nothing is DCE'd), subtract successive timings for marginals;
completion forced by reading one device scalar.

Run on the TPU host: python tools/profile_sfn.py [linear]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main(linear=False):
    import bench
    from sdr_receiver_dvb_t2_tpu.ops import cplx, rx_chain, ofdm
    from sdr_receiver_dvb_t2_tpu.params import l1 as l1_mod
    from sdr_receiver_dvb_t2_tpu.params.modes import (
        T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern,
        Constellation, CodeRate, FecFrame)

    if linear:
        mode, plp = bench._config()
        cache = Path("bench.py").resolve().parent / ".bench_cache_32k.npz"
        z = np.load(cache)
        frames = z["frames"][:4]
        n_fec, l1pc = int(z["n_fec"]), int(z["l1_post_cells"])
    else:
        mode = T2Mode(fft_mode=FftMode.FFT_32K, guard=GuardInterval.G1_32,
                      pilot_pattern=PilotPattern.PP7, extended_carriers=True,
                      n_data_symbols=59).validate()
        plp = PlpConfig(constellation=Constellation.QAM256, rotation=True,
                        code_rate=CodeRate.C2_3, fec_frame=FecFrame.NORMAL,
                        time_il_length=1, num_blocks_max=254)
        z = np.load(".bench_cache_sfn.npz")
        frames, n_fec, l1pc = z["frames"], int(z["n_fec"]), int(
            z["l1_post_cells"])
    plan = rx_chain.get_plan(mode, plp, n_fec, 1,
                             l1_mod.L1_PRE_CELLS + l1pc)
    consts = plan.device_consts()
    fr = jax.device_put(cplx.from_np(frames))
    n_samp = frames.shape[0] * mode.frame_samples

    @jax.jit
    def s_demod(f, c):
        def one(frame):
            carriers, gi = ofdm.demod_frame(frame, plan.mode)
            return jnp.sum(carriers.re) + jnp.sum(carriers.im) + jnp.sum(gi)
        return jnp.sum(jax.vmap(one)(f))

    @jax.jit
    def s_eq(f, c):
        packed, diag = jax.vmap(
            lambda x: rx_chain.frames_to_eq(x, plan, c))(
                cplx.C(f.re[:, None], f.im[:, None]))
        return jnp.sum(packed.astype(jnp.uint32) & 1)

    @jax.jit
    def s_llr(f, c):
        llr_t, diag = rx_chain.frames_to_llr_t(f, plan, c)
        return jnp.sum(llr_t.astype(jnp.int32))

    def timeit(fn, reps=20):
        out = fn(fr, consts)
        _ = float(jnp.asarray(out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(fr, consts)
        _ = float(jnp.asarray(out).astype(jnp.float32))
        return (time.perf_counter() - t0) / reps * 1e3

    t1 = timeit(s_demod)
    t2 = timeit(s_eq)
    t3 = timeit(s_llr)
    tag = "linear 32K GI1/128" if linear else "sfn 32K GI1/32"
    ms_rt = n_samp / (64e6 / 7) * 1e3
    print(f"{tag}: {frames.shape[0]} frames = {n_samp/1e6:.1f} M samples "
          f"({ms_rt:.0f} ms of air time)")
    print(f"  demod (fft)          {t1:7.2f} ms")
    print(f"  + equalize           {t2:7.2f} ms  (marginal {t2-t1:+.2f})")
    print(f"  + demap->llr         {t3:7.2f} ms  (marginal {t3-t2:+.2f})")


if __name__ == "__main__":
    main(linear="linear" in sys.argv[1:])
