"""Blind acquisition onto the mesh: cold-start a pod from raw IQ alone.

The sharded/pod path (parallel.sharding / parallel.pod) runs steady-state
frame-aligned steps; this module derives that alignment BLIND — P1 search,
CFO, GI/L1 scan — exactly like the single-chip cold start
(runtime/acquisition.py; reference analogue: P1-triggered init at
/root/reference/src/DVB_T2/dvbt2_demodulator.cpp:210-237), then converts
the lock into `pod.MultiChannelReceiver.stream()` inputs:

* `ShardedConfig` (mode + PLP + FEC geometry from the decoded L1),
* per-channel `pos0` (whole raw samples to drop from each channel's
  stream) and `mu0` (fractional frame alignment inside stream()'s
  warm-up band),
* per-channel NCO `freq` (rad/raw-sample, from the P1 CFO estimate).

The front end used for the acquisition head is the SAME op chain and base
arithmetic as the sharded step (sharding.ShardedReceiver._build /
host_bases with t = 0), so an elementary-domain P1 position maps exactly
onto the mesh resampler grid: elementary sample e sits at raw position
``mu + 2 * step * e``.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import cplx, frontend as fe, p1_detect
from ..params import l1 as l1_mod
from ..params import p1 as p1_mod
from ..params.modes import SAMPLE_RATE
from ..runtime import acquisition
from . import sharding

# stream()'s warm-up band (pod.MultiChannelReceiver._MU_LO)
_MU_LO = 32.0


def frontend_elem(raw: np.ndarray, mu: float, step: float, freq: float,
                  n_elem: int, fir_preset: str = "medium") -> np.ndarray:
    """Raw complex64 -> ``n_elem`` elementary-rate samples, with the mesh
    front end's exact convention: elementary e sits at raw position
    ``mu + 2 * step * e`` (NCO at ``freq`` rad/raw-sample from raw[0]).

    One-shot (zero history) twin of the sharded per-shard front end —
    identical ops, identical base math as host_bases(t=0, halo=0)."""
    taps = fe.fir_taps(fir_preset)
    hb_taps = np.asarray(fe.halfband_taps(), np.float32)
    n_taps = len(taps)
    hb_delay_grid = 3 * (len(hb_taps) - 1) // 2
    # base math = sharding.ShardedReceiver.host_bases with t=0, halo=0
    p = mu + step * (-(n_taps - 1))
    g = 4.0 * p + hb_delay_grid
    assert g >= 1.0, (
        f"mu={mu} too small for the FIR warm-up; feed later raw")
    need = 2 * n_elem + n_taps - 1
    n_up = -(-need // 1024) * 1024
    s_hi, s_lo = fe.split_step(4.0 * step)

    x = cplx.from_np(np.ascontiguousarray(raw, np.complex64))
    x = fe.nco_derotate(x, jnp.float32(0.0), jnp.float32(freq))[0]
    hb = jnp.asarray(hb_taps)
    hbz = cplx.czeros(len(hb_taps) - 1)
    x = fe.upsample2(x, hbz, hb)[0]
    x = fe.upsample2(x, hbz, hb)[0]
    mu0 = jnp.float32(g - np.floor(g)) + jnp.int32(np.floor(g)).astype(
        jnp.float32)
    up = fe.farrow_resample(x, mu0, jnp.asarray(s_hi), jnp.asarray(s_lo),
                            n_up)
    up = up[:need]
    elem = fe.fir_decimate2(up[n_taps - 1:], up[:n_taps - 1],
                            jnp.asarray(taps))[0]
    return cplx.to_np(elem)[:n_elem]


@dataclasses.dataclass
class MeshLock:
    """Blind-acquisition result, ready for pod.MultiChannelReceiver."""
    cfg: sharding.ShardedConfig
    l1_pre: "l1_mod.L1Pre"
    l1_post: "l1_mod.L1Post"
    pos0: np.ndarray          # [C] int64: raw samples to drop per channel
    mu0: np.ndarray           # [C] float64: alignment in the warm-up band
    freq: np.ndarray          # [C] float64: NCO rad/raw-sample
    step: float               # raw-domain resample step (shared nominal)

    def aligned(self, raw: np.ndarray) -> np.ndarray:
        """[C, N] capture -> per-channel streams starting at pos0."""
        n = int(min(raw.shape[1] - p for p in self.pos0))
        return np.stack([raw[c, self.pos0[c]:self.pos0[c] + n]
                         for c in range(raw.shape[0])])


def _acquire_one(raw_row: np.ndarray, step: float, head_elem: int,
                 fir_preset: str):
    """One channel: (t0_elem -> r0_raw, freq_raw, mode, l1_pre, l1_post)."""
    mu_acq = _MU_LO + 0.5
    n_avail = int((len(raw_row) - mu_acq) / (2.0 * step)) - 8
    n_elem = min(head_elem, n_avail)
    if n_elem < 4 * p1_mod.P1_LEN:
        return None
    elem = frontend_elem(raw_row, mu_acq, step, 0.0, n_elem, fir_preset)
    t0, peak, cfo_frac = p1_detect.detect(cplx.from_np(elem))
    t0 = int(t0)
    if float(peak) < 0.3:
        return None
    res = p1_detect.decode_signalling(elem[t0:t0 + p1_mod.P1_LEN],
                                      float(cfo_frac))
    if res is None:
        return None
    s1, s2, cfo_total = res
    # CFO-correct the head (host rotation == retuning the NCO) and decode
    # the L1 from the first frame (GI/EXT scan, hard + soft paths)
    n = np.arange(len(elem))
    elem = (elem * np.exp(-1j * cfo_total * n)).astype(np.complex64)
    acq = acquisition.acquire_mode(elem[t0 + p1_mod.P1_LEN:], s1, s2 // 2)
    if acq is None:
        return None
    # raw position of frame start (+ first-path re-anchor, SFN channels)
    r0 = mu_acq + 2.0 * step * (t0 + acq.timing_off)
    freq_raw = cfo_total / (2.0 * step)     # rad/elem -> rad/raw
    return r0, freq_raw, acq


def blind_acquire(raw: np.ndarray, device_rate: float,
                  frames_per_shard: int = 1, fir_preset: str = "medium",
                  plp_index: int = 0, head_elem: int = 3_500_000,
                  ldpc_max_iters: int = 15) -> MeshLock | None:
    """[C, N] raw capture -> MeshLock, fully blind (no impairment oracle).

    Each channel is acquired independently (channels have independent
    timing and LO error); all channels must carry the same T2
    configuration (the broadcast-network case MultiChannelReceiver
    serves).  Returns None if any channel fails to lock.
    """
    raw = np.atleast_2d(raw)
    step = device_rate / (2.0 * SAMPLE_RATE)
    locks = []
    for c in range(raw.shape[0]):
        got = _acquire_one(raw[c], step, head_elem, fir_preset)
        if got is None:
            return None
        locks.append(got)

    r0s = np.array([r0 for r0, _, _ in locks])
    freqs = np.array([fq for _, fq, _ in locks])
    acq0 = locks[0][2]
    # frame alignment: fold whole raw samples into pos0, keep mu0 in the
    # warm-up band [_MU_LO, _MU_LO + 1)
    pos0 = np.floor(r0s - _MU_LO).astype(np.int64)
    mu0 = r0s - pos0

    from ..models.receiver import config_from_l1
    # one chain plan serves every channel (SPMD): escalate to the Wiener
    # rows if ANY channel's measured delay spread demands them
    sfn = any(acq.sfn for _, _, acq in locks)
    rx_cfg = config_from_l1(acq0.mode, acq0.l1_pre, acq0.l1_post, plp_index,
                            sfn=sfn)
    cfg = sharding.ShardedConfig(
        mode=rx_cfg.mode, plp=rx_cfg.plp,
        n_fec_per_frame=rx_cfg.n_fec_per_frame, n_ti=rx_cfg.n_ti,
        l1_post_cells=acq0.l1_pre.l1_post_size, plp_start=rx_cfg.plp_start,
        frames_per_shard=frames_per_shard, fir_preset=fir_preset,
        ldpc_max_iters=ldpc_max_iters, sfn=rx_cfg.sfn)
    return MeshLock(cfg=cfg, l1_pre=acq0.l1_pre, l1_post=acq0.l1_post,
                    pos0=pos0, mu0=mu0, freq=freqs, step=step)
