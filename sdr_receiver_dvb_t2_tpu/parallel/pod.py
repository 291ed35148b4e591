"""Pod-scale deployment configuration: many RF channels across hosts.

The BASELINE north star is 64 concurrent 8 MHz channels sharded over a
multi-host TPU pod.  RF channels are embarrassingly parallel, so the
recipe is: mesh axis "ch" across all chips (channel-per-chip or
channels-per-chip), optional "time" axis within a channel when one chip
cannot hold a whole channel's frame batch.

On a pod, initialize with jax.distributed.initialize() per host; the same
ShardedReceiver code runs unchanged — jax.make_mesh lays devices out so
the "time" axis (which carries the ppermute halo exchange) stays on
ICI-adjacent chips, while "ch" may span hosts (no cross-channel
communication exists, so DCN hops are free).

This module only arranges meshes and fans per-channel IQ/TS at the edges;
the compute path is parallel/sharding.ShardedReceiver.
"""
from __future__ import annotations

import numpy as np
import jax

from . import sharding


def pod_mesh(n_channels: int, time_per_channel: int = 1, devices=None):
    """Mesh for n_channels concurrent receivers.

    time_per_channel > 1 splits each channel's stream over that many chips
    with halo exchange (use when a channel's real-time budget exceeds one
    chip); total devices needed = n_channels * time_per_channel.
    """
    if devices is None:
        devices = jax.devices()
    need = n_channels * time_per_channel
    if len(devices) < need:
        raise ValueError(f"{need} devices needed, {len(devices)} available")
    return sharding.make_mesh(n_channels, time_per_channel,
                              devices=devices[:need])


def pod_64ch_mesh(devices=None):
    """The BASELINE 64-channel configuration (64 chips, one per channel;
    e.g. a v5e-64 slice or 8 hosts x 8 chips)."""
    return pod_mesh(64, 1, devices=devices)


class MultiChannelReceiver:
    """One ShardedReceiver instance serving C channels in lockstep.

    All channels share a T2 configuration (the broadcast-network case:
    one mux transmitted from many sites / received on many antennas);
    heterogeneous configs would use one ShardedReceiver per group.
    """

    def __init__(self, cfg: sharding.ShardedConfig, mesh):
        self.rx = sharding.ShardedReceiver(cfg, mesh)
        self.n_ch = mesh.shape["ch"]
        self.n_time = mesh.shape["time"]

    def raw_block_for(self, step: float) -> int:
        return self.rx.raw_block_for(step)

    def step(self, raw_per_channel: np.ndarray, mu, step,
             phase=0.0, freq=0.0):
        """raw_per_channel: [C, n_time * raw_block] complex64.

        mu/step/phase/freq: scalar or [C] (per-channel front-end state);
        C may be any multiple of the mesh's "ch" extent (channels share
        devices when C exceeds it)."""
        rb = self.rx.raw_block_for(float(np.max(step)))
        idx0, frac0, phase0 = self.rx.host_bases(
            mu, step, phase, freq, rb,
            n_channels=raw_per_channel.shape[0])
        return self.rx.step(raw_per_channel, idx0, frac0, phase0, freq, step)

    # The per-shard halo exchange covers shards 1..n-1 within a step;
    # shard 0's left context comes from OVERLAPPING the feed windows
    # (consume slightly less than a window per step and keep the warm-up
    # position mu inside [32, 33) raw samples, past the zero-padded halo
    # edge and the half-band transient), so a continuous stream decodes
    # continuously across steps.
    _MU_LO = 32.0

    def stream(self, raw: np.ndarray, mu0, step,
               freq=0.0, max_steps: int | None = None,
               track: bool = False, cfo_gain: float = 0.3,
               sro_gain: float = 0.5):
        """Generator over consecutive steps of a continuous capture.

        raw: [C, N] complex64 (one continuous stream per channel);
        mu0: raw-domain position of elementary sample 0 relative to raw[0]
        — the frame alignment, scalar or [C] (parallel.acquire derives it
        blind per channel).  step/freq likewise scalar or [C].
        Yields (hard, stats) per step until the capture is exhausted.

        ``track=True`` closes the CFO / sampling-rate loops on the mesh
        path PER CHANNEL: the "time"-reduced [C] guard-interval and
        pilot-drift discriminators from ``stats`` trim each channel's NCO
        frequency and resample step between steps, exactly like the
        single-chip loop (runtime/stream.py:344-357) — independent RF
        channels have independent LO/clock errors, so a 64-channel pod
        holds lock per channel without a shared clock.  Host-applied state
        is reported in stats as cfo_hz_applied / sro_ppm_applied ([C]).
        """
        from ..ops import equalizer as eq_mod
        from ..params.modes import SAMPLE_RATE
        C = raw.shape[0]
        mu = np.broadcast_to(np.asarray(mu0, np.float64), (C,)).copy()
        step = np.broadcast_to(np.asarray(step, np.float64), (C,)).copy()
        freq = np.broadcast_to(np.asarray(freq, np.float64), (C,)).copy()
        # the raw window size stays FIXED at the initial step (SRO trims are
        # <= 2e-5 relative; re-deriving it per step would change jit shapes)
        rb = self.rx.raw_block_for(float(np.max(step)))
        window = self.n_time * rb
        # elementary samples consumed per step (exact, by construction)
        elem_per_step = self.n_time * self.rx.k_loc
        sro_coeff = eq_mod.sro_coefficient(self.rx.mode)
        raw_per_elem0 = 2.0 * step          # raw samples per elementary [C]
        pos = np.zeros(C, np.int64)
        assert ((self._MU_LO <= mu) & (mu < self._MU_LO + 2)).all(), (
            "mu0 must land in the warm-up band; fold whole raw samples "
            "into the window start instead (see test_pod_stream_continuity)")
        n = 0
        phase = np.zeros(C, np.float64)
        cfo_hz_applied = np.zeros(C, np.float64)
        buf = np.empty((C, window), raw.dtype)
        while int(np.max(pos)) + window <= raw.shape[1]:
            idx0, frac0, phase0 = self.rx.host_bases(mu, step, phase, freq,
                                                     rb)
            for c in range(C):
                buf[c] = raw[c, pos[c]:pos[c] + window]
            hard, stats = self.rx.step(buf, idx0, frac0, phase0, freq, step)
            if track:
                # CFO: rad/elementary-sample residual -> rad/raw-sample NCO
                cfo_res = np.asarray(stats["gi_cfo"], np.float64)   # [C]
                freq += cfo_gain * cfo_res / raw_per_elem0
                cfo_hz_applied += (cfo_gain * cfo_res * SAMPLE_RATE
                                   / (2 * np.pi))
                # sampling rate: pilot-drift slip -> resample step trim
                slip = np.asarray(stats["sro"], np.float64) / sro_coeff
                trim = np.clip(-sro_gain * slip, -2e-5, 2e-5)
                step *= (1.0 + trim)
                stats = dict(stats, cfo_hz_applied=cfo_hz_applied.copy(),
                             sro_ppm_applied=(step * 2.0 / raw_per_elem0
                                              - 1.0) * 1e6)
            yield hard, stats
            n += 1
            if max_steps is not None and n >= max_steps:
                return
            advance_exact = mu + elem_per_step * (2.0 * step) - self._MU_LO
            adv = np.floor(advance_exact).astype(np.int64)
            mu = mu + elem_per_step * (2.0 * step) - adv
            phase = (phase + freq * adv) % (2 * np.pi)
            pos += adv
