"""Device-mesh sharding of the receive pipeline (shard_map + collectives).

The reference is a single-process 8-thread pipeline with no distributed
story (SURVEY.md section 2 "Parallelism & communication").  The TPU-native
scale-out maps the stream onto a 2-D mesh:

* **"ch" axis — RF-channel sharding**: independent 8 MHz channels are
  embarrassingly parallel (the pod-scale 64-channel configuration in
  BASELINE.md); every per-channel tensor shards its leading axis.
* **"time" axis — time-block sharding**: the continuous IQ stream of one
  channel splits into consecutive blocks across devices.  Convolutional
  front-end elements (Farrow resampler, FIR decimator) need history across
  block boundaries, provided by a **halo exchange** (`ppermute` over ICI)
  instead of the reference's circular double-write buffers
  (/root/reference/src/DSP/buffers.hh:59-101).

Inside a shard everything is the same fused single-chip code path
(ops/frontend, ops/ofdm, ops/equalizer, ops/llr, ops/ldpc_decode); global
statistics (SNR, LDPC failures) reduce with `psum`.

Alignment contract (host-managed, like the single-chip streaming runtime):
each step consumes ``n_time * raw_block`` raw samples and produces
``n_time * frames_per_shard`` full T2 frames per channel; the host keeps
the stream phase-aligned by feeding the right number of raw samples and
carrying the resampler's fractional position between steps (exact float64
bookkeeping on host, float32 + int32 on device).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map          # jax >= 0.8
except ImportError:                    # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import frontend as fe
from ..ops import cplx, rx_chain, ldpc_decode, bch_ops
from ..ops.cplx import C
from ..params import l1 as l1_mod
from ..params.modes import T2Mode, PlpConfig


def make_mesh(n_ch: int, n_time: int, devices=None) -> Mesh:
    """2-D (channel x time-block) device mesh."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_ch * n_time, (len(devices), n_ch, n_time)
    devs = np.array(devices[:n_ch * n_time]).reshape(n_ch, n_time)
    return Mesh(devs, ("ch", "time"))


def default_mesh(n_devices: int | None = None) -> Mesh:
    """Factor the available devices into (ch, time)."""
    n = n_devices if n_devices is not None else len(jax.devices())
    n_ch = 2 if n % 2 == 0 and n > 1 else 1
    return make_mesh(n_ch, n // n_ch)


@dataclasses.dataclass
class ShardedConfig:
    mode: T2Mode
    plp: PlpConfig
    n_fec_per_frame: int
    n_ti: int = 1
    l1_post_cells: int = 0           # from decoded L1-pre (pre.l1_post_size)
    plp_start: int = 0               # L1-dynamic start cell of the PLP
    frames_per_shard: int = 1
    fir_preset: str = "medium"
    halo: int = 1024                 # raw-sample left halo per time shard
    ldpc_max_iters: int = 15
    # None = auto (Pallas kernel + fused BCH screen on TPU backends, the
    # portable XLA decoder elsewhere); True forces Pallas (interpret mode
    # off-TPU — CI coverage of the pod FEC path); False forces portable
    use_pallas: bool | None = None
    sfn: bool = False                # force Wiener rows (long measured
    #                                  echoes) on reach-ungated modes


class ShardedReceiver:
    """Full receive step sharded over a (ch, time) mesh.

    step(raw, idx0, frac0, phase0, freq, step_raw) where
      raw    [C, n_time * raw_block] complex64 — sharded (ch, time)
      idx0   [C, n_time] int32 — per-(ch, time-shard) resampler integer
                                base (local to the shard's raw block,
                                incl. halo)
      frac0  [C, n_time] float32 — fractional position per (ch, shard)
      phase0 [C, n_time] float32 — NCO start phase per (ch, shard)
      freq   [C] float32      — per-CHANNEL NCO frequency (rad/raw-sample)
      step_raw [C] float64    — per-CHANNEL resampler step (host doubles)
    returns (hard_bits [C, F_total, n_fec, n_bch], stats dict).

    Per-channel front-end state is first-class: independent RF channels
    have independent LO and sampling-clock errors, so the NCO frequency
    and the resample step shard over "ch" and the tracking discriminators
    (gi_cfo, sro) reduce over "time" ONLY, returning [C] vectors — one
    closed loop per channel (pod.MultiChannelReceiver.stream).

    The host computes idx0/frac0/phase0 in float64 from the global stream
    position (see runtime/stream.py) so device float32 never sees large
    absolute sample indices.
    """

    def __init__(self, cfg: ShardedConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.mode = cfg.mode.validate()
        self.plp = cfg.plp
        self.n_time = mesh.shape["time"]
        self.n_ch = mesh.shape["ch"]
        self.chain_plan = rx_chain.get_plan(
            self.mode, cfg.plp, cfg.n_fec_per_frame, cfg.n_ti,
            l1_mod.L1_PRE_CELLS + cfg.l1_post_cells + cfg.plp_start,
            sfn=cfg.sfn)
        self.taps = fe.fir_taps(cfg.fir_preset)
        self.n_taps = len(self.taps)
        self.hb_taps = np.asarray(fe.halfband_taps(), np.float32)
        # two half-band stages delay the x4 grid by (N-1)/2 each: stage 1's
        # 14 samples at x2 = 28 at x4, plus stage 2's 14 at x4
        self.hb_delay_grid = 3 * (len(self.hb_taps) - 1) // 2

        # per-shard geometry
        self.k_loc = cfg.frames_per_shard * self.mode.frame_samples
        # farrow outputs per shard: 2x elementary + FIR warm-up, padded to
        # the resampler's chunk granularity
        need = 2 * self.k_loc + self.n_taps - 1
        self.n_up = -(-need // 1024) * 1024
        # FEC engine selection (ShardedConfig.use_pallas): the fused
        # Pallas kernel folds the BCH syndrome screen into its epilogue,
        # so the pod path decodes LDPC *and* screens BCH in one program —
        # H rides through shard_map as a replicated argument (a closure
        # constant would bloat the remote compile request, CLAUDE.md)
        self.use_pallas = (jax.default_backend() == "tpu"
                           if cfg.use_pallas is None else
                           bool(cfg.use_pallas))
        self.cw_per_shard = cfg.frames_per_shard * cfg.n_fec_per_frame
        if self.use_pallas:
            from ..ops import ldpc_pallas
            self.decoder = None
            self._pallas = {}            # n_tiles -> fused decoder
            self._h_dev = jnp.asarray(ldpc_pallas.pad_bch_h(
                bch_ops._h_matrix(self.plp.k_bch, self.plp.bch_m,
                                  self.plp.bch_t)), jnp.bfloat16)
        else:
            self.decoder = ldpc_decode.make_decoder_t(
                cfg.plp.ldpc_table_name, max_iters=cfg.ldpc_max_iters)
            self._h_dev = jnp.zeros((1, 1), jnp.bfloat16)   # unused dummy
        self._step = self._build()

    # ------------------------------------------------------------------
    def _ensure_pallas(self, n_cw: int):
        """Build (eagerly, outside any trace) the fused kernel for this
        per-shard codeword count; cached by tile count."""
        from ..ops import ldpc_pallas
        tiles = max(1, -(-n_cw // 128))
        if tiles not in self._pallas:
            self._pallas[tiles] = ldpc_pallas.make_pallas_decoder(
                self.plp.ldpc_table_name, batch=128, n_tiles=tiles,
                max_iters=self.cfg.ldpc_max_iters,
                interpret=jax.default_backend() != "tpu",
                bch_h=bch_ops._h_matrix(self.plp.k_bch, self.plp.bch_m,
                                        self.plp.bch_t))
        return self._pallas[tiles]

    # ------------------------------------------------------------------
    def raw_block_for(self, step: float) -> int:
        """Raw samples consumed per time shard per step (host helper).

        ``step`` is the raw-domain ratio device_rate / (2 * elementary);
        the Farrow itself runs on a x4 half-band-upsampled grid internally.
        """
        return int(np.ceil(2 * self.k_loc * step)) + 32

    def _build(self):
        cfg, mode, plp = self.cfg, self.mode, self.plp
        taps = jnp.asarray(self.taps)
        n_taps, halo, n_up, k_loc = self.n_taps, cfg.halo, self.n_up, self.k_loc
        chain_plan = self.chain_plan

        def shard_body(raw, idx0, frac0, phase0, freq, step_hi, step_lo,
                       consts, bch_h):
            # raw: C [C_loc, raw_block]; idx0/frac0/phase0: [C_loc, 1]
            # (this shard's column); freq/step_hi/step_lo: [C_loc]
            t_idx = jax.lax.axis_index("time")
            n_t = jax.lax.axis_size("time")

            # ---- halo exchange: previous time-block's tail --------------
            tail = raw[:, -halo:]
            perm = [(i, (i + 1) % n_t) for i in range(n_t)]
            left = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "time", perm), tail)
            # shard 0 has no predecessor within the step; zeros are fine
            left = cplx.where(t_idx == 0, 0.0, left)
            x = cplx.concatenate([left, raw], axis=1)

            # ---- NCO derotation (per-channel freq, per-shard phase) -----
            nco = lambda row, ph, fr: fe.nco_derotate(row, ph, fr)[0]
            x = jax.vmap(nco)(x, phase0[:, 0], freq)

            # ---- x4 half-band grid (cubic images ~45 dB down) ------------
            hb = jnp.asarray(self.hb_taps)
            hbz = cplx.czeros((x.shape[0], len(self.hb_taps) - 1))
            x = jax.vmap(lambda r, h: fe.upsample2(r, h, hb)[0])(x, hbz)
            x = jax.vmap(lambda r, h: fe.upsample2(r, h, hb)[0])(x, hbz)

            # ---- Farrow to 2x elementary rate (per-channel step) --------
            mu0 = frac0[:, 0] + idx0[:, 0].astype(jnp.float32)
            up = jax.vmap(lambda row, m, sh, sl: fe.farrow_resample(
                row, m, sh, sl, n_up))(x, mu0, step_hi, step_lo)
            up = up[:, :2 * k_loc + n_taps - 1]

            # ---- FIR decimate by 2 to elementary rate --------------------
            hist = up[:, :n_taps - 1]
            elem = jax.vmap(lambda h, row: fe.fir_decimate2(row, h, taps)[0]
                            )(hist, up[:, n_taps - 1:])

            # ---- frame batch -> LLR -> LDPC -> BCH ----------------------
            frames = elem.reshape(-1, cfg.frames_per_shard, mode.frame_samples)

            def frames_to_llr(fr):
                llr_t, diag = rx_chain.frames_to_llr_t(fr, chain_plan, consts)
                # means use the same conventions as the single-chip loop
                # (stream.py:345,353) so sro_coefficient applies unchanged
                return (llr_t, jnp.mean(diag["snr_db"]),
                        jnp.mean(diag["gi_cfo"]), jnp.mean(diag["sro"]))

            llr_t, snr, gi_cfo, sro = jax.vmap(frames_to_llr)(frames)
            c_loc, n_cw = llr_t.shape[0], llr_t.shape[2]
            llr_t = jnp.moveaxis(llr_t, 0, 2).reshape(llr_t.shape[1], -1)
            w = llr_t.shape[1]                            # C_loc * n_cw
            if self.use_pallas:
                dec = self._pallas[max(1, -(-w // 128))]  # step() prebuilt
                if dec.n_cw > w:
                    llr_t = jnp.pad(llr_t, ((0, 0), (0, dec.n_cw - w)))
                hard_t, ok, iters, bch_clean = dec.with_h(llr_t, bch_h)
                hard_t, ok = hard_t[:, :w], ok[:w]
                iters, bch_clean = iters[:w], bch_clean[:w]
            else:
                hard_t, ok, iters = self.decoder(llr_t)   # [k, C_loc*n_cw]
                bch_clean = bch_ops.syndrome_flags_t(
                    hard_t[:plp.n_bch], plp)

            # ---- global statistics over the whole mesh ------------------
            n_fail = jax.lax.psum(jnp.sum(~ok), ("ch", "time"))
            n_dirty = jax.lax.psum(jnp.sum(~bch_clean), ("ch", "time"))
            snr_mean = jax.lax.pmean(jnp.mean(snr), ("ch", "time"))

            hard = hard_t[:plp.n_bch].reshape(plp.n_bch, n_cw, c_loc
                                              ).transpose(2, 1, 0)
            hard = hard.reshape(c_loc, cfg.frames_per_shard,
                                cfg.n_fec_per_frame, plp.n_bch)
            stats = dict(ldpc_failures=n_fail, bch_dirty=n_dirty,
                         snr_db=snr_mean,
                         # tracking discriminators for the host loops
                         # (mesh analogue of stream.py:344-357): reduced
                         # over "time" ONLY — [C] out, one loop per channel
                         # (channels have independent LO/clock errors)
                         gi_cfo=jax.lax.pmean(gi_cfo, "time"),
                         sro=jax.lax.pmean(sro, "time"),
                         ldpc_iters=jax.lax.pmax(jnp.max(iters),
                                                 ("ch", "time")))
            return hard, stats

        mesh = self.mesh
        fn = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P("ch", "time"), P("ch", "time"), P("ch", "time"),
                      P("ch", "time"), P("ch"), P("ch"), P("ch"), P(), P()),
            out_specs=(P("ch", "time"),
                       dict(ldpc_failures=P(), bch_dirty=P(), snr_db=P(),
                            gi_cfo=P("ch"), sro=P("ch"), ldpc_iters=P())),
            check_vma=False)
        self._consts = self.chain_plan.device_consts()
        return jax.jit(fn)

    # ------------------------------------------------------------------
    def step(self, raw, idx0, frac0, phase0, freq, step_raw):
        """step_raw: raw-domain resample ratio(s), host float64 — scalar
        (all channels share a clock) or [C] (independent clocks); likewise
        freq.  idx0/frac0/phase0: [C, n_time] (host_bases output)."""
        if not isinstance(raw, C):
            raw = cplx.from_np(raw)
        # total channels may exceed the mesh's "ch" extent (channels-per-
        # device: the pod's 64-channel config on fewer chips); the leading
        # axis shards evenly over the mesh
        n_ch = raw.re.shape[0] if hasattr(raw, "re") else raw.shape[0]
        assert n_ch % self.n_ch == 0, (n_ch, self.n_ch)
        if self.use_pallas:
            # build (host-side, eagerly) the fused kernel the trace will
            # pick up; keyed purely by input shape so jit caching is sound
            self._ensure_pallas((n_ch // self.n_ch) * self.cw_per_shard)
        freq = np.broadcast_to(np.asarray(freq, np.float32), (n_ch,))
        step_raw = np.broadcast_to(np.asarray(step_raw, np.float64), (n_ch,))
        s_hi = np.empty(n_ch, np.float32)
        s_lo = np.empty(n_ch, np.float32)
        for c in range(n_ch):
            s_hi[c], s_lo[c] = fe.split_step(4.0 * float(step_raw[c]))
        idx0 = np.broadcast_to(np.asarray(idx0, np.int32),
                               (n_ch, self.n_time))
        frac0 = np.broadcast_to(np.asarray(frac0, np.float32),
                                (n_ch, self.n_time))
        phase0 = np.broadcast_to(np.asarray(phase0, np.float32),
                                 (n_ch, self.n_time))
        return self._step(raw, jnp.asarray(idx0), jnp.asarray(frac0),
                          jnp.asarray(phase0), jnp.asarray(freq),
                          jnp.asarray(s_hi), jnp.asarray(s_lo), self._consts,
                          self._h_dev)

    # ------------------------------------------------------------------
    def host_bases(self, mu_global, step, phase_global, freq,
                   raw_block: int, n_channels: int | None = None):
        """float64 host bookkeeping -> per-shard device bases.

        mu_global: resampler position (in raw samples) of this step's first
        output, relative to the first raw sample fed this step.  Every
        argument may be a scalar (shared by all channels) or a [C] vector
        (per-channel front-end state).  n_channels: total data channels
        (defaults to the mesh's "ch" extent; pass C when running several
        channels per device).
        Returns (idx0, frac0, phase0), each [C, n_time], local to each
        shard's haloed raw block.
        """
        nt, halo = self.n_time, self.cfg.halo
        nc = n_channels if n_channels is not None else max(
            self.n_ch, *(np.size(a) for a in (mu_global, step,
                                              phase_global, freq)))
        mu_global = np.broadcast_to(np.asarray(mu_global, np.float64), (nc,))
        step = np.broadcast_to(np.asarray(step, np.float64), (nc,))
        phase_global = np.broadcast_to(
            np.asarray(phase_global, np.float64), (nc,))
        freq = np.broadcast_to(np.asarray(freq, np.float64), (nc,))
        idx0 = np.empty((nc, nt), np.int32)
        frac0 = np.empty((nc, nt), np.float32)
        phase0 = np.empty((nc, nt), np.float32)
        for t in range(nt):
            # global raw-sample position of this shard's first farrow output;
            # the FIR window looks back taps-1 upsampled samples, so each
            # shard starts its farrow stream that much early (warm-up)
            p = mu_global + step * (2 * self.k_loc * t - (self.n_taps - 1))
            p_shard = p - t * raw_block + halo      # local incl. halo (raw)
            # x4 grid position, shifted by the half-band group delay
            g = 4.0 * p_shard + self.hb_delay_grid
            idx0[:, t] = np.floor(g).astype(np.int32)
            frac0[:, t] = (g - np.floor(g)).astype(np.float32)
            phase0[:, t] = ((phase_global + freq * (t * raw_block - halo))
                            % (2 * np.pi)).astype(np.float32)
        return idx0, frac0, phase0
