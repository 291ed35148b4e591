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

The receive step is TWO chained shard_map programs (mirroring the
single-chip compute_plane/receive_plane split, models/receiver.py):

* **plane stage** — front end + OFDM demod + pilot equalization.  PLP- and
  L1-dynamic-independent: its jit survives mux reconfigurations.  It also
  gathers the first frame's L1 signalling cells per channel (a few KB) so
  the host can track dynamic L1 every step without re-demodulating
  anything (the reference re-reads dynamic L1 every frame,
  /root/reference/src/DVB_T2/dvbt2_demodulator.cpp:328-346).
* **fec stage(s)** — per-PLP demap + LDPC + BCH screen + on-device bit
  packing (d2h shrinks 8x).  One jit per PLP; rebuilt (cheaply, the plane
  dominates compile time) when L1-dynamic changes PLP_NUM_BLOCKS.

Inside a shard everything is the same fused single-chip code path
(ops/frontend, ops/ofdm, ops/equalizer, ops/llr, ops/ldpc_decode); the
tracking discriminators and health statistics reduce over "time" ONLY,
giving [C] per-channel vectors (independent RF channels have independent
LO/clock errors and fail independently).

Alignment contract (host-managed): the legacy contiguous path feeds
``n_time * raw_block`` raw samples per step with the resampler position
carried in the warm-up band; the window path (`plane_step_windows`)
instead takes one raw window per (channel, time-shard) at host-chosen
positions — that is what lets the pod hop FEF gaps, steer first-path
timing, and re-seed a relocked channel without touching device shapes
(parallel/pod.py).
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


@dataclasses.dataclass(frozen=True)
class PlpState:
    """One decodable PLP sharing the equalized plane (multi-PLP mesh)."""
    plp: PlpConfig
    n_fec_per_frame: int
    n_ti: int = 1
    plp_start: int = 0


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
    # additional PLPs decoded from the same plane (tuple of PlpState);
    # the primary PLP above is index 0
    extra_plps: tuple = ()
    # FEF geometry from L1 (mixed T2+FEF streams, EN 302 755 clause 8.4):
    # (fef_interval, fef_length in elementary samples), or None.  The
    # window streaming path (parallel/pod.py) hops the gaps by FRAME_IDX
    # arithmetic; requires frames_per_shard == 1.
    fef: tuple | None = None
    num_t2: int = 1                  # T2 frames per superframe (FRAME_IDX
    #                                  modulus for the FEF arithmetic)


# raw samples of left context per host-sliced window: covers the FIR
# warm-up look-back plus the half-band transient, same margin the
# acquisition front end has always used (parallel/acquire.frontend_elem)
WINDOW_LEAD = 32


class ShardedReceiver:
    """Full receive step sharded over a (ch, time) mesh.

    Legacy combined entry (kept for the bench/dryrun and existing tests):

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

    Split entries (the steady-state pod path, parallel/pod.py):

      plane_step(...)          -> PlaneResult (plane stays on device)
      plane_step_windows(...)  -> PlaneResult from per-shard raw windows
      fec_step(plane, i)       -> per-PLP decoded bytes + per-channel stats

    Per-channel front-end state is first-class: independent RF channels
    have independent LO and sampling-clock errors, so the NCO frequency
    and the resample step shard over "ch" and every discriminator/health
    statistic reduces over "time" ONLY, returning [C] vectors — one
    closed loop per channel (pod.MultiChannelReceiver.stream).

    The host computes idx0/frac0/phase0 in float64 from the global stream
    position (host_bases / host_bases_windows) so device float32 never
    sees large absolute sample indices.
    """

    def __init__(self, cfg: ShardedConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.mode = cfg.mode.validate()
        self.plp = cfg.plp
        self.n_time = mesh.shape["time"]
        self.n_ch = mesh.shape["ch"]
        self.plps: list[PlpState] = [
            PlpState(cfg.plp, cfg.n_fec_per_frame, cfg.n_ti, cfg.plp_start)
        ] + list(cfg.extra_plps)
        self.n_sig = l1_mod.L1_PRE_CELLS + cfg.l1_post_cells
        self.plans = [self._plan_for(s) for s in self.plps]
        self.chain_plan = self.plans[0]          # compat alias
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
        self._pallas = {}                # (table, n_tiles) -> fused decoder
        self._xla_dec = {}               # table -> portable decoder
        self._h_dev = {}                 # plp idx -> device BCH H (bf16)
        self._fec_fns = {}               # (plp idx, n_ch_total) -> jit
        self._plane_fn = None
        self._plane_win_fn = None
        self._consts = [p.device_consts() for p in self.plans]
        self._sig_idx_dev = jax.device_put(
            jnp.asarray(self.plans[0].sig_idx[:self.n_sig]
                        .reshape(-1, 1).astype(np.int32)))
        self._step = self._build_legacy()

    def _plan_for(self, s: PlpState):
        return rx_chain.get_plan(
            self.mode, s.plp, s.n_fec_per_frame, s.n_ti,
            l1_mod.L1_PRE_CELLS + self.cfg.l1_post_cells + s.plp_start,
            sfn=self.cfg.sfn)

    # ------------------------------------------------------------------
    def replace_plp(self, i: int, state: PlpState):
        """L1-dynamic reconfiguration: PLP i's NUM_BLOCKS / START changed.
        The plane stage (mode-only) is untouched; only PLP i's fec jit and
        plan are rebuilt (reference analogue: the per-frame dynamic L1
        re-read, dvbt2_demodulator.cpp:328-346)."""
        self.plps[i] = state
        self.plans[i] = self._plan_for(state)
        self._consts[i] = self.plans[i].device_consts()
        self._fec_fns = {k: v for k, v in self._fec_fns.items()
                         if k[0] != i}
        if i == 0:
            self.chain_plan = self.plans[0]
            self.cw_per_shard = (self.cfg.frames_per_shard
                                 * state.n_fec_per_frame)

    # ------------------------------------------------------------------
    def _ensure_pallas(self, table: str, plp: PlpConfig, n_cw: int):
        """Build (eagerly, outside any trace) the fused kernel for this
        per-shard codeword count; cached by (table, tile count)."""
        from ..ops import ldpc_pallas
        tiles = max(1, -(-n_cw // 128))
        key = (table, tiles)
        if key not in self._pallas:
            self._pallas[key] = ldpc_pallas.make_pallas_decoder(
                table, batch=128, n_tiles=tiles,
                max_iters=self.cfg.ldpc_max_iters,
                interpret=jax.default_backend() != "tpu",
                bch_h=bch_ops._h_matrix(plp.k_bch, plp.bch_m, plp.bch_t))
        return self._pallas[key]

    def _decoder_for(self, i: int, n_cw: int):
        plp = self.plps[i].plp
        if self.use_pallas:
            if i not in self._h_dev:
                from ..ops import ldpc_pallas
                self._h_dev[i] = jnp.asarray(ldpc_pallas.pad_bch_h(
                    bch_ops._h_matrix(plp.k_bch, plp.bch_m, plp.bch_t)),
                    jnp.bfloat16)
            return self._ensure_pallas(plp.ldpc_table_name, plp, n_cw)
        if plp.ldpc_table_name not in self._xla_dec:
            self._xla_dec[plp.ldpc_table_name] = ldpc_decode.make_decoder_t(
                plp.ldpc_table_name, max_iters=self.cfg.ldpc_max_iters)
        return self._xla_dec[plp.ldpc_table_name]

    # ------------------------------------------------------------------
    def raw_block_for(self, step: float) -> int:
        """Raw samples consumed per time shard per step (host helper).

        ``step`` is the raw-domain ratio device_rate / (2 * elementary);
        the Farrow itself runs on a x4 half-band-upsampled grid internally.
        """
        return int(np.ceil(2 * self.k_loc * step)) + 32

    def window_len(self, step: float) -> int:
        """Raw window per (channel, shard) for the window streaming path."""
        return WINDOW_LEAD + self.raw_block_for(step)

    # ------------------------------------------------------------------
    def _front_end(self, x, idx0_col, frac0_col, phase0_col, freq,
                   step_hi, step_lo, taps, hb):
        """Shared per-shard front end: haloed raw rows -> elementary rows.

        x: C [C_loc, n_raw]; scalar-per-channel NCO/resampler state."""
        nco = lambda row, ph, fr: fe.nco_derotate(row, ph, fr)[0]
        x = jax.vmap(nco)(x, phase0_col, freq)
        hbz = cplx.czeros((x.re.shape[0], len(self.hb_taps) - 1))
        x = jax.vmap(lambda r, h: fe.upsample2(r, h, hb)[0])(x, hbz)
        x = jax.vmap(lambda r, h: fe.upsample2(r, h, hb)[0])(x, hbz)
        mu0 = frac0_col + idx0_col.astype(jnp.float32)
        up = jax.vmap(lambda row, m, sh, sl: fe.farrow_resample(
            row, m, sh, sl, self.n_up))(x, mu0, step_hi, step_lo)
        up = up[:, :2 * self.k_loc + self.n_taps - 1]
        hist = up[:, :self.n_taps - 1]
        elem = jax.vmap(lambda h, row: fe.fir_decimate2(row, h, taps)[0]
                        )(hist, up[:, self.n_taps - 1:])
        return elem                           # C [C_loc, k_loc]

    def _plane_from_elem(self, elem, consts):
        """elem [C_loc, k_loc] -> (packed u32 [C_loc, F, L, K], sig u32
        [C_loc, n_sig] (time-reduced), diag)."""
        cfg, mode = self.cfg, self.mode
        frames = elem.reshape(-1, cfg.frames_per_shard, mode.frame_samples)
        packed, diag = jax.vmap(
            lambda fr: rx_chain.frames_to_eq(fr, self.plans[0], consts)
        )(frames)

        # L1 signalling cells of the batch's GLOBAL first frame, per
        # channel: gather on shard 0, zeros elsewhere, psum over "time"
        t_idx = jax.lax.axis_index("time")
        sig_idx = consts["sig_idx"]

        def sig_one(p):
            return jax.lax.gather(
                p.reshape(-1), sig_idx, rx_chain._FAST_GATHER, (1,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                unique_indices=True)

        sig = jax.vmap(sig_one)(packed[:, 0])
        sig = jnp.where(t_idx == 0, sig, jnp.zeros_like(sig))
        sig = jax.lax.psum(sig, "time")

        ch_mean = lambda a: jnp.mean(a.reshape(a.shape[0], -1), axis=1)
        out_diag = dict(
            gi_cfo=jax.lax.pmean(ch_mean(diag["gi_cfo"]), "time"),
            sro=jax.lax.pmean(ch_mean(diag["sro"]), "time"))
        if "cir_p" in diag:
            # keep the delay axis: [C_loc, n_delays] channel profile
            cp = diag["cir_p"]
            out_diag["cir_p"] = jax.lax.pmean(
                jnp.mean(cp.reshape(cp.shape[0], -1, cp.shape[-1]), axis=1),
                "time")
        csi = diag.get("csi")                  # [C_loc, F, L, K] or None
        return packed, sig, csi, out_diag

    # ------------------------------------------------------------------
    def _build_plane(self):
        halo = self.cfg.halo
        taps = jnp.asarray(self.taps)
        hb = jnp.asarray(self.hb_taps)

        def body(raw, idx0, frac0, phase0, freq, s_hi, s_lo, consts):
            t_idx = jax.lax.axis_index("time")
            n_t = jax.lax.axis_size("time")
            tail = raw[:, -halo:]
            perm = [(i, (i + 1) % n_t) for i in range(n_t)]
            left = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "time", perm), tail)
            # shard 0 has no predecessor within the step; zeros are fine
            left = cplx.where(t_idx == 0, 0.0, left)
            x = cplx.concatenate([left, raw], axis=1)
            elem = self._front_end(x, idx0[:, 0], frac0[:, 0], phase0[:, 0],
                                   freq, s_hi, s_lo, taps, hb)
            return self._plane_from_elem(elem, consts)

        return self._wrap_plane(body, P("ch", "time"))

    def _build_plane_windows(self):
        taps = jnp.asarray(self.taps)
        hb = jnp.asarray(self.hb_taps)

        def body(raw_w, idx0, frac0, phase0, freq, s_hi, s_lo, consts):
            # raw_w: C [C_loc, 1, win] — each shard's window already
            # carries its own left context (WINDOW_LEAD), so no halo
            # collective is needed and windows may start anywhere the host
            # chooses (FEF hops, timing resync, per-channel relock)
            x = jax.tree.map(lambda a: a[:, 0], raw_w)
            elem = self._front_end(x, idx0[:, 0], frac0[:, 0], phase0[:, 0],
                                   freq, s_hi, s_lo, taps, hb)
            return self._plane_from_elem(elem, consts)

        return self._wrap_plane(body, P("ch", "time", None))

    def _wrap_plane(self, body, raw_spec):
        # csi/cir presence is a static property of the plan (SFN modes)
        csi_spec = P("ch", "time")
        diag_spec = dict(gi_cfo=P("ch"), sro=P("ch"))
        if self._plan_has_cir():
            diag_spec["cir_p"] = P("ch")
        out_specs = (P("ch", "time"), P("ch"),
                     csi_spec if self._plan_has_csi() else None,
                     diag_spec)
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(raw_spec, P("ch", "time"), P("ch", "time"),
                      P("ch", "time"), P("ch"), P("ch"), P("ch"), P()),
            out_specs=out_specs,
            check_vma=False)
        return jax.jit(fn)

    def _plan_has_csi(self) -> bool:
        return self._probe_diag("csi")

    def _plan_has_cir(self) -> bool:
        return self._probe_diag("cir_p")

    @functools.cached_property
    def _probe_keys_set(self) -> frozenset:
        """Trace one frame's eq abstractly to learn which diag keys this
        plan emits (csi / cir_p are SFN-plan-only).  cached_property (not
        lru_cache on a method) so the cache dies with the instance —
        long-running pods rebuild receivers."""
        shape = (1, self.mode.frame_samples)
        fr = C(jax.ShapeDtypeStruct(shape, jnp.float32),
               jax.ShapeDtypeStruct(shape, jnp.float32))
        _, diag = jax.eval_shape(
            lambda f, c: rx_chain.frames_to_eq(f, self.plans[0], c),
            fr, self._consts_with_sig(0))
        return frozenset(diag.keys())

    def _probe_diag(self, key: str) -> bool:
        return key in self._probe_keys_set

    def _consts_with_sig(self, i: int):
        c = dict(self._consts[i])
        c["sig_idx"] = self._sig_idx_dev
        return c

    # ------------------------------------------------------------------
    def _build_fec(self, i: int, n_ch_total: int):
        """Per-PLP fec-stage jit: packed plane -> packed BB-frame bytes +
        per-channel health statistics."""
        plan = self.plans[i]
        state = self.plps[i]
        plp = state.plp
        c_per_dev = n_ch_total // self.n_ch
        f_loc = self.cfg.frames_per_shard
        w = c_per_dev * f_loc * state.n_fec_per_frame
        decoder = self._decoder_for(i, w)
        use_pallas = self.use_pallas
        with_csi = self._plan_has_csi()
        nb = plp.n_bch

        def body(packed, csi, consts, bch_h):
            c_loc = packed.shape[0]
            p2 = packed.reshape(c_loc * f_loc, *packed.shape[2:])
            csi2 = (csi.reshape(c_loc * f_loc, *csi.shape[2:])
                    if with_csi else None)
            llr_t, snr = rx_chain.packed_to_llr_t(p2, plan, consts,
                                                  csi=csi2)
            n_cw = llr_t.shape[1]
            if use_pallas:
                if decoder.n_cw > n_cw:
                    llr_t = jnp.pad(llr_t,
                                    ((0, 0), (0, decoder.n_cw - n_cw)))
                hard_t, ok, iters, clean = decoder.with_h(llr_t, bch_h)
                hard_t, ok = hard_t[:, :n_cw], ok[:n_cw]
                iters, clean = iters[:n_cw], clean[:n_cw]
            else:
                hard_t, ok, iters = decoder(llr_t)
                clean = bch_ops.syndrome_flags_t(hard_t[:nb], plp)
            bytes_t = bch_ops.pack_bits_t(hard_t[:nb])     # [nb/8, W]
            nf = state.n_fec_per_frame
            out_bytes = bytes_t.T.reshape(c_loc, f_loc, nf, nb // 8)
            reshape3 = lambda a: a.reshape(c_loc, f_loc, nf)
            snr_ch = jax.lax.pmean(
                jnp.mean(snr.reshape(c_loc, f_loc), axis=1), "time")
            return (out_bytes, reshape3(ok), reshape3(iters),
                    reshape3(clean), snr_ch)

        csi_spec = P("ch", "time") if with_csi else P()
        fn = shard_map(
            body, mesh=self.mesh,
            in_specs=(P("ch", "time"), csi_spec, P(), P()),
            out_specs=(P("ch", "time"), P("ch", "time"), P("ch", "time"),
                       P("ch", "time"), P("ch")),
            check_vma=False)
        return jax.jit(fn)

    # ------------------------------------------------------------------
    def _normalize_state(self, n_ch, freq, step_raw):
        freq = np.broadcast_to(np.asarray(freq, np.float32), (n_ch,))
        step_raw = np.broadcast_to(np.asarray(step_raw, np.float64),
                                   (n_ch,))
        s_hi = np.empty(n_ch, np.float32)
        s_lo = np.empty(n_ch, np.float32)
        for c in range(n_ch):
            s_hi[c], s_lo[c] = fe.split_step(4.0 * float(step_raw[c]))
        return freq, s_hi, s_lo

    def plane_step(self, raw, idx0, frac0, phase0, freq, step_raw):
        """Legacy contiguous input (ppermute halo): -> PlaneResult."""
        if self._plane_fn is None:
            self._plane_fn = self._build_plane()
        if not isinstance(raw, C):
            raw = cplx.from_np(raw)
        n_ch = raw.re.shape[0]
        assert n_ch % self.n_ch == 0, (n_ch, self.n_ch)
        freq, s_hi, s_lo = self._normalize_state(n_ch, freq, step_raw)
        idx0 = np.broadcast_to(np.asarray(idx0, np.int32),
                               (n_ch, self.n_time))
        frac0 = np.broadcast_to(np.asarray(frac0, np.float32),
                                (n_ch, self.n_time))
        phase0 = np.broadcast_to(np.asarray(phase0, np.float32),
                                 (n_ch, self.n_time))
        packed, sig, csi, diag = self._plane_fn(
            raw, jnp.asarray(idx0), jnp.asarray(frac0), jnp.asarray(phase0),
            jnp.asarray(freq), jnp.asarray(s_hi), jnp.asarray(s_lo),
            self._consts_with_sig(0))
        return PlaneResult(self, packed, sig, csi, diag, n_ch)

    def plane_step_windows(self, raw_w, idx0, frac0, phase0, freq,
                           step_raw):
        """Per-shard raw windows [C, n_time, win] -> PlaneResult.

        Each window carries its own WINDOW_LEAD of left context at a
        host-chosen raw position (host_bases_windows)."""
        if self._plane_win_fn is None:
            self._plane_win_fn = self._build_plane_windows()
        if not isinstance(raw_w, C):
            raw_w = cplx.from_np(raw_w)
        n_ch = raw_w.re.shape[0]
        assert n_ch % self.n_ch == 0, (n_ch, self.n_ch)
        freq, s_hi, s_lo = self._normalize_state(n_ch, freq, step_raw)
        packed, sig, csi, diag = self._plane_win_fn(
            raw_w, jnp.asarray(np.asarray(idx0, np.int32)),
            jnp.asarray(np.asarray(frac0, np.float32)),
            jnp.asarray(np.asarray(phase0, np.float32)),
            jnp.asarray(freq), jnp.asarray(s_hi), jnp.asarray(s_lo),
            self._consts_with_sig(0))
        return PlaneResult(self, packed, sig, csi, diag, n_ch)

    def fec_step(self, plane: "PlaneResult", i: int = 0):
        """Decode PLP i from the shared plane: returns FecResult."""
        state = self.plps[i]
        n_ch = plane.n_ch
        key = (i, n_ch)
        if key not in self._fec_fns:
            # decoder built host-side, eagerly, before the trace
            self._decoder_for(i, (n_ch // self.n_ch)
                              * self.cfg.frames_per_shard
                              * state.n_fec_per_frame)
            self._fec_fns[key] = self._build_fec(i, n_ch)
        csi = plane.csi
        if csi is None:
            csi = jnp.zeros((), jnp.bfloat16)      # unused placeholder
        h = self._h_dev.get(i)
        if h is None:
            h = jnp.zeros((1, 1), jnp.bfloat16)    # portable path: unused
        out_bytes, ok, iters, clean, snr = self._fec_fns[key](
            plane.packed, csi, self._consts[i], h)
        return FecResult(np.asarray(out_bytes), np.asarray(ok),
                         np.asarray(iters), np.asarray(clean),
                         np.asarray(snr), state)

    # ------------------------------------------------------------------
    def _build_legacy(self):
        """Combined step(): plane + primary-PLP fec, legacy contract."""
        def step(raw, idx0, frac0, phase0, freq, step_raw):
            plane = self.plane_step(raw, idx0, frac0, phase0, freq,
                                    step_raw)
            fec = self.fec_step(plane, 0)
            hard = np.unpackbits(fec.bb_bytes, axis=-1)
            diag = plane.diag_host()
            stats = dict(
                ldpc_failures=np.sum(~fec.ldpc_ok),
                bch_dirty=np.sum(~fec.bch_clean),
                snr_db=float(np.mean(fec.snr_db)),
                gi_cfo=diag["gi_cfo"], sro=diag["sro"],
                ldpc_iters=int(np.max(fec.ldpc_iters)),
                # per-channel health (pod resilience; VERDICT r3 next #3)
                ldpc_failures_ch=np.sum(~fec.ldpc_ok, axis=(1, 2)),
                bch_dirty_ch=np.sum(~fec.bch_clean, axis=(1, 2)),
                snr_db_ch=fec.snr_db)
            if "cir_p" in diag:
                stats["cir_p"] = diag["cir_p"]
            return hard, stats
        return step

    def step(self, raw, idx0, frac0, phase0, freq, step_raw):
        """step_raw: raw-domain resample ratio(s), host float64 — scalar
        (all channels share a clock) or [C] (independent clocks); likewise
        freq.  idx0/frac0/phase0: [C, n_time] (host_bases output)."""
        return self._step(raw, idx0, frac0, phase0, freq, step_raw)

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

    def host_bases_windows(self, r0, step, phase_origin, freq):
        """Per-shard window bases for plane_step_windows.

        r0: [C, n_time] float64 — raw position (relative to the raw array
        the windows will be sliced from) of each shard's first elementary
        output (= the shard's frame start).  phase_origin: [C] NCO phase
        at raw index 0 of that array.  Returns (w0 [C, n_time] int64
        window starts, idx0, frac0, phase0) with w0 = floor(r0) -
        WINDOW_LEAD.
        """
        r0 = np.asarray(r0, np.float64)
        nc, nt = r0.shape
        step = np.broadcast_to(np.asarray(step, np.float64), (nc,))
        phase_origin = np.broadcast_to(
            np.asarray(phase_origin, np.float64), (nc,))
        freq = np.broadcast_to(np.asarray(freq, np.float64), (nc,))
        w0 = np.floor(r0).astype(np.int64) - WINDOW_LEAD
        mu_local = r0 - w0                        # in [LEAD, LEAD + 1)
        p = mu_local + step[:, None] * (-(self.n_taps - 1))
        g = 4.0 * p + self.hb_delay_grid
        idx0 = np.floor(g).astype(np.int32)
        frac0 = (g - np.floor(g)).astype(np.float32)
        phase0 = ((phase_origin[:, None] + freq[:, None] * w0)
                  % (2 * np.pi)).astype(np.float32)
        return w0, idx0, frac0, phase0


@dataclasses.dataclass
class PlaneResult:
    """Plane-stage output: the packed plane (and CSI) stay sharded on
    device; the L1 signalling cells and discriminators come to host."""
    rx: ShardedReceiver
    packed: jax.Array                 # u32 [C, n_time*F, L, K], (ch, time)
    sig: jax.Array                    # u32 [C, n_sig]
    csi: jax.Array | None             # bf16 like packed, SFN plans only
    diag: dict                        # gi_cfo/sro (+cir_p), [C] each
    n_ch: int

    def diag_host(self) -> dict:
        return {k: np.asarray(v) for k, v in self.diag.items()}

    def l1_cells(self, channel: int | None = None) -> np.ndarray:
        """Equalized L1 signalling cells as complex — per channel, or
        [C, n_sig] for all (bf16-packed halves, like receiver.l1_cells)."""
        g = np.asarray(self.sig).astype(np.uint32)
        if channel is not None:
            g = g[channel]
        re = ((g >> np.uint32(16)) << np.uint32(16)).view(np.float32)
        im = ((g & np.uint32(0xFFFF)) << np.uint32(16)).view(np.float32)
        return re + 1j * im


@dataclasses.dataclass
class FecResult:
    """Per-PLP decode output; everything host numpy, bytes packed 8x."""
    bb_bytes: np.ndarray              # u8 [C, F, n_fec, n_bch/8]
    ldpc_ok: np.ndarray               # bool [C, F, n_fec]
    ldpc_iters: np.ndarray            # [C, F, n_fec]
    bch_clean: np.ndarray             # bool [C, F, n_fec]
    snr_db: np.ndarray                # [C]
    state: PlpState
