"""TPU receiver: the device data plane + host control plane.

Replaces the reference's 7-QThread pipeline (SURVEY.md section 1) with a
single fused, jitted frame processor on the device and a thin host control
loop:

  device (one jit per frame batch):
      symbol framing -> batched FFT -> pilot equalization + frequency
      deinterleave -> time/cell/bit deinterleave + rotated-QAM soft demap
      -> int8 LLR codewords                                  [ops/*]
  device (Pallas):
      layered min-sum LDPC over 128-codeword lanes           [ops/ldpc_pallas]
  device:
      BCH syndrome screen (MXU GF(2) matmul)                 [ops/bch_ops]
  host:
      L1 parsing (once per config change), rare BCH corrections, BB frame
      de-encapsulation to TS bytes, tracking-loop state.

Feedback loops (CFO / common phase / sampling rate) are block-recurrent:
estimates measured on frame batch N are applied to batch N+1 by the
streaming front-end (ops/resampler.py), instead of the reference's
per-sample IIR loops (dvbt2_demodulator.cpp:151-192).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..io.bbframe import BBFrameParser, HEADER_BITS
from ..ops import bch_ops, cplx, rx_chain
from ..params import l1 as l1_mod
from ..params.modes import (T2Mode, PlpConfig, Constellation, CodeRate,
                            FecFrame, PilotPattern, GuardInterval, FftMode,
                            Papr)
from . import receiver_ref


@dataclasses.dataclass
class RxConfig:
    mode: T2Mode
    plp: PlpConfig
    n_fec_per_frame: int
    n_ti: int
    plp_start: int = 0                  # cell address after L1 (multi-PLP)
    ldpc_max_iters: int = 15
    use_pallas: bool | None = None      # None = auto (TPU only)
    sfn: bool = False                   # force Wiener rows (long echoes
    #                                     measured at acquisition) on modes
    #                                     whose default plan is linear


@dataclasses.dataclass
class FrameBatchResult:
    ts_bytes: np.ndarray
    ldpc_ok: np.ndarray
    bch_clean: np.ndarray
    bch_corrected: np.ndarray
    snr_db: float
    ldpc_iters: np.ndarray          # per-codeword first-clean iteration
    diag: dict
    # (bb_frame_index, padding-field bits) for each first-BB-frame-of-an-
    # interleaving-frame whose DFL left a padding field — the in-band
    # signalling carrier (EN 302 755 clause 5.2.3; io/inband.py)
    padding: list = dataclasses.field(default_factory=list)


def config_from_l1(mode_hint: T2Mode, pre: l1_mod.L1Pre,
                   post: l1_mod.L1Post, plp_idx: int = 0,
                   sfn: bool = False) -> RxConfig:
    """Build the receiver configuration from decoded L1 signalling."""
    p = post.plp[plp_idx]
    mode = T2Mode(
        fft_mode=mode_hint.fft_mode,
        guard=GuardInterval(pre.guard_interval),
        pilot_pattern=PilotPattern(pre.pilot_pattern),
        extended_carriers=bool(pre.bwt_ext),
        papr=Papr(pre.papr),
        miso=mode_hint.miso,        # from the P1 S1 field (acquisition)
        lite=mode_hint.lite,
        n_data_symbols=pre.num_data_symbols,
    )
    plp = PlpConfig(
        plp_id=p.id,
        constellation=Constellation(p.plp_mod),
        rotation=bool(p.plp_rotation),
        code_rate=CodeRate(p.plp_cod),
        fec_frame=FecFrame(p.plp_fec_type),
        num_blocks_max=p.plp_num_blocks_max,
        time_il_length=p.time_il_length,
        time_il_type=p.time_il_type,
    )
    n_fec = post.dyn.plp[plp_idx].num_blocks
    n_ti = max(1, p.time_il_length if p.time_il_type == 0 else 1)
    return RxConfig(mode=mode, plp=plp, n_fec_per_frame=n_fec, n_ti=n_ti,
                    plp_start=post.dyn.plp[plp_idx].start, sfn=sfn)


class TpuReceiver:
    """Steady-state frame-batch receiver for one PLP."""

    def __init__(self, cfg: RxConfig, ldpc_batch: int | None = None):
        self.cfg = cfg
        self.mode = cfg.mode.validate()
        self.plp = cfg.plp
        self.oracle = receiver_ref.ReferenceReceiver(self.mode)
        from ..io.native import make_bb_parser
        self.bb = make_bb_parser()      # native C++ when a toolchain exists
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        self.use_pallas = cfg.use_pallas if cfg.use_pallas is not None else on_tpu

        self._ldpc_batch = ldpc_batch
        self._decoder = None

    # ------------------------------------------------------------------
    @functools.cached_property
    def _plan(self):
        return rx_chain.get_plan(
            self.mode, self.plp, self.cfg.n_fec_per_frame, self.cfg.n_ti,
            l1_mod.L1_PRE_CELLS + self._l1_post_cells + self.cfg.plp_start,
            sfn=self.cfg.sfn)

    @functools.cached_property
    def _consts(self):
        return self._plan.device_consts()

    @functools.cached_property
    def _plane_fn(self):
        """Jitted PLP-independent half: frames -> packed eq plane."""
        plan, consts = self._plan, self._consts
        fn = jax.jit(
            lambda frames, c: rx_chain.frames_to_eq(frames, plan, c))
        return lambda frames: fn(frames, consts)

    @functools.cached_property
    def _demap_fn(self):
        """Jitted per-PLP half: packed plane -> kernel-ordered LLRs."""
        plan, consts = self._plan, self._consts
        fn = jax.jit(
            lambda packed, c, csi: rx_chain.packed_to_llr_t(
                packed, plan, c, csi=csi))
        return lambda packed, csi=None: fn(packed, consts, csi)

    def compute_plane(self, frames_iq: np.ndarray):
        """Demod+equalize once; the result feeds every PLP's demap."""
        return self._plane_fn(cplx.from_np(np.asarray(frames_iq)))

    @functools.cached_property
    def _l1_cells_fn(self):
        """Jitted gather of the L1-pre/post cells from a packed eq plane.

        Steady-state L1-dynamic tracking reads ~10k cells per batch; doing
        it on the plane (symbol 0 is the equalized P2) replaces a host-side
        32K FFT + interpolation per batch and uses the full banded-matmul
        equalizer instead of the acquisition-path interp."""
        n_sig = l1_mod.L1_PRE_CELLS + self._l1_post_cells
        idx = jnp.asarray(self._plan.sig_idx[:n_sig].reshape(-1, 1))

        @jax.jit
        def fn(packed):
            return jax.lax.gather(
                packed[0].reshape(-1), idx, rx_chain._FAST_GATHER, (1,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                unique_indices=True)

        return fn

    def l1_cells(self, packed_plane) -> np.ndarray:
        """L1 signalling cells (complex) of the batch's first frame, read
        from the shared packed plane (compute_plane output)."""
        g = np.asarray(self._l1_cells_fn(packed_plane)).astype(np.uint32)
        re = ((g >> np.uint32(16)) << np.uint32(16)).view(np.float32)
        im = ((g & np.uint32(0xFFFF)) << np.uint32(16)).view(np.float32)
        return re + 1j * im

    def equalized_cells(self, frames_iq: np.ndarray) -> np.ndarray:
        """Deinterleaved constellation cells (complex) for diagnostics —
        the reference's constellation plot data (main_window.cpp:416-476)."""
        cells = rx_chain.frames_to_cells(cplx.from_np(np.asarray(frames_iq)),
                                         self._plan, self._consts)
        return np.asarray(cells.re) + 1j * np.asarray(cells.im)

    # ------------------------------------------------------------------
    def acquire_l1(self, frame_iq: np.ndarray):
        """Host path: demodulate one frame and decode L1 (oracle logic)."""
        carriers = self.oracle.demod_symbols(np.asarray(frame_iq))
        payload = self.oracle.equalize_deinterleave(carriers)
        pre, post, _ = self.oracle.decode_l1(payload)
        return pre, post

    @functools.cached_property
    def _l1_post_cells(self) -> int:
        pre, _post = self.acquire_l1(self._first_frame)
        assert pre is not None, "L1-pre CRC failed during acquisition"
        return pre.l1_post_size

    def prime(self, first_frame_iq: np.ndarray):
        """Provide one frame for L1 acquisition before streaming."""
        self._first_frame = np.asarray(first_frame_iq)
        _ = self._l1_post_cells
        return self

    # ------------------------------------------------------------------
    def _get_decoder(self, n_codewords: int):
        from ..ops import ldpc_decode, ldpc_pallas
        if self._decoder is not None:
            if self._ldpc_batch is not None and n_codewords > self._ldpc_batch:
                self._decoder = None        # larger batch: rebuild/re-tile
            else:
                return self._decoder
        if self.use_pallas:
            tiles = max(1, -(-n_codewords // 128))
            self._ldpc_batch = tiles * 128
            self._decoder = ldpc_pallas.make_pallas_decoder(
                self.plp.ldpc_table_name, batch=128, n_tiles=tiles,
                max_iters=self.cfg.ldpc_max_iters,
                bch_h=bch_ops._h_matrix(self.plp.k_bch, self.plp.bch_m,
                                        self.plp.bch_t))
        else:
            self._ldpc_batch = n_codewords
            self._decoder = ldpc_decode.make_decoder_t(
                self.plp.ldpc_table_name, max_iters=self.cfg.ldpc_max_iters)
        return self._decoder

    # ------------------------------------------------------------------
    def receive(self, frames_iq: np.ndarray) -> FrameBatchResult:
        """[F, frame_samples] complex ndarray -> decoded TS + statistics."""
        return self.receive_plane(*self.compute_plane(frames_iq))

    def receive_stream(self, batches):
        """Double-buffered receive over an iterable of frame batches.

        Dispatches batch N+1's DEVICE work (demod->equalize->demap->FEC,
        all asynchronously enqueued) before synchronizing batch N's
        device->host transfer and host TS assembly, so the d2h of one
        batch overlaps the compute of the next (and the async transfer
        start collapses the per-array round-trip latencies).  Yields one
        FrameBatchResult per batch, in order.
        """
        pending = None
        for frames in batches:
            nxt = self.receive_plane_async(*self.compute_plane(frames))
            if pending is not None:
                yield self.finish(pending)
            pending = nxt
        if pending is not None:
            yield self.finish(pending)

    def receive_plane(self, packed, diags) -> FrameBatchResult:
        """Decode this PLP from a shared packed eq plane (compute_plane).

        Multi-PLP: one compute_plane per batch, one receive_plane per PLP
        (runtime/stream.py:step_batch) — N PLPs cost one demod/equalize
        pass plus N cheap demap+FEC passes, not N full pipelines.
        """
        return self.finish(self.receive_plane_async(packed, diags))

    def receive_plane_async(self, packed, diags):
        """Device half of receive_plane: enqueue demap+FEC and START the
        device->host copies without blocking; finish() completes them.
        (Starting every copy before the first read also collapses the
        tunnel's per-array round-trip latencies into one.)"""
        llr_t, snr = self._demap_fn(packed, diags.get("csi"))
        diags = {k: v for k, v in diags.items() if k != "csi"}
        diags["snr_db"] = snr
        n_cw = llr_t.shape[1]
        decoder = self._get_decoder(n_cw)
        if self._ldpc_batch > n_cw:
            pad = jnp.zeros((llr_t.shape[0], self._ldpc_batch - n_cw),
                            llr_t.dtype)
            llr_in = jnp.concatenate([llr_t, pad], axis=1)
        else:
            llr_in = llr_t
        out = decoder(llr_in)
        if len(out) == 4:                  # Pallas: BCH screen fused
            hard_t, ok, iters, clean = out
            clean = clean[:n_cw]
        else:
            hard_t, ok, iters = out
            clean = bch_ops.syndrome_flags_t(
                hard_t[:, :n_cw][:self.plp.n_bch], self.plp)
        hard_t, ok, iters = hard_t[:, :n_cw], ok[:n_cw], iters[:n_cw]
        # pack bits to bytes ON DEVICE: the device->host transfer shrinks 8x
        # and the host receives BB-frame bytes directly (n_bch rather than
        # k_bch so the rare dirty codewords can be BCH-corrected host-side
        # without a second device round trip)
        packed = bch_ops.pack_bits_t(hard_t[:self.plp.n_bch])
        for a in (packed, clean, ok, iters, *diags.values()):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        return packed, clean, ok, iters, diags

    def finish(self, pending) -> FrameBatchResult:
        """Host half: synchronize the transfers and assemble TS bytes."""
        packed, clean, ok, iters, diags = pending
        n_cw = int(packed.shape[1])
        packed_np = np.asarray(packed, dtype=np.uint8).T   # [n_cw, n_bch/8]
        clean_np = np.asarray(clean)
        corrected = np.zeros(n_cw, dtype=np.int64)
        kb = self.plp.k_bch // 8
        frames_bytes = np.ascontiguousarray(packed_np[:, :kb])
        for i in np.nonzero(~clean_np)[0]:
            bits = np.unpackbits(packed_np[i])[:self.plp.n_bch]
            fixed, nerr = bch_ops.correct_host(bits, self.plp)
            corrected[i] = nerr
            frames_bytes[i] = np.packbits(fixed)
        ts_bytes = self.bb.parse_batch(frames_bytes)
        return FrameBatchResult(
            ts_bytes=ts_bytes,
            ldpc_ok=np.asarray(ok),
            bch_clean=clean_np,
            bch_corrected=corrected,
            snr_db=float(np.mean(np.asarray(diags["snr_db"]))),
            ldpc_iters=np.asarray(iters),
            diag={k: np.asarray(v) for k, v in diags.items()},
            padding=self._collect_padding(frames_bytes),
        )

    @functools.cached_property
    def _scrambler_bytes(self) -> np.ndarray:
        from ..params import prbs
        return np.packbits(prbs.bb_scrambler(self.plp.k_bch))

    def _collect_padding(self, frames_bytes: np.ndarray) -> list:
        """Padding-field bits of each interleaving frame's first BB frame
        (where in-band signalling rides, EN 302 755 clause 5.2.3).  Only
        frames whose DFL actually leaves padding are descrambled — a
        padding-free stream costs one 10-byte XOR per frame here."""
        out = []
        scr = self._scrambler_bytes
        kb = self.plp.k_bch // 8
        for j in range(0, len(frames_bytes), self.cfg.n_fec_per_frame):
            hdr = frames_bytes[j, :10] ^ scr[:10]
            dfl = int(hdr[4]) << 8 | int(hdr[5])
            if dfl <= 0 or dfl % 8 or HEADER_BITS + dfl >= kb * 8:
                continue
            pad = np.unpackbits(
                frames_bytes[j, 10 + dfl // 8:] ^ scr[10 + dfl // 8:])
            out.append((j, pad))
        return out
