"""Fused frame-batch receive chain: OFDM demod -> equalize -> demap -> LLR.

TPU-optimized v2 of the per-frame pipeline.  Two structural changes versus
the textbook formulation (and the reference's serial loops):

1. **Channel interpolation as a matmul.**  Linear interpolation between
   pilots is a linear operator; for each distinct pilot layout (P2 symbol,
   the dy scattered-pilot phases, FC symbol) the pilot->carrier
   interpolation matrix W [p_max, K] is precomputed with the interpolation
   fractions folded in, and the per-symbol channel estimate becomes one
   MXU matmul h_d = h_p @ W per layout group — replacing four large
   take_along_axis gathers (which dominate on TPU) and the angle-domain
   trig (atan2/cos/sin) with complex-domain interpolation.
2. **One composed gather.**  Frequency deinterleave, the L1/PLP slice and
   the time+cell deinterleave are all static permutations; their
   composition maps each FEC-block cell directly to a carrier of the
   equalized [L, K] plane.  One gather instead of three, operating once
   per cell instead of once per intermediate stream.

The remaining per-cell work (cyclic-Q-delay roll, derotation, SNR/precision
estimate, |x|-fold LLRs, bit deinterleave) reuses ops/llr.py machinery.

Reference call path being replaced: data_symbol.cpp:98-318 (equalize+freq
deint) -> time_deinterleaver.cpp:299-317 -> llr_demapper.cpp:296-352.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..params import freq_interleaver, pilots
from ..params.modes import T2Mode, PlpConfig
from . import cplx, ofdm
from . import equalizer as eq_mod
from . import llr as llr_mod
from .cplx import C


def _banded_interp_weights(K: int, seg: int, sets: list):
    """Banded linear-interpolation weight tables for per-symbol pilot sets.

    ``sets``: one dict per output symbol row l with keys
      src  — frame symbol whose carrier plane holds the pilots (usually l;
             the MISO temporal-pairing plan points a data symbol at its
             NEIGHBOUR's pilots, which makes the partner estimate free),
      pidx — sorted pilot carrier indices (int64),
      sign — TX1 reference sign per pilot,
      amp  — reference amplitude per pilot,
      wiener — optional (center, span, fft_size, noise) MMSE design (see
             below); absent/None selects 2-tap linear weights.
    Returns (group_syms, regroup, weights); see EqTables for the device
    contract.

    Wiener rows: a near-0 dB SFN echo at delay d rotates H(k) by
    2*pi*d*Dx/Tu between adjacent pilots — ~3.7 rad for a 200-sample echo
    at 2K/Dx=6, far past what 2-tap linear interpolation can follow even
    though the pilot grid itself is unaliased to Tu/Dx.  For those modes
    the band's weights are instead the per-carrier LMMSE interpolator for
    a uniform delay prior of width ``span`` centred at ``center``:
    pilot estimates are pre-rotated by e^{+2pi j k c/Tu} (folded into the
    complex sign_inv), which centres the prior at zero delay and makes
    the channel autocorrelation the REAL kernel sinc(dk*span/Tu) — so the
    banded matmul stays two real einsums — and the outputs are
    post-rotated back by e^{-2pi j k c/Tu} (the per-group ``rot`` table).
    Weights solve (R_pp + noise*I) W = R_dp per segment (one [win, win]
    solve per 256 carriers, shared by every symbol row in the group).

    Banded form: carrier k interpolates between pilot ordinals lo(k) and
    lo(k)+1, and lo is monotone in k — so a segment of SEG consecutive
    carriers touches only a narrow window of pilot ordinals.  Storing
    [n_seg, WIN, SEG] instead of the dense [p_max, K] cuts the weight
    bytes ~400x (the dense matmul was HBM-read-bound on the weights).
    The window width is per pilot GROUP (the P2 symbol's every-3rd-carrier
    pilots need ~6x the data symbols' window; one global width would
    inflate every gather).

    The pilot values themselves are fetched with ONE composed
    carrier-plane gather per group: win_idx[s, w] holds the flat carrier
    index of pilot ordinal o(s)+w, so the per-symbol pilot extraction and
    the per-segment window gather collapse into a single static index
    table (a separate [L, p_max] pilot gather + a window re-gather
    measured 7.3 ms of the 47 ms batch; the composed form is ~0.8 ms).
    The reference sign / amplitude normalization folds into a per-entry
    weight (sign_inv), with padded window slots zeroed.
    """
    L = len(sets)
    n_seg = -(-K // seg)
    groups: dict[tuple, list[int]] = {}
    for l in range(L):
        groups.setdefault((sets[l]["pidx"].tobytes(),
                           sets[l].get("wiener")), []).append(l)
    group_syms = [np.array(v, np.int32) for v in groups.values()]
    order = np.concatenate(group_syms)
    regroup = np.empty(L, np.int64)
    regroup[order] = np.arange(L)                   # undo group concat order

    weights = []   # (win_idx [Lg,S,Wg] i32, si_re [Lg,S,Wg],
    #                  si_im [Lg,S,Wg] | None, wband [S,Wg,SEG],
    #                  rot (re [K], im [K]) | None)
    for syms in group_syms:
        s0 = sets[int(syms[0])]
        pidx = s0["pidx"]
        wiener = s0.get("wiener")
        n_pil = len(pidx)
        k = np.arange(K)
        lo = np.clip(np.searchsorted(pidx, k) - 1, 0, n_pil - 2)
        if wiener is None:
            span = np.maximum(pidx[lo + 1] - pidx[lo], 1)
            frac = (k - pidx[lo]) / span
            win = 0
            for s in range(n_seg):
                seg_lo = lo[s * seg:(s + 1) * seg]
                win = max(win, int(seg_lo.max() - seg_lo.min()) + 2)
            win = -(-win // 8) * 8
            o_idx = np.zeros(n_seg, np.int64)
            wband = np.zeros((n_seg, win, seg), np.float32)
            for s in range(n_seg):
                k0 = s * seg
                k1 = min(k0 + seg, K)
                seg_lo = lo[k0:k1]
                o = int(seg_lo.min())
                o_idx[s] = o
                cols = np.arange(k1 - k0)
                wband[s, seg_lo - o, cols] = 1.0 - frac[k0:k1]
                wband[s, seg_lo - o + 1, cols] = frac[k0:k1]
            ords = np.minimum(o_idx[:, None] + np.arange(win)[None],
                              n_pil - 1)                   # [S, Wg]
            valid = (o_idx[:, None] + np.arange(win)[None]) < n_pil
        else:
            center, dspan, fftn, noise = wiener
            H = 12                     # extra MMSE taps on each side
            win = 0
            for s in range(n_seg):
                seg_lo = lo[s * seg:(s + 1) * seg]
                win = max(win,
                          int(seg_lo.max() - seg_lo.min()) + 2 + 2 * H)
            win = min(-(-win // 8) * 8, n_pil)
            o_idx = np.zeros(n_seg, np.int64)
            wband = np.zeros((n_seg, win, seg), np.float32)
            for s in range(n_seg):
                k0 = s * seg
                k1 = min(k0 + seg, K)
                o = int(np.clip(lo[k0:k1].min() - (H - 1),
                                0, n_pil - win))
                o_idx[s] = o
                p = pidx[o:o + win].astype(np.float64)
                r_pp = np.sinc((p[:, None] - p[None, :]) * (dspan / fftn))
                r_dp = np.sinc((p[:, None] - np.arange(k0, k1)[None])
                               * (dspan / fftn))
                wband[s, :, :k1 - k0] = np.linalg.solve(
                    r_pp + noise * np.eye(win), r_dp)
            ords = o_idx[:, None] + np.arange(win)[None]   # all in range
            valid = np.ones_like(ords, bool)
        # src may be scalar (all pilots from one symbol) or per-pilot (the
        # temporal-union SFN sets mix pilots from a Dy-symbol window)
        flat = np.stack([np.broadcast_to(sets[int(l)]["src"],
                                         pidx.shape).astype(np.int64) * K
                         + pidx for l in syms])             # [Lg, n_pil]
        win_idx = flat[:, ords].astype(np.int32)            # [Lg, S, Wg]
        sign = np.stack([sets[int(l)]["sign"][ords] for l in syms])
        inv_amp = np.stack([1.0 / sets[int(l)]["amp"][ords] for l in syms])
        s_amp = sign * inv_amp * valid[None]
        if wiener is None:
            si_re, si_im, rot = s_amp.astype(np.float32), None, None
        else:
            ph = 2.0 * np.pi * pidx[ords] * (center / fftn)  # [S, Wg]
            si_re = (s_amp * np.cos(ph)[None]).astype(np.float32)
            si_im = (s_amp * np.sin(ph)[None]).astype(np.float32)
            kr = -2.0 * np.pi * np.arange(K) * (center / fftn)
            rot = (np.cos(kr).astype(np.float32),
                   np.sin(kr).astype(np.float32))
        weights.append((win_idx, si_re, si_im, wband, rot))
    return group_syms, regroup, weights


class EqTables:
    """Mode-only equalizer tables (shared by every PLP of a mux).

    ``sfn=True`` forces the Wiener/CSI/CIR machinery onto modes whose
    default plan is linear (single-symbol pilot reach covers the guard):
    the grid is unaliased there, but 2-tap linear WEIGHTS still cannot
    follow an in-guard echo near the reach limit (e.g. 32K GI1/128 PP7:
    a 250-sample echo rotates H(k) by 4.6 rad between pilots).  The flag
    comes from the acquisition-time delay-spread measurement
    (runtime/acquisition.acquire_mode), so clean channels keep the
    cheaper linear rows."""

    def __init__(self, mode: T2Mode, sfn: bool = False):
        self.mode = mode
        self.sfn = bool(sfn)
        L, K = mode.frame_symbols, mode.k_total
        self.eq_plan = eq_mod.get_plan(mode)       # pilot gather tables, diag
        ep = self.eq_plan
        SEG = 256
        self.seg = SEG
        self.n_seg = -(-K // SEG)

        def full_set(l):
            n = int(ep.n_pilots[l])
            return dict(src=l,
                        pidx=np.asarray(ep.pilot_idx[l][:n]).astype(np.int64),
                        sign=np.asarray(ep.ref_vals[l][:n]),
                        amp=np.asarray(ep.amp_vals[l][:n]))

        self.ph_rot = None
        self.cir_tab = None
        self.cir_d = None
        if not mode.miso:
            sets = [full_set(l) for l in range(L)]
            # SFN reach: a row interpolating from its own pilots alone
            # resolves delay spread only up to fft_size / (largest pilot
            # gap) — e.g. Tu/(Dx*Dy) for a scattered-only data symbol,
            # which for small FFT sizes with wide guards is far short of
            # the GI (2K PP3 GI1/8: 85 of 256 samples).  Where that
            # falls short of the guard interval, union the row's pilots
            # with those of a centered Dy-symbol window (per-pilot src;
            # duplicates resolve to the nearest symbol).  This is the
            # matmul form of the classic scattered-pilot temporal
            # interpolation (the channel is assumed static across the
            # window, as the reference's data_symbol interpolation also
            # assumes), and restores reach to ~Tu/Dx — beyond any legal
            # GI.  Rows already covering the GI (P2, FC, dense patterns
            # like the 32K ones) keep their cheaper single-symbol plan.
            need = [mode.fft_size // int(np.diff(s["pidx"]).max())
                    < mode.guard_size for s in sets]
            h = (mode.dy + 1) // 2
            for l in range(L):
                if not need[l]:
                    continue
                lo = max(0, min(l - h, L - (2 * h + 1)))
                window = sorted(range(lo, min(L, lo + 2 * h + 1)),
                                key=lambda s: (abs(s - l), s - l))
                cat = {key: np.concatenate([full_set(s)[key]
                                            for s in window])
                       for key in ("pidx", "sign", "amp")}
                cat["src"] = np.concatenate(
                    [np.full(int(ep.n_pilots[s]), s, np.int64)
                     for s in window])
                _, first = np.unique(cat["pidx"], return_index=True)
                sets[l] = {key: v[first] for key, v in cat.items()}
            if any(need) or self.sfn:
                # SFN-capable mode: LMMSE interpolation weights for a
                # guard-width delay prior on EVERY row (linear weights
                # fail on in-guard echoes long before the grid aliases —
                # see _banded_interp_weights), and per-symbol common-phase
                # pre-derotation so the temporal union mixes
                # phase-consistent pilots under residual CFO (same
                # requirement and mask construction as MISO's pairing).
                for st in sets:
                    gap = int(np.diff(st["pidx"]).max())
                    # prior window [-dspan/8, 7*dspan/8]: anchored just
                    # below delay 0 (first-path timing sync), extending
                    # toward the GI as far as the pilot grid's alias-free
                    # span allows (a guard/2-centred window would exclude
                    # delay 0 itself when the grid is coarse, e.g. 2K PP7)
                    dspan = min(mode.guard_size + mode.guard_size // 2,
                                int(0.85 * mode.fft_size / gap))
                    st["wiener"] = (dspan / 2 - dspan / 8, dspan,
                                    mode.fft_size, 1e-2)
                sro_idx = np.asarray(ep.sro_idx)
                ph_rot = np.zeros((L, K), np.float32)
                for l in range(L):
                    ph_rot[l, sro_idx] = np.sign(
                        pilots.reference_symbol(mode, l)[sro_idx])
                self.ph_rot = ph_rot
                # delay-profile probe for the CIR-anchored timing loop
                # (runtime/stream.py): cir(d) = sum_k hann(k) h(k)
                # e^{+2pi j k d/Tu} on a coarse grid around [0, GI].
                # Hann keeps spectral-truncation sidelobes ~-31 dB so the
                # first-path threshold (-11 dB) never fires on them.
                dstep = max(2, mode.guard_size // 128)
                d = np.arange(-(mode.guard_size // 2),
                              mode.guard_size + dstep, dstep)
                hann = np.hanning(K)
                ang = 2.0 * np.pi * np.outer(np.arange(K),
                                             d) / mode.fft_size
                self.cir_d = d
                self.cir_tab = (
                    (hann[:, None] * np.cos(ang)).astype(np.float32),
                    (hann[:, None] * np.sin(ang)).astype(np.float32))
            self.group_syms, self.regroup, self.weights = \
                _banded_interp_weights(K, SEG, sets)
        else:
            self._build_miso(L, K, SEG, full_set)

        # dense +-1 sign masks for the common-phase-offset discriminator
        # (sum of pilot phasors per half-spectrum): a masked row reduction
        # over the carrier plane replaces the [L, p_max] pilot gather.
        # MISO: only group-2-non-inverted pilots enter (an inverted pilot
        # carries h1-h2, whose phase is unrelated to the common rotation)
        ph1 = np.zeros((L, K), np.float32)
        ph2 = np.zeros((L, K), np.float32)
        half = K // 2
        for l in range(L):
            n_pil = int(ep.n_pilots[l])
            pidx = np.asarray(ep.pilot_idx[l][:n_pil])
            sign = np.asarray(ep.ref_vals[l][:n_pil])
            if mode.miso:
                keep = ~pilots.miso_inversion_mask(mode, l)[pidx]
                pidx, sign = pidx[keep], sign[keep]
            fh = pidx < half
            ph1[l, pidx[fh]] = sign[fh]
            ph2[l, pidx[~fh]] = sign[~fh]
        self.ph_mask = (ph1, ph2)

    # ------------------------------------------------------------------
    def _build_miso(self, L, K, SEG, full_set):
        """MISO channel-separation plans (EN 302 755 clause 9.2.2.3).

        Group 2 inverts pilot subsets, so a pilot reads h1 + h2 or
        h1 - h2 after TX1-reference normalization.  Per symbol this
        builds TWO interpolated planes:

        * ``weights`` (own): each symbol's same-polarity pilots — data
          symbols' scattered pilots share ONE polarity that alternates
          per symbol; continual pilots on scattered columns have fixed
          per-carrier polarity and join only when matching; edge pilots
          always match.  P2/FC symbols split by carrier parity instead
          and use their even (non-inverted) half here.
        * ``weights_alt``: the opposite polarity — for data symbols the
          TEMPORAL partner symbol's own pilots (src points at l+-1, so
          the partner plane costs nothing extra); for P2/FC the odd
          (inverted) carrier half of the same symbol.

        h1 = (own + alt)/2,  h2 = o_sign * (own - alt)/2, where
        o_sign[l] = +1 when the own plane is the non-inverted one.
        Alamouti pair combining then uses pair_idx/pair_sign
        (equalize_plane_miso).
        """
        mode = self.mode
        own_sets, alt_sets = [], []
        o_sign = np.ones(L, np.float32)
        n_p2 = mode.n_p2
        last_reg = L - 1 - (1 if mode.has_fc else 0)
        assert last_reg > n_p2, "MISO needs >= 2 regular data symbols"
        for l in range(L):
            fs = full_set(l)
            inv = pilots.miso_inversion_mask(mode, l)[fs["pidx"]]
            def sub(s, keep):
                return dict(src=s["src"], pidx=s["pidx"][keep],
                            sign=s["sign"][keep], amp=s["amp"][keep])
            if l < n_p2 or (mode.has_fc and l == L - 1):
                own_sets.append(sub(fs, ~inv))
                alt_sets.append(sub(fs, inv))
            else:
                # the symbol's SP polarity: SPs sit at k = dx*(l mod dy)
                # (mod dx*dy), so (k//dx) parity == l parity (dy is even
                # for every pattern); edge pilots share it by the l%2 rule
                sp_inv = bool(l % 2)
                own_sets.append(sub(fs, inv == sp_inv))
                o_sign[l] = -1.0 if sp_inv else 1.0
                partner = l + 1 if l < last_reg else l - 1
                pfs = full_set(partner)
                pinv = pilots.miso_inversion_mask(mode, partner)[pfs["pidx"]]
                p_sp_inv = bool(partner % 2)
                alt_sets.append(dict(sub(pfs, pinv == p_sp_inv),
                                     src=partner))
        self.group_syms, self.regroup, self.weights = \
            _banded_interp_weights(K, SEG, own_sets)
        self.group_syms_alt, self.regroup_alt, self.weights_alt = \
            _banded_interp_weights(K, SEG, alt_sets)
        self.o_sign = o_sign[:, None]

        # Alamouti pair tables: payload cells pair with their carrier-order
        # neighbour within the symbol (MISO processing runs after frequency
        # interleaving, clause 6.4); pilots pair with themselves (sign 0 —
        # those plane positions are never gathered downstream)
        pair = np.arange(L * K, dtype=np.int64).reshape(L, K)
        psign = np.zeros((L, K), np.float32)
        for l in range(L):
            didx = pilots.data_cell_indices(mode, l)
            assert len(didx) % 2 == 0, (l, len(didx))
            a, b = didx[0::2], didx[1::2]
            pair[l, a] = l * K + b
            pair[l, b] = l * K + a
            psign[l, a] = 1.0
            psign[l, b] = -1.0
        self.pair_idx = pair.reshape(-1).astype(np.int32)
        self.pair_sign = psign
        # the pairing is strictly LOCAL and in-row: payload partners are
        # carrier-order neighbours (offset +-1, stretching to +-3 across
        # skipped pilots), pilots self-map.  Ship the per-cell offset
        # instead of a flat index: the partner planes then come from a
        # handful of masked in-row shifts instead of two full-plane
        # gathers (TPU gathers are element-count-bound at ~1.4 G elem/s;
        # measured 19 ms -> ~1 ms on four 32K frames, tools/profile_sfn).
        off = (pair - np.arange(L * K, dtype=np.int64).reshape(L, K))
        self.pair_off = off.astype(np.int32)
        self.pair_offsets = tuple(int(d) for d in np.unique(off) if d != 0)
        assert all(abs(d) <= 8 for d in self.pair_offsets), self.pair_offsets

        # Common-phase derotation mask: the temporal pairing needs every
        # symbol phase-aligned, and the phase must be measured on the SAME
        # carriers in every symbol — a per-symbol pilot set would carry a
        # set-dependent, channel-weighted phase bias (frequency-selective
        # channels give different pilot subsets different mean phases),
        # which leaks between h1 and h2 as a constant cross-channel error
        # (~6 dB effective-SNR loss measured on a two-path channel).  Use
        # the symbol-invariant consistent-polarity continual pilots, kept
        # non-inverted only so the measured phasor is always (h1+h2)-type.
        ep = self.eq_plan
        sro_idx = np.asarray(ep.sro_idx)
        keep = ~pilots.miso_inversion_mask(mode, 0)[sro_idx]
        rot_idx = sro_idx[keep if keep.any() else slice(None)]
        ph_rot = np.zeros((L, K), np.float32)
        for l in range(L):
            sign = np.sign(pilots.reference_symbol(mode, l)[rot_idx])
            ph_rot[l, rot_idx] = sign
        self.ph_rot = ph_rot

    def device_consts(self):
        """Eq tables as device arrays — ONE copy per mode per process (the
        interpolation weights are the big tensors; PLPs share them)."""
        import jax as _jax
        key = id(self)
        cached = _EQ_DEVICE_CONSTS.get(key)
        if cached is not None:
            return cached
        # CPU XLA lacks batched bf16 dot thunks; bf16 weights are TPU-only
        wdt = (jnp.bfloat16 if _jax.default_backend() != "cpu"
               else jnp.float32)
        def dev_w(weights):
            # rot stays f32: a bf16 post-rotation phase costs ~-48 dB on
            # the whole estimate; si/wband bf16 errors stay pre-MMSE
            return tuple(
                (_jax.device_put(jnp.asarray(wi)),
                 _jax.device_put(jnp.asarray(sr).astype(wdt)),
                 None if si is None else
                 _jax.device_put(jnp.asarray(si).astype(wdt)),
                 _jax.device_put(jnp.asarray(wb).astype(wdt)),
                 None if rot is None else
                 tuple(_jax.device_put(jnp.asarray(r)) for r in rot))
                for wi, sr, si, wb, rot in weights)
        consts = dict(
            w=dev_w(self.weights),
            ph_mask=tuple(_jax.device_put(jnp.asarray(m))
                          for m in self.ph_mask),
        )
        if self.ph_rot is not None:
            consts["ph_rot"] = _jax.device_put(jnp.asarray(self.ph_rot))
        if self.cir_tab is not None:
            consts["cir_tab"] = tuple(_jax.device_put(jnp.asarray(t))
                                      for t in self.cir_tab)
        if self.mode.miso:
            consts.update(
                w_alt=dev_w(self.weights_alt),
                o_sign=_jax.device_put(jnp.asarray(self.o_sign)),
                pair_off=_jax.device_put(jnp.asarray(self.pair_off)),
                pair_sign=_jax.device_put(jnp.asarray(self.pair_sign)),
            )
        _EQ_DEVICE_CONSTS[key] = consts
        return consts


_EQ_DEVICE_CONSTS: dict = {}


@functools.lru_cache(maxsize=8)
def get_eq_tables(mode: T2Mode, sfn: bool = False) -> EqTables:
    if sfn and eq_mod.sfn_reach_gated(mode):
        return get_eq_tables(mode, False)   # already Wiener — dedup tables
    return EqTables(mode, sfn)


class ChainPlan:
    """All device constants for frames -> LLR, one T2Mode + PLP config.

    The mode-only equalizer tables live in a shared :class:`EqTables`
    (multi-PLP receivers demod/equalize ONCE per frame batch and run only
    the per-PLP gather + demap + FEC per PLP)."""

    def __init__(self, mode: T2Mode, plp: PlpConfig, n_fec: int, n_ti: int,
                 l1_cells: int, sfn: bool = False):
        self.mode = mode
        self.plp = plp
        self.n_fec = n_fec
        self.l1_cells = l1_cells
        L, K = mode.frame_symbols, mode.k_total
        self.eq = get_eq_tables(mode, sfn)
        self.eq_plan = self.eq.eq_plan
        self.group_syms = self.eq.group_syms
        self.regroup = self.eq.regroup
        self.weights = self.eq.weights
        self.ph_mask = self.eq.ph_mask
        self.demap = llr_mod.get_plan(plp, n_fec, n_ti)

        # ---- composed cell gather: FEC cell -> flat [L*K] position ----------
        pay2carrier = []
        for l in range(L):
            didx = pilots.data_cell_indices(mode, l)
            n_cells = len(didx)
            take = n_cells
            if mode.has_fc and l == L - 1:
                take = mode.c_fc
            h = freq_interleaver.tx_permutation(mode, n_cells, l)
            pay2carrier.append(l * K + didx[h[:take]])
        pay2carrier = np.concatenate(pay2carrier)
        assert len(pay2carrier) == mode.frame_cells, (
            len(pay2carrier), mode.frame_cells)
        # carrier positions of the leading payload cells (L1-pre/post live
        # here): lets the steady-state L1-dynamic tracker read its cells
        # straight off the equalized plane instead of re-demodulating the
        # P2 symbol on the host every batch (runtime/stream.py)
        self.sig_idx = np.asarray(pay2carrier[:l1_cells].astype(np.int32))
        stream = pay2carrier[l1_cells:l1_cells
                             + n_fec * plp.cells_per_fec_block]
        self.cell_idx = np.asarray(stream[self.demap.ti_gather]
                                   .astype(np.int32))    # [n_fec, n_cells]

        # bit deinterleave + LDPC-kernel row order folded into ONE static
        # row gather on the transposed LLR stream
        from .ldpc_pallas import kernel_bit_order
        self.bit_rows = np.asarray(
            self.demap.bit_gather[kernel_bit_order(plp.ldpc_table_name)]
            .astype(np.int32))                           # [fec_size]
        # ... and, when the composed permutation is block/roll-structured
        # (all bit-interleaved modes except NORMAL C3_5: the column-twist
        # interleaver reads rows across columns, so each run of kernel rows
        # is one demap bit plane at stride Nc/eta with a cyclic offset),
        # the whole N-element gather collapses to eta*Nc/eta strided slices
        # + rolls: (plane, slice phase, slice step, roll offset) per block.
        self.bit_blocks = self._decompose_bit_rows()

    def _decompose_bit_rows(self):
        """bit_rows as concat of rolled stride-g slices of demap planes.

        Returns list of (plane, phase, step, roll, length) with
        rows == concat_j [ (phase + step*((roll + i) % L)) * eta + plane ]
        cell-index form, or None when no such structure exists (QPSK's
        staircase-only map, NORMAL C3_5's different twist set).
        """
        from math import gcd
        rows = self.bit_rows.astype(np.int64)
        eta = self.plp.bits_per_cell
        n_cells = len(rows) // eta
        cell, bit = rows // eta, rows % eta
        blocks = np.split(np.arange(len(rows)),
                          np.nonzero(np.diff(bit))[0] + 1)
        out = []
        for blk in blocks:
            if len(blk) < 2:
                return None
            b = int(bit[blk[0]])
            c = cell[blk]
            s = int((c[1] - c[0]) % n_cells)
            if s == 0 or not np.array_equal(
                    (c[0] + s * np.arange(len(blk))) % n_cells, c):
                return None
            g = gcd(s, n_cells)
            if s // g != 1 or len(blk) != n_cells // g:
                return None
            phase = int(c[0] % g)
            out.append((b, phase, g, int((c[0] - phase) // g), len(blk)))
        return out


    def device_consts(self):
        """Big tensors as a pytree to pass as jit ARGUMENTS.

        They must not be closed over: closure constants are embedded in the
        compile request (the interpolation weights alone are ~0.5 GB, which
        overflows the remote-compile body limit and bloats every program).
        The eq part is shared per mode (EqTables.device_consts); only
        cell_idx/bit_rows are per-PLP.
        """
        import jax as _jax
        return dict(
            self.eq.device_consts(),
            cell_idx=_jax.device_put(jnp.asarray(self.cell_idx)),
            bit_rows=_jax.device_put(jnp.asarray(self.bit_rows)),
        )


@functools.lru_cache(maxsize=8)
def get_plan(mode: T2Mode, plp: PlpConfig, n_fec: int, n_ti: int,
             l1_cells: int, sfn: bool = False) -> ChainPlan:
    if sfn and eq_mod.sfn_reach_gated(mode):
        return get_plan(mode, plp, n_fec, n_ti, l1_cells)  # dedup plans
    return ChainPlan(mode, plp, n_fec, n_ti, l1_cells, sfn)


def _pack_bf16(x: C):
    """Real pair -> one u32 plane (bf16 halves): re in the high 16 bits."""
    hi = jax.lax.bitcast_convert_type(
        x.re.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        x.im.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (hi << 16) | lo


def _unpack_bf16(p, dtype=jnp.float32) -> C:
    return C(
        jax.lax.bitcast_convert_type((p >> 16).astype(jnp.uint16),
                                     jnp.bfloat16).astype(dtype),
        jax.lax.bitcast_convert_type((p & 0xFFFF).astype(jnp.uint16),
                                     jnp.bfloat16).astype(dtype))


_FAST_GATHER = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))


def _grouped_interp(packed, weights_c, group_syms, regroup, K) -> C:
    """Grouped banded-interpolation matmuls (bf16 on the MXU): per segment
    of 256 carriers, gather the pilot window straight from the carrier
    plane and multiply by the banded weight block."""
    outs_re, outs_im = [], []
    for syms, (win_idx, si_re, si_im, wband, rot) in zip(group_syms,
                                                         weights_c):
        g = jax.lax.gather(
            packed, win_idx.reshape(-1, 1), _FAST_GATHER, (1,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        h = _unpack_bf16(g.reshape(win_idx.shape), wband.dtype)
        if si_im is None:
            hr = h.re * si_re                                 # [Lg, S, Wg]
            hi = h.im * si_re
        else:
            # complex sign_inv: Wiener rows fold the delay-centering
            # pre-rotation e^{+2pi j k c/Tu} into the pilot reference
            hr = h.re * si_re - h.im * si_im
            hi = h.re * si_im + h.im * si_re
        er = jnp.einsum("lsw,swc->lsc", hr, wband,
                        preferred_element_type=jnp.float32)
        ei = jnp.einsum("lsw,swc->lsc", hi, wband,
                        preferred_element_type=jnp.float32)
        er = er.reshape(er.shape[0], -1)[:, :K]
        ei = ei.reshape(ei.shape[0], -1)[:, :K]
        if rot is not None:                    # undo the delay centering
            rr, ri = rot
            er, ei = er * rr - ei * ri, er * ri + ei * rr
        outs_re.append(er)
        outs_im.append(ei)
    return C(jnp.concatenate(outs_re)[regroup],
             jnp.concatenate(outs_im)[regroup])               # [L, K]


def equalize_plane(carriers: C, plan: ChainPlan, consts):
    """[L, K] carriers -> ([L, K] equalized plane, diag dict)."""
    ep = plan.eq_plan
    K = plan.mode.k_total

    if "ph_rot" in consts:
        # Per-symbol common-phase pre-derotation.  The MISO h1/h2
        # separation pairs a data symbol's estimate with its NEIGHBOUR's
        # (temporal pairing); residual CFO gives each symbol a different
        # common phase, which would leak between the paired estimates as
        # cross-channel error.  Measure each symbol's phase on the
        # symbol-INVARIANT consistent-polarity continual pilots (ph_rot —
        # same carriers every symbol, so the channel-weighted bias of the
        # estimate is common to all symbols and cancels in the pairing);
        # the conjugations in the Alamouti combine also require
        # phase-aligned symbols.  SISO SFN-capable modes provide ph_rot
        # too: their temporal-union interpolation mixes pilots from a
        # Dy-symbol window, which must be phase-consistent the same way.
        #
        # The phase is measured DIFFERENTIALLY against symbol 0:
        # z_l = sum_cp a_l(k) conj(a_0(k)) with a = carriers * ph_rot.
        # An absolute pilot-phasor sum (sum_cp h(k) sign(k)) can cancel
        # to ~zero on a frequency-selective SFN channel (the CP phasors
        # rotate through 2pi several times across the spectrum), making
        # its angle pure noise and randomizing every symbol's rotation;
        # the differential product weights by |h(k)|^2 >= 0 instead, so
        # the channel can never cancel it.  The leftover common rotation
        # (symbol 0's own CPE) is absorbed by the channel estimate — it
        # is common to every row, which is all the union/pairing needs.
        m = consts["ph_rot"]
        ar = carriers.re * m
        ai = carriers.im * m
        zr = jnp.sum(ar * ar[0:1] + ai * ai[0:1], axis=1, keepdims=True)
        zi = jnp.sum(ai * ar[0:1] - ar * ai[0:1], axis=1, keepdims=True)
        inv_mag = jax.lax.rsqrt(jnp.maximum(zr * zr + zi * zi, 1e-18))
        carriers = carriers * C(zr * inv_mag, -zi * inv_mag)

    # pack both IQ components into one u32 plane; all pilot fetches below
    # are single composed gathers on it (gathers are element-count-bound
    # on TPU; bf16 pilots sit ~55 dB below the channel estimate)
    packed = _pack_bf16(carriers).reshape(-1)                 # [L*K]

    h_d = _grouped_interp(packed, consts["w"], plan.group_syms,
                          plan.regroup, K)

    if plan.mode.miso:
        # second interpolated plane of the opposite pilot polarity ->
        # separate the two transmit-group channels, then Alamouti-combine
        # carrier-order payload pairs (EN 302 755 clause 6.4 / 9.2.2.3)
        h_alt = _grouped_interp(packed, consts["w_alt"],
                                plan.eq.group_syms_alt,
                                plan.eq.regroup_alt, K)
        o = consts["o_sign"]                                  # [L, 1]
        h1 = (h_d + h_alt) * 0.5
        h2 = (h_d - h_alt) * 0.5 * o
        # partner values: the pairing is a strictly local in-row
        # permutation (payload pairs are carrier-order neighbours,
        # pilots self-map), so the partner planes come from masked
        # in-row shifts — same values the full-plane pair gather
        # produced, at elementwise cost instead of ~1.4 G elem/s
        # gather cost (EqTables._build_miso; tools/profile_sfn.py)
        off = consts["pair_off"]                              # [L, K] i32
        packed2 = packed.reshape(carriers.re.shape)
        h2_packed = _pack_bf16(h2)
        rp_sel, h2p_sel = packed2, h2_packed
        for d in plan.eq.pair_offsets:                        # static set
            m = off == d
            rp_sel = jnp.where(m, jnp.roll(packed2, -d, axis=1), rp_sel)
            h2p_sel = jnp.where(m, jnp.roll(h2_packed, -d, axis=1),
                                h2p_sel)
        r_p = _unpack_bf16(rp_sel)                            # r[partner]
        h2_p = _unpack_bf16(h2p_sel)
        s = consts["pair_sign"]                               # [L, K]
        # out[x] = (h1[x]* r[x] + s_x h2[y] r[y]*) / (|h1[x]|^2+|h2[y]|^2)
        num = h1.conj() * carriers + (h2_p * r_p.conj()) * s
        denom = jnp.maximum(h1.abs2() + h2_p.abs2(), 1e-9)
        eq = num * (1.0 / denom)
    else:
        denom = jnp.maximum(h_d.abs2(), 1e-9)
        eq = carriers * h_d.conj() * (1.0 / denom)

    # ---- diagnostics (the reference's tracking discriminators) ----
    # common phase offset: sum of pilot phasors per half-spectrum, as a
    # dense +-1-masked row reduction (no gather)
    m1, m2 = consts["ph_mask"]
    sum1 = C(jnp.sum(carriers.re * m1, axis=1),
             jnp.sum(carriers.im * m1, axis=1))
    sum2 = C(jnp.sum(carriers.re * m2, axis=1),
             jnp.sum(carriers.im * m2, axis=1))
    phase_offset = sum1.angle() + sum2.angle()

    sro_pil = cplx.take(carriers, ep.sro_idx, axis=1) * ep.sro_ref
    # per-pilot symbol-pair phasor z = p_l * conj(p_{l-1}); its angle is
    # (common rotation) + (timing slope * bin).  Derotate by the common
    # rotation (the summed phasor Z) BEFORE the half-spectrum difference so
    # uncorrected CFO cannot leak into the timing estimate — without this,
    # a mesh deployment that hasn't converged its CFO loop yet reads a
    # large false SRO (sin(theta) times the half-count imbalance)
    z_re = (sro_pil.re[1:] * sro_pil.re[:-1]
            + sro_pil.im[1:] * sro_pil.im[:-1])
    z_im = (sro_pil.im[1:] * sro_pil.re[:-1]
            - sro_pil.re[1:] * sro_pil.im[:-1])
    zs_re = jnp.sum(z_re, axis=1, keepdims=True)
    zs_im = jnp.sum(z_im, axis=1, keepdims=True)
    mag = jnp.sqrt(jnp.maximum(zs_re ** 2 + zs_im ** 2, 1e-18))
    drift = (z_im * zs_re - z_re * zs_im) / mag
    d1 = jnp.sum(jnp.where(ep.sro_first_half[None], drift, 0), axis=1)
    d2 = jnp.sum(jnp.where(ep.sro_first_half[None], 0, drift), axis=1)
    pwr = jnp.mean(sro_pil.abs2(), axis=1)
    sro = jnp.concatenate([jnp.zeros((1,)), (d2 - d1)
                           / jnp.maximum(pwr[1:] * sro_pil.shape[1], 1e-9)])
    diag = dict(phase_offset=phase_offset, sro=sro)
    if "cir_tab" in consts:
        # per-carrier channel power (mean-normalized) for the demapper's
        # per-cell LLR weighting: an SFN echo carves deep nulls where the
        # ZF-equalized cells are pure amplified noise (bf16: 40 dB+ of
        # headroom above the int8 LLR grid)
        ab2 = h_d.abs2()
        csi = ab2 / jnp.maximum(jnp.mean(ab2), 1e-12)
        diag["csi"] = csi.astype(jnp.bfloat16)
        # delay profile |cir(d)|^2 of the frame-mean channel estimate
        # (rows are phase-aligned by the ph_rot derotation above) — feeds
        # the CIR-anchored first-path timing loop (runtime/stream.py)
        tr, ti = consts["cir_tab"]                         # [K, nd]
        hr = jnp.mean(h_d.re, axis=0)
        hi = jnp.mean(h_d.im, axis=0)
        diag["cir_p"] = ((hr @ tr - hi @ ti) ** 2
                         + (hr @ ti + hi @ tr) ** 2)
    return eq, diag


def packed_to_llr_t(packed, plan: ChainPlan, consts, csi=None):
    """Packed eq planes u32 [F, L, K] -> (llr_T [N, F*n_fec], snr_db [F]).

    ``csi`` (optional bf16 [F, L, K], from the eq diag of SFN modes):
    per-carrier channel power; deinterleaved by the same composed cell
    gather and handed to the demapper as per-cell LLR reliability.

    The deinterleave gather moves both IQ components in ONE u32 gather by
    packing them as bf16 halves (gathers are index-bound on TPU; halving
    the element count halves the time; bf16 cells are 40 dB+ above the
    demapper's int8 LLR quantization).  The gather and demap run row-major
    (codeword rows — XLA's gather is much faster in the deinterleave's
    natural output order); the bit deinterleave folds the LDPC kernel's
    bit-row order in, and ONE cheap 2-D transpose at the end hands the
    decoder its codewords-on-lanes layout.  This is the per-PLP half of
    the chain; the packed plane is shared across PLPs.
    """
    f = packed.shape[0]

    # materialize the eq plane before gathering: without the barrier XLA
    # fuses the equalizer's producer chain INTO the gather and re-evaluates
    # it per gathered element — measured +20 ms vs +8 ms on the MISO path
    # (4x 32K frames; the shift-select chain is the worst producer, but the
    # barrier is free when the plane is already materialized)
    packed = jax.lax.optimization_barrier(packed)
    if csi is not None:
        csi = jax.lax.optimization_barrier(csi)

    # per-frame gather (XLA gather cost grows with SOURCE size — keep the
    # source at one frame's plane, vmap over frames); the index set is a
    # permutation, so unique_indices + PROMISE_IN_BOUNDS skip the clamp
    # and dedup machinery (~1.7x faster on TPU)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
    flat_idx = consts["cell_idx"].reshape(-1, 1)

    def one_plane(p):
        return jax.lax.gather(
            p.reshape(-1), flat_idx, dn, (1,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            unique_indices=True)

    g = jax.vmap(one_plane)(packed)
    g = g.reshape(-1, consts["cell_idx"].shape[1])     # [F*n_fec, n_cells]
    cells = _unpack_bf16(g)
    csi_cells = None
    if csi is not None:
        csi_cells = jax.vmap(one_plane)(csi).reshape(g.shape)
    planes, snr = llr_mod.demap_cells_planes(cells, f, plan.demap,
                                             csi=csi_cells)
    if plan.bit_blocks is not None:
        # structured path: each kernel-row block is one bit plane sliced at
        # stride `step` and cyclically rolled — no N-element gather at all
        segs = []
        for b, phase, step, roll, ln in plan.bit_blocks:
            v = planes[b][:, phase::step] if step > 1 else planes[b]
            segs.append(v if roll == 0 else
                        jnp.concatenate([v[:, roll:], v[:, :roll]], axis=1))
        llr = jnp.concatenate(segs, axis=1)            # [W, N] kernel order
    else:
        stream = jnp.stack(planes, axis=-1).reshape(cells.re.shape[0], -1)
        llr = stream[:, consts["bit_rows"]]    # [W, N] kernel bit order
    return llr.T, snr


def frames_to_cells(frames_iq: C, plan: ChainPlan, consts):
    """[F, frame_samples] -> deinterleaved PLP cells C [W, n_cells].

    Diagnostics surface: the equalized, frequency/time/cell-deinterleaved
    constellation points right before the demapper — what the reference
    plots in its constellation view (main_window.cpp:416-476).
    """
    packed, _ = frames_to_eq(frames_iq, plan, consts)
    flat_idx = consts["cell_idx"].reshape(-1, 1)

    def one_plane(p):
        return jax.lax.gather(
            p.reshape(-1), flat_idx, _FAST_GATHER, (1,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            unique_indices=True)

    g = jax.vmap(one_plane)(packed)
    return _unpack_bf16(g.reshape(-1, consts["cell_idx"].shape[1]))


def frames_to_eq(frames_iq: C, plan: ChainPlan, consts):
    """[F, frame_samples] -> (packed eq planes u32 [F, L, K], diag pytree).

    The PLP-independent half (demod + pilot equalization): multi-PLP
    receivers run it once per batch and feed every PLP's demap from the
    same packed plane (the reference re-runs its whole symbol pipeline per
    PLP; here the plane costs ~60% of the chain and is shared).
    """
    def demod_eq(frame):
        carriers, gi_cfo = ofdm.demod_frame(frame, plan.mode)
        eq, diag = equalize_plane(carriers, plan, consts)
        diag["gi_cfo"] = gi_cfo
        return _pack_bf16(eq), diag

    return jax.vmap(demod_eq)(frames_iq)


def frames_to_llr_t(frames_iq: C, plan: ChainPlan, consts):
    """[F, frame_samples] -> (llr_T [N, F*n_fec], diag pytree).

    ``consts`` = plan.device_consts(), passed through jit as arguments.
    llr_T rows are in LDPC-kernel bit order; columns are codewords.
    """
    packed, diag = frames_to_eq(frames_iq, plan, consts)
    llr_t, snr = packed_to_llr_t(packed, plan, consts,
                                 csi=diag.pop("csi", None))
    diag["snr_db"] = snr
    return llr_t, diag
