#!/usr/bin/env python3
"""Render the receiver's diagnostic dump as the reference's plot views.

The reference shows live Qt plots: the equalized constellation, the
signal spectrum, and the P1 correlation (plot.cpp / main_window.cpp:
416-476).  This framework exports the same data with
``dvbt2-rx --dump-constellation out.npz``; this tool renders that NPZ to
a figure (PNG, or an interactive window with --show).

Usage:
  python tools/plot_dumps.py out.npz [-o out.png] [--show]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

# one hue per panel (single series each: no legend, titles carry identity)
_DATA = "#2f6fde"          # data marks
_GRID = "#d9dde3"          # recessive grid
_INK = "#30343a"           # text/axes


def render(npz_path: str, out: str | None, show: bool) -> int:
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = np.load(npz_path)
    fig, axs = plt.subplots(2, 2, figsize=(11, 8.5))
    fig.suptitle(f"DVB-T2 receiver diagnostics — {npz_path}", color=_INK)

    for ax in axs.flat:
        ax.grid(True, color=_GRID, linewidth=0.8)
        ax.set_axisbelow(True)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(_GRID)
        ax.tick_params(colors=_INK, labelsize=8)

    # equalized constellation (reference: constellation view)
    ax = axs[0, 0]
    c = np.asarray(z["constellation"]).ravel()
    n = min(len(c), 50000)
    ax.plot(c[:n].real, c[:n].imag, ".", color=_DATA, markersize=2,
            alpha=0.25, rasterized=True)
    ax.set_title("Equalized constellation", color=_INK, fontsize=10)
    ax.set_aspect("equal")
    lim = 1.6 * np.median(np.abs(c[:n])) * 1.6
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)

    # spectrum (reference: spectrograph view)
    ax = axs[0, 1]
    spec = np.asarray(z["spectrum"])
    mag = 20 * np.log10(np.maximum(np.abs(spec), 1e-12))
    mag -= mag.max()
    f = np.linspace(-0.5, 0.5, len(mag), endpoint=False)
    ax.plot(f, mag, color=_DATA, linewidth=0.7)
    ax.set_title("Spectrum (first OFDM symbol)", color=_INK, fontsize=10)
    ax.set_xlabel("frequency (x elementary rate)", color=_INK, fontsize=8)
    ax.set_ylabel("dB rel. peak", color=_INK, fontsize=8)
    ax.set_ylim(max(-80, mag.min() - 5), 3)

    # P1 correlation metric (reference: P1 sync view)
    ax = axs[1, 0]
    m = np.asarray(z["p1_metric"]).ravel()
    ax.plot(np.arange(len(m)), m, color=_DATA, linewidth=1.2)
    pk = int(np.argmax(m))
    ax.plot([pk], [m[pk]], "o", color=_DATA, markersize=5,
            markeredgecolor="white", markeredgewidth=1.0)
    ax.annotate(f"peak @ {pk}", (pk, m[pk]), textcoords="offset points",
                xytext=(6, 4), color=_INK, fontsize=8)
    ax.set_title("P1 correlation", color=_INK, fontsize=10)
    ax.set_xlabel("sample", color=_INK, fontsize=8)

    # time-domain level (reference: oscilloscope view)
    ax = axs[1, 1]
    iq = np.asarray(z["frame_iq"]).ravel()
    n = min(len(iq), 40000)
    ax.plot(np.arange(n), np.abs(iq[:n]), color=_DATA, linewidth=0.5,
            alpha=0.8, rasterized=True)
    ax.set_title("Signal level |IQ|", color=_INK, fontsize=10)
    ax.set_xlabel("elementary sample", color=_INK, fontsize=8)

    fig.tight_layout(rect=(0, 0, 1, 0.96))
    if out:
        fig.savefig(out, dpi=130)
        print(f"wrote {out}", file=sys.stderr)
    if show:
        plt.show()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("npz", help="NPZ from dvbt2-rx --dump-constellation")
    p.add_argument("-o", "--out", default=None,
                   help="output image path (default: <npz>.png)")
    p.add_argument("--show", action="store_true",
                   help="open an interactive window instead")
    args = p.parse_args(argv)
    out = args.out
    if out is None and not args.show:
        out = args.npz.rsplit(".", 1)[0] + ".png"
    return render(args.npz, out, args.show)


if __name__ == "__main__":
    sys.exit(main())
