#!/usr/bin/env python3
"""Generate a reference-compatible DVB-T2 raw IQ capture (golden vectors).

Modulates a synthetic (or user-supplied) transport stream with the EN 302
755 transmit fixture, applies SDR-like impairments and writes a
``*_<rate>_<8|16|fc>.raw`` file the receiver CLI (and the reference
application's rx_raw player) can consume.

Example:
  python tools/make_capture.py out/capture --frames 20 --fft 32k \
      --constellation qam256 --rate 2_3 --cfo 25e3 --snr 28 --format 8
  python -m sdr_receiver_dvb_t2_tpu --input out/capture_10000000_8.raw \
      --out udp://127.0.0.1:7654
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter, TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import (ChannelConfig, impair,
                                                    quantize)
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)

FFT = {"1k": FftMode.FFT_1K, "2k": FftMode.FFT_2K, "4k": FftMode.FFT_4K,
       "8k": FftMode.FFT_8K, "16k": FftMode.FFT_16K, "32k": FftMode.FFT_32K}
GI = {"1_128": GuardInterval.G1_128, "1_32": GuardInterval.G1_32,
      "1_16": GuardInterval.G1_16, "19_256": GuardInterval.G19_256,
      "1_8": GuardInterval.G1_8, "19_128": GuardInterval.G19_128,
      "1_4": GuardInterval.G1_4}
CONST = {"qpsk": Constellation.QPSK, "qam16": Constellation.QAM16,
         "qam64": Constellation.QAM64, "qam256": Constellation.QAM256}
RATE = {"1_2": CodeRate.C1_2, "3_5": CodeRate.C3_5, "2_3": CodeRate.C2_3,
        "3_4": CodeRate.C3_4, "4_5": CodeRate.C4_5, "5_6": CodeRate.C5_6}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("prefix", help="output path prefix")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--fft", choices=FFT, default="2k")
    p.add_argument("--gi", choices=GI, default="1_8")
    p.add_argument("--pp", type=int, default=7, help="pilot pattern 1-8")
    p.add_argument("--extended", action="store_true")
    p.add_argument("--data-symbols", type=int, default=30)
    p.add_argument("--constellation", choices=CONST, default="qam16")
    p.add_argument("--rate", choices=RATE, default="1_2")
    p.add_argument("--fec", choices=["short", "normal"], default="short")
    p.add_argument("--fec-blocks", type=int, default=4)
    p.add_argument("--no-rotation", action="store_true")
    p.add_argument("--ts", default=None, help="TS file to carry (default: "
                                              "synthetic packets)")
    p.add_argument("--device-rate", type=float, default=10e6)
    p.add_argument("--cfo", type=float, default=0.0, help="Hz")
    p.add_argument("--sro", type=float, default=0.0, help="ppm")
    p.add_argument("--snr", type=float, default=None, help="dB (None=clean)")
    p.add_argument("--format", choices=["8", "16", "fc"], default="8")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    mode = T2Mode(fft_mode=FFT[args.fft], guard=GI[args.gi],
                  pilot_pattern=PilotPattern(args.pp - 1),
                  extended_carriers=args.extended,
                  n_data_symbols=args.data_symbols)
    plp = PlpConfig(constellation=CONST[args.constellation],
                    code_rate=RATE[args.rate],
                    fec_frame=(FecFrame.SHORT if args.fec == "short"
                               else FecFrame.NORMAL),
                    rotation=not args.no_rotation,
                    num_blocks_max=max(args.fec_blocks, 10),
                    time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp,
                              fec_blocks_per_frame=args.fec_blocks,
                              num_t2_frames=args.frames))
    if args.ts:
        ts = np.fromfile(args.ts, dtype=np.uint8)
    else:
        bytes_per_frame = args.fec_blocks * (plp.k_bch // 8 - 10)
        ts = random_ts_stream((args.frames + 2) * bytes_per_frame // 188,
                              seed=args.seed)
    iq = tx.modulate(ts)
    n_frames = len(iq) // mode.frame_samples
    print(f"modulated {n_frames} frames ({len(iq)} samples at 64/7 Msps)",
          file=sys.stderr)

    dev = impair(iq, ChannelConfig(device_rate=args.device_rate,
                                   cfo_hz=args.cfo, sro_ppm=args.sro,
                                   snr_db=args.snr, seed=args.seed))
    raw = quantize(dev, {"8": "u8", "16": "s16", "fc": "f32"}[args.format],
                   scale=0.4)
    out = f"{args.prefix}_{int(args.device_rate)}_{args.format}.raw"
    raw.tofile(out)
    ts_out = f"{args.prefix}.ts"
    ts.tofile(ts_out)
    print(f"wrote {out} ({len(dev)} IQ samples @ "
          f"{args.device_rate/1e6:.1f} Msps) and {ts_out} (payload)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
