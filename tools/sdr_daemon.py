#!/usr/bin/env python3
"""SDR bridge daemon: any IQ producer -> UDP datagrams + gain control.

The TPU receiver host has no USB SDR drivers in-process (PARITY.md); this
daemon runs next to the hardware and bridges it over the network, making
the live-SDR path of the reference (rx_hackrf.cpp:117-221, rx_usrp.cpp:
75-196 — device callback into ring buffer, gain slots) real for the
framework:

* IQ transport: raw sample bytes in UDP datagrams to --dest (the
  receiver's io.sources.UdpIqSource / RemoteSdrSource).
* producers: --cmd "rtl_sdr -f 650000000 -s 10000000 -g {gain} -" (any CLI
  writing raw IQ to stdout; restarted when the gain changes if the command
  templates {gain}), or --file capture playback (gain applied digitally,
  which exercises the same AGC control path end to end).
* transport framing: every datagram carries a 16-byte header
  (magic 'IQSQ', u32 sequence, u64 cumulative byte offset) so the
  receiver can DETECT and ZERO-FILL drops instead of silently
  mis-aligning the byte stream (io.sources.UdpIqSource seq mode).
* control: TCP line protocol on --control-port serving the rx_interface
  gain/retune contract (runtime/agc.py + runtime/stream.py drive it):
      INFO               -> INFO <rate> <fmt> <gain_min> <gain_max> <gain>
                            SEQ1 FREQ <hz>
      GAIN <db>          -> OK <applied_db>
      BIASTEE <0|1>      -> OK
      FREQ <hz>          -> OK <applied_hz>   (hardware retune: --cmd
                            producers restart with {freq}; file playback
                            applies the equivalent digital mix, i.e. the
                            baseband shifts by -(hz - previous) like a
                            real tuner step; reference rx_base.cpp:146-152)

Example (loopback test):
  python tools/sdr_daemon.py --file cap_10000000_8.raw --dest 127.0.0.1:4950 \
      --control-port 4951 --pace 2.0 --loop
"""
from __future__ import annotations

import argparse
import shlex
import socket
import struct
import subprocess
import sys
import threading
import time

import numpy as np

CHUNK = 32768            # bytes per datagram (multiple of every pair size)

_FMT_DTYPE = {"u8": np.uint8, "s8": np.int8, "s16": np.int16,
              "f32": np.float32}

# Known-good producer recipes per device class (--device NAME), covering
# the reference's six vendor front ends (rates and gain spans mirror
# rx_hackrf.cpp:117-221, rx_airspy.cpp, rx_sdrplay.cpp:153, rx_miri.cpp,
# rx_usrp.cpp:75-196, rx_plutosdr.cpp; SdrPlay/Miri/USRP/Pluto go through
# the SoapySDR-based `rx_sdr` from rx_tools).  Templates: {freq} Hz,
# {freq_mhz} MHz, {gain} dB, {biastee} 0/1.  Everything a preset sets can
# be overridden on the command line (--cmd/--rate/--fmt/--gain-*).
DEVICE_PRESETS = {
    "hackrf": dict(
        cmd="hackrf_transfer -r - -f {freq} -s 10000000 -b 8000000"
            " -l {gain:.0f} -g 20 -p {biastee}",
        fmt="s8", rate=10e6, gain_min=0.0, gain_max=40.0),
    "airspy": dict(
        cmd="airspy_rx -r /dev/stdout -f {freq_mhz} -a 10000000 -t 2"
            " -g {gain:.0f} -b {biastee}",
        fmt="s16", rate=10e6, gain_min=0.0, gain_max=21.0),
    "sdrplay": dict(
        cmd="rx_sdr -d driver=sdrplay -f {freq} -s 10000000 -g {gain}"
            " -F CS16 -",
        fmt="s16", rate=10e6, gain_min=0.0, gain_max=48.0),
    "miri": dict(
        cmd="rx_sdr -d driver=miri -f {freq} -s 9000000 -g {gain}"
            " -F CS16 -",
        fmt="s16", rate=9e6, gain_min=0.0, gain_max=49.0),
    "usrp": dict(
        cmd="rx_sdr -d driver=uhd -f {freq} -s 10000000 -g {gain}"
            " -F CS16 -",
        fmt="s16", rate=10e6, gain_min=0.0, gain_max=76.0),
    "plutosdr": dict(
        cmd="rx_sdr -d driver=plutosdr -f {freq} -s 10000000 -g {gain}"
            " -F CS16 -",
        fmt="s16", rate=10e6, gain_min=0.0, gain_max=73.0),
    # beyond the reference: the most common hobbyist front end
    "rtlsdr": dict(
        cmd="rtl_sdr -f {freq} -s 2400000 -g {gain} -",
        fmt="u8", rate=2.4e6, gain_min=0.0, gain_max=49.6),
}

SEQ_MAGIC = b"IQSQ"      # 16-byte datagram header: magic, u32 seq, u64 off
_SEQ_HDR = struct.Struct("<4sIQ")


class SeqSocket:
    """UDP sender stamping each datagram with (seq, byte offset)."""

    def __init__(self, sock, dest):
        self._sock, self._dest = sock, dest
        self._seq = 0
        self._off = 0

    def send(self, payload: bytes):
        hdr = _SEQ_HDR.pack(SEQ_MAGIC, self._seq & 0xFFFFFFFF, self._off)
        self._sock.sendto(hdr + payload, self._dest)
        self._seq += 1
        self._off += len(payload)


class GainState:
    def __init__(self, gain, lo, hi):
        self.lock = threading.Lock()
        self.gain = float(gain)
        self.lo, self.hi = float(lo), float(hi)
        self.biastee = False
        self.changed = threading.Event()
        self.freq = 0.0          # tuner center (Hz); 0 = never tuned
        self.freq_changed = threading.Event()

    def set(self, db: float) -> float:
        with self.lock:
            self.gain = float(np.clip(db, self.lo, self.hi))
            self.changed.set()
            return self.gain

    def set_freq(self, hz: float) -> float:
        with self.lock:
            self.freq = float(hz)
            self.freq_changed.set()
            self.changed.set()       # --cmd producers restart on {freq} too
            return self.freq


def control_server(port: int, rate: float, fmt: str, g: GainState,
                   stop: threading.Event):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("0.0.0.0", port))
    srv.listen(4)
    srv.settimeout(0.5)
    while not stop.is_set():
        try:
            conn, _ = srv.accept()
        except socket.timeout:
            continue
        with conn:
            f = conn.makefile("rw")
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                cmd = parts[0].upper()
                if cmd == "INFO":
                    f.write(f"INFO {rate} {fmt} {g.lo} {g.hi} {g.gain} "
                            f"SEQ1 FREQ {g.freq}\n")
                elif cmd == "GAIN" and len(parts) > 1:
                    f.write(f"OK {g.set(float(parts[1]))}\n")
                elif cmd == "FREQ" and len(parts) > 1:
                    f.write(f"OK {g.set_freq(float(parts[1]))}\n")
                elif cmd == "BIASTEE" and len(parts) > 1:
                    g.biastee = bool(int(parts[1]))
                    f.write("OK\n")
                elif cmd == "QUIT":
                    f.write("OK\n")
                    f.flush()
                    break
                else:
                    f.write("ERR\n")
                f.flush()
    srv.close()


def stream_file(path: str, fmt: str, rate: float, out: SeqSocket,
                g: GainState, stop: threading.Event, loop: bool,
                pace: float):
    """File playback with DIGITAL gain and retune.

    Gain is applied relative to the initial gain; a FREQ retune applies
    the mix a real tuner step would: moving the center UP by df shifts
    every baseband component DOWN by df (phase-continuous across
    chunks), so a capture with a +df CFO retuned by +df lands at DC.
    """
    dtype = _FMT_DTYPE[fmt]
    g0, f0 = g.gain, g.freq
    bytes_per_s = 2 * rate * np.dtype(dtype).itemsize
    f = open(path, "rb")
    t0, sent = time.monotonic(), 0
    phase = 0.0                    # accumulated mix phase (radians)
    while not stop.is_set():
        buf = f.read(CHUNK)
        if len(buf) < CHUNK:
            if not loop:
                break
            f.seek(0)
            buf += f.read(CHUNK - len(buf))
        scale = 10.0 ** ((g.gain - g0) / 20.0)
        df = g.freq - f0
        if abs(scale - 1.0) > 1e-6 or abs(df) > 1e-9:
            x = np.frombuffer(buf, dtype=dtype).astype(np.float32)
            if fmt == "u8":
                x = x - 127.5
            z = (x[0::2] + 1j * x[1::2]).astype(np.complex64)
            if abs(df) > 1e-9:
                n = len(z)
                w = -2.0 * np.pi * df / rate
                z = z * np.exp(1j * (phase + w * np.arange(n))
                               ).astype(np.complex64)
                phase = float((phase + w * n) % (2.0 * np.pi))
            z *= scale
            x = np.empty(2 * len(z), np.float32)
            x[0::2], x[1::2] = z.real, z.imag
            if fmt == "u8":
                buf = np.clip(np.round(x + 127.5), 0, 255
                              ).astype(np.uint8).tobytes()
            elif fmt in ("s8", "s16"):
                lim = 127 if fmt == "s8" else 32767
                buf = np.clip(np.round(x), -lim - 1, lim
                              ).astype(dtype).tobytes()
            else:
                buf = x.astype(np.float32).tobytes()
        out.send(buf)
        sent += len(buf)
        if pace > 0:
            ahead = sent / (bytes_per_s * pace) - (time.monotonic() - t0)
            if ahead > 0.002:
                time.sleep(ahead)
    f.close()


def stream_cmd(cmd: str, out: SeqSocket, g: GainState,
               stop: threading.Event):
    """Spawn the SDR CLI; restart it when {gain}/{biastee}/{freq}
    change (the hardware-retune path: the CLI re-opens the tuner at the
    new center, its own settle applies)."""
    while not stop.is_set():
        g.changed.clear()
        argv = shlex.split(cmd.format(gain=g.gain,
                                      biastee=int(g.biastee),
                                      freq=int(g.freq),
                                      freq_mhz=g.freq / 1e6))
        proc = subprocess.Popen(argv, stdout=subprocess.PIPE)
        restart = any(k in cmd for k in ("{gain", "{biastee", "{freq"))
        try:
            while not stop.is_set():
                if restart and g.changed.is_set():
                    break
                buf = proc.stdout.read(CHUNK)
                if not buf:
                    return
                out.send(buf)
        finally:
            proc.terminate()
            proc.wait(timeout=2.0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--file", help="raw IQ capture to play back")
    src.add_argument("--cmd", help="SDR CLI writing raw IQ to stdout; may "
                                   "template {gain} {biastee} {freq} "
                                   "{freq_mhz}")
    src.add_argument("--device", choices=sorted(DEVICE_PRESETS),
                     help="use a known-good vendor recipe "
                          "(sets --cmd/--rate/--fmt/--gain-min/--gain-max)")
    p.add_argument("--dest", required=True, help="receiver host:port (UDP)")
    p.add_argument("--control-port", type=int, required=True)
    p.add_argument("--rate", type=float, default=None,
                   help="sample rate in Hz (from the filename if omitted)")
    p.add_argument("--fmt", choices=list(_FMT_DTYPE), default=None)
    p.add_argument("--gain", type=float, default=24.0)
    p.add_argument("--freq", type=float, default=0.0,
                   help="initial tuner center frequency in Hz")
    p.add_argument("--gain-min", type=float, default=None)
    p.add_argument("--gain-max", type=float, default=None)
    p.add_argument("--loop", action="store_true")
    p.add_argument("--pace", type=float, default=1.0,
                   help="file playback speed multiple (0 = unpaced)")
    p.add_argument("--duration", type=float, default=None,
                   help="stop after this many seconds")
    args = p.parse_args(argv)

    rate, fmt = args.rate, args.fmt
    if args.device:
        pre = DEVICE_PRESETS[args.device]
        args.cmd = pre["cmd"]
        rate = rate if rate is not None else pre["rate"]
        fmt = fmt or pre["fmt"]
        if args.gain_min is None:
            args.gain_min = pre["gain_min"]
        if args.gain_max is None:
            args.gain_max = pre["gain_max"]
    if args.gain_min is None:
        args.gain_min = 0.0
    if args.gain_max is None:
        args.gain_max = 49.0
    args.gain = float(np.clip(args.gain, args.gain_min, args.gain_max))
    if args.file and (rate is None or fmt is None):
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent.parent))
        from sdr_receiver_dvb_t2_tpu.io.sources import parse_raw_filename
        rate_f, fmt_f = parse_raw_filename(args.file)
        rate, fmt = rate or rate_f, fmt or fmt_f
    if rate is None or fmt is None:
        p.error("--rate and --fmt are required with --cmd")

    host, _, port = args.dest.rpartition(":")
    dest = (host or "127.0.0.1", int(port))
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    g = GainState(args.gain, args.gain_min, args.gain_max)
    g.freq = args.freq
    out = SeqSocket(sock, dest)
    stop = threading.Event()
    ctl = threading.Thread(target=control_server,
                           args=(args.control_port, rate, fmt, g, stop),
                           daemon=True)
    ctl.start()
    if args.duration:
        threading.Timer(args.duration, stop.set).start()
    try:
        if args.file:
            stream_file(args.file, fmt, rate, out, g, stop,
                        args.loop, args.pace)
        else:
            stream_cmd(args.cmd, out, g, stop)
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
    return 0


if __name__ == "__main__":
    sys.exit(main())
