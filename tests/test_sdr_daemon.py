"""Live-SDR path loopback: sdr_daemon bridge -> UDP IQ -> RemoteSdrSource
-> ThreadedSource ingest -> blind acquisition -> TS, with the AGC driving
the daemon's gain over the control channel.

This is the deployment shape for real hardware (the daemon wraps an SDR
CLI next to the device; here it plays a capture file with digital gain so
the identical control path is exercised without hardware).  Reference
analogue: rx_hackrf.cpp:117-221 (callback ingest + gain slots).
"""
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import sources, sinks, native
from sdr_receiver_dvb_t2_tpu.models.channel import ChannelConfig, impair, quantize
from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter, TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)
from sdr_receiver_dvb_t2_tpu.runtime import stream as stream_mod

DAEMON = Path(__file__).resolve().parent.parent / "tools" / "sdr_daemon.py"


def test_udp_seq_framing_zero_fills_gaps():
    """Transport drop-evidence (round-2 weak #2): framed datagrams with a
    missing sequence element must zero-fill the exact byte count and
    count the gap, keeping every later byte aligned."""
    import struct
    hdr = struct.Struct("<4sIQ")
    port = _free_ports(1)[0]
    src = sources.UdpIqSource(port, 1e6, fmt="u8", host="127.0.0.1",
                              timeout=2.0, seq=True)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payloads = [bytes([10 + i]) * 1000 for i in range(5)]
    off = 0
    for i, p in enumerate(payloads):
        if i != 2:            # datagram 2 is "lost"
            tx.sendto(hdr.pack(b"IQSQ", i, off) + p, ("127.0.0.1", port))
        off += len(p)
    got = src.read(2500)      # 5000 bytes = all five payload slots
    assert got is not None and len(got) == 5000
    exp = bytearray()
    for i, p in enumerate(payloads):
        exp += b"\x80" * len(p) if i == 2 else p
    assert bytes(got.tobytes()) == bytes(exp)
    assert src.gap_events == 1 and src.gap_bytes == 1000
    # a late duplicate of an already-consumed offset is dropped, counted
    tx.sendto(hdr.pack(b"IQSQ", 1, 1000) + payloads[1], ("127.0.0.1", port))
    tx.sendto(hdr.pack(b"IQSQ", 5, off) + b"\x07" * 1000, ("127.0.0.1", port))
    got2 = src.read(500)
    assert bytes(got2.tobytes()) == b"\x07" * 1000
    assert src.reordered == 1
    tx.close()
    src.close()


def _free_ports(n):
    socks = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def _make_capture(tmp_path, n_frames=10):
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=n_frames))
    n_pkts = (n_frames + 2) * 4 * (plp.k_bch // 8 - 10) // 188
    ts = random_ts_stream(n_pkts, seed=21)
    dev = impair(tx.modulate(ts), ChannelConfig(device_rate=10e6,
                                                cfo_hz=8e3, snr_db=28.0,
                                                seed=5))
    path = tmp_path / "cap_live_0_10000000_8.raw"
    raw = quantize(dev, "u8", scale=0.4)
    raw.tofile(path)
    level = float(np.mean(np.abs(raw.astype(np.float32) - 127.5)) / 128 * 2)
    return str(path), ts, mode, level


def _load_daemon_module():
    import importlib.util
    spec = importlib.util.spec_from_file_location("sdr_daemon", DAEMON)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# stand-in vendor CLI: logs its argv, honors `-r <path>` output redirection
# (hackrf_transfer/airspy_rx style), then streams bytes until killed
_VENDOR_STUB = """#!/usr/bin/env python3
import os, sys, time
with open(os.environ["SDR_STUB_LOG"], "a") as f:
    f.write(" ".join(sys.argv) + chr(10))
out = sys.stdout.buffer
if "-r" in sys.argv:
    tgt = sys.argv[sys.argv.index("-r") + 1]
    if tgt != "-":
        out = open(tgt, "wb")
block = bytes(range(256)) * 64
while True:
    try:
        out.write(block)
        out.flush()
    except (BrokenPipeError, OSError):
        break
    time.sleep(0.005)
"""


def test_device_presets_format_cleanly():
    """Every preset template must format with the daemon's substitution set
    and lead with the documented vendor binary."""
    mod = _load_daemon_module()
    binaries = {"hackrf": "hackrf_transfer", "airspy": "airspy_rx",
                "rtlsdr": "rtl_sdr", "sdrplay": "rx_sdr", "miri": "rx_sdr",
                "usrp": "rx_sdr", "plutosdr": "rx_sdr"}
    assert set(binaries) == set(mod.DEVICE_PRESETS)
    for name, pre in mod.DEVICE_PRESETS.items():
        line = pre["cmd"].format(gain=12.5, biastee=1, freq=650000000,
                                 freq_mhz=650.0)
        assert line.split()[0] == binaries[name]
        assert "{" not in line, line
        assert pre["fmt"] in ("u8", "s8", "s16") and pre["rate"] > 0
        assert pre["gain_min"] < pre["gain_max"]


@pytest.mark.parametrize("device", ["hackrf", "airspy", "sdrplay", "miri",
                                    "usrp", "plutosdr", "rtlsdr"])
def test_device_preset_invocation(tmp_path, device):
    """Each vendor recipe, driven end to end against a stand-in CLI: the
    daemon must spawn the exact templated command, stream its bytes with
    seq framing, report the preset's rate/fmt/gain span over control, and
    restart the producer with the new {gain}/{freq} on GAIN/FREQ."""
    import os
    mod = _load_daemon_module()
    pre = mod.DEVICE_PRESETS[device]
    binary = pre["cmd"].split()[0]
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / binary
    stub.write_text(_VENDOR_STUB)
    stub.chmod(0o755)
    log = tmp_path / "argv.log"
    log.touch()
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}",
               SDR_STUB_LOG=str(log))
    data_port, ctl_port = _free_ports(2)
    daemon = subprocess.Popen(
        [sys.executable, str(DAEMON), "--device", device,
         "--dest", f"127.0.0.1:{data_port}", "--control-port", str(ctl_port),
         "--gain", "20", "--freq", "650000000", "--duration", "60"],
        env=env)
    try:
        deadline = time.monotonic() + 10
        src = None
        while src is None:
            try:
                src = sources.RemoteSdrSource(data_port, "127.0.0.1",
                                              ctl_port, timeout=10.0)
            except (ConnectionRefusedError, OSError):
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        assert src.info.sample_rate == pre["rate"]
        assert src.info.fmt == pre["fmt"]
        assert src.gain_min() == pre["gain_min"]
        assert src.gain_max() == pre["gain_max"]
        assert src.center_freq_hz == 650000000.0
        got = src.read(4096)
        assert got is not None and got.size >= 4096

        first = log.read_text().strip().splitlines()
        assert len(first) >= 1
        expect0 = pre["cmd"].format(gain=20.0, biastee=0, freq=650000000,
                                    freq_mhz=650.0)
        assert first[0].split()[1:] == expect0.split()[1:], first[0]

        g1 = src.set_gain_db(pre["gain_min"] + 1.0)
        f1 = src.set_center_freq(666000000)
        assert f1 == 666000000.0
        deadline = time.monotonic() + 20   # generous: CI may be loaded
        while time.monotonic() < deadline:
            lines = log.read_text().strip().splitlines()
            if len(lines) >= 2 and "666" in lines[-1]:
                break
            time.sleep(0.1)
        expect1 = pre["cmd"].format(gain=g1, biastee=0, freq=666000000,
                                    freq_mhz=666.0)
        assert lines[-1].split()[1:] == expect1.split()[1:], lines[-1]
    finally:
        daemon.terminate()
        daemon.wait(timeout=5)


@pytest.mark.slow
@pytest.mark.skipif(native.load() is None, reason="no C++ toolchain")
def test_live_sdr_loopback_with_agc(tmp_path):
    path, ts_in, mode, level0 = _make_capture(tmp_path)
    data_port, ctl_port = _free_ports(2)

    # pick the gain range so the Agc's initial midpoint sits ~5 dB below
    # its level window (runtime/agc.py: 0.08): the loop must then step the
    # daemon's gain UP through the control channel to restore the level
    g0 = 30.0
    mid = g0 + 20 * np.log10(0.045 / level0)
    daemon = subprocess.Popen(
        [sys.executable, str(DAEMON), "--file", path, "--loop",
         "--dest", f"127.0.0.1:{data_port}", "--control-port", str(ctl_port),
         "--gain", str(g0), "--gain-min", str(2 * mid - g0),
         "--gain-max", str(g0), "--pace", "0.5", "--duration", "600"])
    try:
        deadline = time.monotonic() + 10
        src = None
        while src is None:
            try:
                src = sources.RemoteSdrSource(data_port, "127.0.0.1",
                                              ctl_port, timeout=60.0)
            except (ConnectionRefusedError, OSError):
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        assert src.info.sample_rate == 10e6 and src.info.fmt == "u8"
        assert src.gain_max() == g0

        threaded = sources.ThreadedSource(src, block_samples=1 << 15)
        sink = sinks.BufferTsSink()
        cfg = stream_mod.StreamConfig(frames_per_batch=1,
                                      acq_elem_samples=3 * mode.frame_samples,
                                      n_up_block=1 << 17,
                                      use_pallas=False)
        rx = stream_mod.StreamingReceiver(threaded, sink, cfg)
        assert rx.agc.enabled, "AGC must be live through the threaded source"
        gain_at_start = rx.agc.gain_db          # the mid-range initial gain
        assert abs(gain_at_start - mid) < 0.5
        # drain IQ buffered BEFORE the Agc's initial gain-down reached the
        # daemon (it would read as over-level and walk the gain the wrong
        # way first — on real hardware the gain change is near-immediate)
        time.sleep(0.5)
        while threaded.ring.fill:
            threaded.ring.pop(threaded.ring.fill)
        stats = rx.run(max_frames=20)

        assert stats.state == "locked", stats
        assert stats.frames >= 20
        # the AGC must have raised the daemon's gain toward the window
        assert rx.agc.gain_db >= gain_at_start + 2.0, rx.agc.gain_db
        assert src.gain_db == rx.agc.gain_db     # daemon acknowledged it
        # hardware retune: the 8 kHz CFO exceeds one 2K carrier spacing
        # (~4.5 kHz), so acquisition must have pushed it into the daemon's
        # tuner, leaving the NCO with only the residual
        assert src.center_freq_hz is not None
        assert 6500 < src.center_freq_hz < 9500, src.center_freq_hz
        residual_hz = rx.freq * src.info.sample_rate / (2 * np.pi)
        assert abs(residual_hz) < 4464, residual_hz
        # the TAIL of the decoded TS must match the transmitted stream.
        # The transport is now drop-evident (seq framing): when no gaps
        # were flagged the match must be exact; when datagrams were lost
        # under CI load the zero-fill keeps alignment, so the tail still
        # has to match packet-wise outside the flagged-dirty region.
        got, sync = sink.data.tobytes(), ts_in.tobytes()
        assert len(got) > 188 * 30
        tail = got[-188 * 20:]
        idx = sync.find(tail[:376])
        assert idx >= 0, "tail of recovered TS not found in input"
        expect = sync[idx:idx + len(tail)]
        if threaded.gap_bytes == 0:
            assert tail == expect
        else:
            pkts_ok = sum(tail[k:k + 188] == expect[k:k + 188]
                          for k in range(0, len(tail), 188))
            assert pkts_ok >= 12, (pkts_ok, threaded.gap_bytes)
    finally:
        daemon.terminate()
        daemon.wait(timeout=5)
