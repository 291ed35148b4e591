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
