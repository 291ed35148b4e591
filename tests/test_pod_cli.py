"""Pod deployment surface (VERDICT round-3 next #6): the CLI entry
`dvbt2-rx --pod channels.toml` drives N channels end-to-end — per-channel
capture files, blind acquisition, mesh decode, per-channel TS sinks and
stats lines."""
import time

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu import cli
from sdr_receiver_dvb_t2_tpu.models.transmitter import (Transmitter,
                                                        TxConfig,
                                                        random_ts_stream)
from sdr_receiver_dvb_t2_tpu.models.channel import (ChannelConfig, impair,
                                                    quantize)
from sdr_receiver_dvb_t2_tpu.params.modes import (
    T2Mode, PlpConfig, FftMode, GuardInterval, PilotPattern, Constellation,
    CodeRate, FecFrame)


@pytest.mark.slow
def test_pod_cli_four_channels(tmp_path, capfd):
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=6))
    ts = random_ts_stream(7 * 4 * (plp.k_bch // 8 - 10) // 188, seed=3)
    iq = tx.modulate(ts)

    lines = []
    rng = np.random.default_rng(5)
    for c in range(4):
        dev = impair(iq, ChannelConfig(device_rate=10_000_000,
                                       cfo_hz=float(rng.uniform(-5e3, 5e3)),
                                       snr_db=29.0, seed=c))
        off = int(rng.integers(300, 2000))
        dev = np.concatenate([np.zeros(off, np.complex64), dev])
        path = tmp_path / f"ch{c}_dvbt2_0_10000000_8.raw"
        quantize(dev, "u8", scale=0.4).tofile(path)
        out = tmp_path / f"ch{c}.ts"
        lines.append(f"[[channel]]\ninput = \"{path}\"\nout = \"{out}\"\n")

    toml = tmp_path / "channels.toml"
    toml.write_text("track = true\ntrack_l1 = true\nrelock = false\n"
                    "max_steps = 2\nmesh = [4, 1]\n" + "\n".join(lines))
    rc = cli.main(["--pod", str(toml), "--cpu"])
    assert rc == 0
    err = capfd.readouterr().err
    assert "pod config: 2K FFT" in err
    for c in range(4):
        assert f"ch{c}:" in err
        got = (tmp_path / f"ch{c}.ts").read_bytes()
        assert len(got) >= 188 * 20, (c, len(got))
        sync = ts.tobytes()
        at = sync.find(got[:376])
        assert at >= 0, f"ch{c} TS not in transmitted stream"
        n = min(len(got), len(sync) - at)
        assert got[:n] == sync[at:at + n], f"ch{c}"


@pytest.mark.slow
def test_pod_cli_plp_all_with_monitor(tmp_path, capfd):
    """plp = "all" in the pod TOML (ADVICE r4 #1): every PLP of the mux
    decodes to its own per-channel sink (UDP port+i / file -plp<id>),
    and monitor = SECS renders the per-channel pod panel in-run."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp_a = PlpConfig(constellation=Constellation.QAM16, plp_id=0,
                      code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                      rotation=True, time_il_length=1)
    plp_b = PlpConfig(constellation=Constellation.QAM64, plp_id=1,
                      code_rate=CodeRate.C2_3, fec_frame=FecFrame.SHORT,
                      rotation=False, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plps=[plp_a, plp_b],
                              fec_blocks=[3, 4], num_t2_frames=6))
    ts_a = random_ts_stream(7 * 3 * (plp_a.k_bch // 8 - 10) // 188, seed=1)
    ts_b = random_ts_stream(7 * 4 * (plp_b.k_bch // 8 - 10) // 188, seed=2)
    iq = tx.modulate_multi([ts_a, ts_b])

    lines = []
    rng = np.random.default_rng(7)
    for c in range(2):
        dev = impair(iq, ChannelConfig(device_rate=10_000_000,
                                       snr_db=29.0, seed=c))
        off = int(rng.integers(300, 2000))
        dev = np.concatenate([np.zeros(off, np.complex64), dev])
        path = tmp_path / f"ch{c}_dvbt2_0_10000000_8.raw"
        quantize(dev, "u8", scale=0.4).tofile(path)
        out = tmp_path / f"ch{c}.ts"
        lines.append(f"[[channel]]\ninput = \"{path}\"\nout = \"{out}\"\n")

    toml = tmp_path / "channels.toml"
    toml.write_text("plp = \"all\"\nrelock = false\nmax_steps = 2\n"
                    "monitor = 0.01\nmesh = [2, 1]\n" + "\n".join(lines))
    rc = cli.main(["--pod", str(toml), "--cpu"])
    assert rc == 0
    err = capfd.readouterr().err
    assert "pod monitor" in err and "ch state" in err
    for c in range(2):
        for plp_id, ts in ((0, ts_a), (1, ts_b)):
            got = (tmp_path / f"ch{c}-plp{plp_id}.ts").read_bytes()
            assert len(got) >= 188 * 10, (c, plp_id, len(got))
            sync = ts.tobytes()
            at = sync.find(got[:376])
            assert at >= 0, f"ch{c} plp{plp_id} TS not in stream"
            n = min(len(got), len(sync) - at)
            assert got[:n] == sync[at:at + n], (c, plp_id)


@pytest.mark.slow
def test_pod_cli_live_channel_store(tmp_path, capfd):
    """live = true streams the captures chunk-wise through a pooled
    ChannelStore (bounded memory on endless feeds — the 24/7 path)
    instead of loading them whole: blind acquisition on the recorded
    head, absolute-position streaming, same TS-exact output."""
    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=6))
    ts = random_ts_stream(7 * 4 * (plp.k_bch // 8 - 10) // 188, seed=13)
    iq = tx.modulate(ts)

    lines = []
    rng = np.random.default_rng(7)
    for c in range(2):
        dev = impair(iq, ChannelConfig(device_rate=10_000_000,
                                       cfo_hz=float(rng.uniform(-4e3, 4e3)),
                                       snr_db=29.0, seed=10 + c))
        off = int(rng.integers(300, 2000))
        dev = np.concatenate([np.zeros(off, np.complex64), dev])
        path = tmp_path / f"ch{c}_dvbt2_0_10000000_8.raw"
        quantize(dev, "u8", scale=0.4).tofile(path)
        out = tmp_path / f"ch{c}.ts"
        lines.append(f"[[channel]]\ninput = \"{path}\"\nout = \"{out}\"\n")

    toml = tmp_path / "channels.toml"
    toml.write_text("track = true\ntrack_l1 = true\nrelock = false\n"
                    "live = true\nacquire_samples = 1500000\n"
                    "max_steps = 3\nmesh = [2, 1]\n" + "\n".join(lines))
    rc = cli.main(["--pod", str(toml), "--cpu"])
    assert rc == 0
    err = capfd.readouterr().err
    assert "pod config: 2K FFT" in err
    sync = ts.tobytes()
    for c in range(2):
        got = (tmp_path / f"ch{c}.ts").read_bytes()
        assert len(got) >= 188 * 30, (c, len(got))
        at = sync.find(got[:376])
        assert at >= 0, f"ch{c} TS not in transmitted stream"
        n = min(len(got), len(sync) - at)
        assert got[:n] == sync[at:at + n], f"ch{c}"


def _rmem_max() -> int:
    try:
        return int(open("/proc/sys/net/core/rmem_max").read())
    except OSError:  # pragma: no cover
        return 0


@pytest.mark.slow
@pytest.mark.skipif(_rmem_max() < 2_000_000,
                    reason="kernel UDP buffer too small to prefill the "
                           "loopback capture (net.core.rmem_max)")
def test_pod_cli_udp_channels(tmp_path, capfd):
    """udp:// pod channels: the CLI builds UdpIqSource readers into the
    live ChannelStore path (rate/format from the TOML).  The loopback
    captures are prefilled into the kernel socket buffer; EOF arrives as
    a socket timeout."""
    import socket

    mode = T2Mode(fft_mode=FftMode.FFT_2K, guard=GuardInterval.G1_8,
                  pilot_pattern=PilotPattern.PP7, extended_carriers=False,
                  n_data_symbols=30)
    plp = PlpConfig(constellation=Constellation.QAM16,
                    code_rate=CodeRate.C1_2, fec_frame=FecFrame.SHORT,
                    rotation=True, time_il_length=1)
    tx = Transmitter(TxConfig(mode=mode, plp=plp, fec_blocks_per_frame=4,
                              num_t2_frames=5))
    ts = random_ts_stream(6 * 4 * (plp.k_bch // 8 - 10) // 188, seed=23)
    iq = tx.modulate(ts)

    # pick free ports by binding first (the CLI re-binds after we close)
    probes = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
              for _ in range(2)]
    for s in probes:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in probes]

    payloads = []
    rng = np.random.default_rng(11)
    for c in range(2):
        dev = impair(iq, ChannelConfig(device_rate=10_000_000,
                                       cfo_hz=float(rng.uniform(-4e3, 4e3)),
                                       snr_db=29.0, seed=20 + c))
        off = int(rng.integers(300, 1500))
        dev = np.concatenate([np.zeros(off, np.complex64), dev])
        payloads.append(quantize(dev, "u8", scale=0.4).tobytes())

    lines = []
    for c in range(2):
        out = tmp_path / f"ch{c}.ts"
        lines.append(f"[[channel]]\ninput = \"udp://127.0.0.1:{ports[c]}\""
                     f"\nout = \"{out}\"\n")
    toml = tmp_path / "channels.toml"
    toml.write_text("rate = 10e6\nformat = \"u8\"\ntrack = true\n"
                    "relock = false\nmax_steps = 2\nmesh = [2, 1]\n"
                    "acquire_samples = 1200000\n" + "\n".join(lines))

    # run_pod binds its own sockets; hand the ports over and prefill
    for s in probes:
        s.close()
    import threading

    def run():
        return cli.main(["--pod", str(toml), "--cpu"])

    result = {}
    t = threading.Thread(target=lambda: result.update(rc=run()))
    t.start()
    time.sleep(1.0)              # let run_pod bind its sockets
    tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for c in range(2):
        p = payloads[c]
        for a in range(0, len(p), 60000):
            tx_sock.sendto(p[a:a + 60000], ("127.0.0.1", ports[c]))
    tx_sock.close()
    t.join(timeout=900)
    assert not t.is_alive(), "pod CLI did not finish"
    assert result.get("rc") == 0, result
    err = capfd.readouterr().err
    assert "pod config: 2K FFT" in err
    sync = ts.tobytes()
    for c in range(2):
        got = (tmp_path / f"ch{c}.ts").read_bytes()
        assert len(got) >= 188 * 20, (c, len(got))
        at = sync.find(got[:376])
        assert at >= 0, f"ch{c} TS not in transmitted stream"
        n = min(len(got), len(sync) - at)
        assert got[:n] == sync[at:at + n], f"ch{c}"
