"""Cross-validation of BB-frame de-encapsulation / TS packetization
against the REFERENCE bb_de_header (tests/oracle/shim_bb.cc): this repo's
BB packer and parsers share conventions (header layout, SYNCD, NM CRC-8
chain), so only an independent implementation can catch a mirrored
misreading of EN 302 755 clause 5.1.

Findings encoded below:
* HEM (the reference's tested mode, README:29-41): byte-exact agreement.
* NM: the reference's NM path — which its own README never claims was
  tested — inserts four spurious zero bytes at every BB-frame boundary
  (its split-packet resume reads past the frame's DFL; `unpack` fails
  and leaves zeros) and parks one Transport-Error-Indicator 0x80 at a
  mid-packet position (bb_de_header.cpp:168 takes ptr_error_indicator =
  the split-resume write position, not byte 1 of the packet).  This
  repo's NM output reproduces the transmitted TS byte-exactly; the
  streams agree byte-for-byte up to the reference's first defect.
"""
import numpy as np
import pytest

oracle = pytest.importorskip("tests.oracle")
if oracle.load() is None:
    pytest.skip("reference tree or toolchain unavailable",
                allow_module_level=True)

from sdr_receiver_dvb_t2_tpu.io.bbframe import BBFramePacker, BBFrameParser
from sdr_receiver_dvb_t2_tpu.io.native import make_bb_parser
from sdr_receiver_dvb_t2_tpu.models.transmitter import random_ts_stream
from sdr_receiver_dvb_t2_tpu.params import prbs

K_BCH = 7032


def _streams(hem: bool, n_pkts=150, seed=3, parser=None):
    packer = BBFramePacker(k_bch=K_BCH, hem=hem)
    ts = random_ts_stream(n_pkts, seed=seed)
    frames = np.stack(packer.pack(ts))              # scrambled bits
    ref = oracle.bb_parse(frames ^ prbs.bb_scrambler(K_BCH))
    parser = parser or BBFrameParser()
    ours = np.concatenate([parser.parse(f) for f in frames])
    return ts, ref, ours


@pytest.mark.parametrize("use_native", [False, True])
def test_hem_matches_reference_exactly(use_native):
    """HEM sync-byte re-insertion + SYNCD split handling: byte-exact vs
    the reference for both the Python and the native C++ parser.  The
    reference holds its in-flight split packet at stream end (flushed on
    the next frame), so it trails ours by that partial packet."""
    parser = make_bb_parser() if use_native else BBFrameParser()
    if use_native and type(parser).__name__ == "BBFrameParser":
        pytest.skip("native runtime unavailable")
    ts, ref, ours = _streams(hem=True, parser=parser)
    assert len(ref) > 188 * 140
    assert len(ours) >= len(ref)
    np.testing.assert_array_equal(ref, ours[:len(ref)])
    # and both reproduce the transmitted TS
    sync = ts.tobytes()
    got = ours.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]


def test_nm_agrees_until_reference_boundary_defect():
    """NM per-packet CRC-8 chain: our parser reproduces the transmitted
    TS byte-exactly; the reference agrees with us byte-for-byte for the
    first frame, then hits its (untested) NM boundary defects — see the
    module docstring.  The agreement region proves the CRC chain layout
    and sync-byte replacement positions match; the ground-truth check
    proves which implementation is right after that."""
    ts, ref, ours = _streams(hem=False)
    # ours == transmitted TS (ground truth; NM keeps all 188 bytes)
    sync = ts.tobytes()
    got = ours.tobytes()
    at = sync.find(got[:376])
    assert at >= 0 and got == sync[at:at + len(got)]

    n = min(len(ref), len(ours))
    diff = np.nonzero(ref[:n] != ours[:n])[0]
    assert len(diff), "reference NM defects gone — retighten this test"
    first = int(diff[0])
    # agreement for at least 3 packets before the reference's first quirk
    assert first >= 3 * 188, first
    # the first divergence is its misplaced TEI flag (0x80), not payload
    assert (ref[first] ^ ours[first]) == 0x80, (
        ref[first], ours[first])
    # the second defect class: four zero bytes inserted at the first
    # BB-frame boundary (data capacity = k_bch/8 - 10 header bytes)
    boundary = K_BCH // 8 - 10
    np.testing.assert_array_equal(ref[boundary:boundary + 4], 0)
    np.testing.assert_array_equal(ours[boundary:boundary + 4],
                                  ref[boundary + 4:boundary + 8])
