"""BB frames: TS packet encapsulation (TX) and de-encapsulation (RX).

ETSI EN 302 755 clause 5 (mode adaptation / stream adaptation): TS packets
are packed into baseband frames of K_bch bits.  Two input modes:

* Normal Mode (NM): the 0x47 sync byte of every packet is replaced by the
  CRC-8 of the *previous* packet's 187 payload bytes.
* High Efficiency Mode (HEM): the sync byte is simply removed.

The 80-bit BB header encodes MATYPE, UPL, DFL, SYNC and SYNCD; its 8-bit
MODE/CRC field is the CRC-8 of the first 72 bits, XORed with 0 for NM and
with the CRC-8 polynomial constant for HEM (detection logic mirrored from
/root/reference/src/DVB_T2/bb_de_header.cpp:59-108).  The whole BB frame is
then scrambled with the BB PRBS.

The RX half reassembles 188-byte TS packets across BB frame boundaries,
checks per-packet CRC-8 in NM (setting the Transport Error Indicator on
mismatch) and resynchronizes via SYNCD after data loss — the same recovery
behaviour as bb_de_header.cpp:157-440.
"""
from __future__ import annotations

import dataclasses
import numpy as np

CRC8_POLY_REFLECTED = 0xAB        # bit-serial LSB-first form
CRC8_POLY = 0xD5                  # byte-table MSB-first form
TS_LEN = 188
HEADER_BITS = 80


def _crc8_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint8)
    for i in range(256):
        crc = 0
        r = i
        for j in range(7, -1, -1):
            if ((r >> j) & 1) ^ ((crc >> 7) & 1):
                crc = ((crc << 1) ^ CRC8_POLY) & 0xFF
            else:
                crc = (crc << 1) & 0xFF
        table[i] = crc
    return table


_CRC8_TABLE = _crc8_table()


def crc8_bytes(data: np.ndarray) -> int:
    """Table-driven CRC-8 over bytes (packet CRC in NM mode)."""
    crc = 0
    for b in np.asarray(data, dtype=np.uint8):
        crc = _CRC8_TABLE[int(b) ^ crc]
    return int(crc)


def crc8_bits(bits: np.ndarray) -> int:
    """Bit-serial CRC-8, LSB-first polynomial (header MODE detection)."""
    crc = 0
    for bit in np.asarray(bits, dtype=np.uint8):
        b = int(bit) ^ (crc & 1)
        crc >>= 1
        if b:
            crc ^= CRC8_POLY_REFLECTED
    return crc


def _bits_of_bytes(data: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(data, dtype=np.uint8))


def _bytes_of_bits(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, dtype=np.uint8))


def _mode_field(header72: np.ndarray, hem: bool) -> int:
    """Solve for the 8-bit field making crc8_bits(header80) == target."""
    target = CRC8_POLY_REFLECTED if hem else 0
    for cand in range(256):
        bits = np.concatenate([header72, np.unpackbits(np.uint8(cand))])
        if crc8_bits(bits) == target:
            return cand
    raise AssertionError("unreachable: CRC-8 is surjective")


@dataclasses.dataclass
class BBFramePacker:
    """Packs a TS byte stream into BB frames (single PLP, CCM)."""
    k_bch: int
    hem: bool = True
    issyi: bool = False
    npd: bool = False

    def __post_init__(self):
        self._pending = np.empty(0, dtype=np.uint8)   # unit-stream bytes
        self._offset_in_packet = 0                    # bytes already sent
        self._unit = TS_LEN - 1 if self.hem else TS_LEN
        self._last_crc = 0

    def _push_packets(self, ts: np.ndarray):
        ts = np.asarray(ts, dtype=np.uint8).reshape(-1, TS_LEN)
        assert (ts[:, 0] == 0x47).all(), "TS packets must start with 0x47"
        if self.hem:
            units = ts[:, 1:]
        else:
            # replace sync byte with CRC-8 of previous packet payload
            units = ts.copy()
            for i in range(len(units)):
                crc = crc8_bytes(units[i, 1:])
                units[i, 0] = self._last_crc
                self._last_crc = crc
        self._pending = np.concatenate([self._pending, units.reshape(-1)])

    def pack(self, ts_stream: np.ndarray) -> list[np.ndarray]:
        """Feed TS bytes; returns list of K_bch-bit scrambled BB frames."""
        self._push_packets(ts_stream)
        frames = []
        dfl_bytes = (self.k_bch - HEADER_BITS) // 8
        while len(self._pending) >= dfl_bytes:
            data = self._pending[:dfl_bytes]
            self._pending = self._pending[dfl_bytes:]
            to_boundary = (self._unit - self._offset_in_packet) % self._unit
            syncd = to_boundary * 8
            self._offset_in_packet = (self._offset_in_packet + dfl_bytes) % self._unit
            frames.append(self._build_frame(data, syncd))
        return frames

    def _build_frame(self, data: np.ndarray, syncd: int) -> np.ndarray:
        bits = np.zeros(self.k_bch, dtype=np.uint8)
        hdr = np.zeros(72, dtype=np.uint8)
        # MATYPE-1: TS_GS=11, SIS_MIS=1(single), CCM_ACM=1(CCM), ISSYI, NPD, EXT=00
        matype1 = (0b11 << 6) | (1 << 5) | (1 << 4) | (int(self.issyi) << 3) \
            | (int(self.npd) << 2)
        hdr[0:8] = np.unpackbits(np.uint8(matype1))
        hdr[8:16] = 0                                    # MATYPE-2 / ISI
        upl = TS_LEN * 8 if not self.hem else 0
        hdr[16:32] = np.unpackbits(np.array([upl >> 8, upl & 0xFF], dtype=np.uint8))
        dfl = self.k_bch - HEADER_BITS
        hdr[32:48] = np.unpackbits(np.array([dfl >> 8, dfl & 0xFF], dtype=np.uint8))
        sync = 0x47 if not self.hem else 0
        hdr[48:56] = np.unpackbits(np.uint8(sync))
        hdr[56:72] = np.unpackbits(np.array([syncd >> 8, syncd & 0xFF], dtype=np.uint8))
        mode = _mode_field(hdr, self.hem)
        bits[:72] = hdr
        bits[72:80] = np.unpackbits(np.uint8(mode))
        bits[80:] = _bits_of_bytes(data)
        from ..params import prbs
        return bits ^ prbs.bb_scrambler(self.k_bch)


TEI_FLAG = 0x80


@dataclasses.dataclass
class _PlpState:
    partial: np.ndarray = dataclasses.field(
        default_factory=lambda: np.empty(0, dtype=np.uint8))
    crc: int = -1                 # -1 = chain not established (NM mode)
    synced: bool = False


class BBFrameParser:
    """Reassembles TS packets from descrambled BB frames (one PLP)."""

    def __init__(self):
        self.state = _PlpState()
        self.mode_hem: bool | None = None
        self.header_errors = 0
        self.crc_errors = 0

    def parse(self, frame_bits: np.ndarray) -> np.ndarray:
        """Descrambled K_bch bits -> TS bytes recovered from this frame."""
        from ..params import prbs
        bits = np.asarray(frame_bits, dtype=np.uint8)
        bits = bits ^ prbs.bb_scrambler(len(bits))
        check = crc8_bits(bits[:HEADER_BITS])
        if check == 0:
            hem = False
        elif check == CRC8_POLY_REFLECTED:
            hem = True
        else:
            self.header_errors += 1
            self.state.synced = False
            return np.empty(0, dtype=np.uint8)
        self.mode_hem = hem
        dfl = int(_bytes_of_bits(bits[32:48])[0]) << 8 | int(_bytes_of_bits(bits[32:48])[1])
        syncd = int(_bytes_of_bits(bits[56:72])[0]) << 8 | int(_bytes_of_bits(bits[56:72])[1])
        data = _bytes_of_bits(bits[HEADER_BITS:HEADER_BITS + dfl])
        unit = TS_LEN - 1 if hem else TS_LEN
        st = self.state
        out = []
        if syncd == 65535:
            # continuation-only frame: no UP starts here; the whole data
            # field extends the in-flight packet (bb_de_header.cpp handles
            # this via SYNCD-less accumulation)
            if not st.synced:
                return np.empty(0, dtype=np.uint8)
        elif not st.synced:
            data = data[syncd // 8:]
            st.partial = np.empty(0, dtype=np.uint8)
            st.synced = True
            st.crc = -1                      # fresh sync: no CRC chain yet
        else:
            need = unit - len(st.partial)
            if syncd // 8 != need % unit and not (len(st.partial) == 0 and syncd // 8 == 0):
                # lost alignment: resynchronize at SYNCD
                self.crc_errors += 1
                data = data[syncd // 8:]
                st.partial = np.empty(0, dtype=np.uint8)
                st.crc = -1                  # CRC chain broken: re-arm
        stream = np.concatenate([st.partial, data])
        n_units = len(stream) // unit
        st.partial = stream[n_units * unit:]
        units = stream[:n_units * unit].reshape(-1, unit)
        for u in units:
            if hem:
                pkt = np.concatenate([[0x47], u]).astype(np.uint8)
            else:
                payload = u[1:]
                pkt = np.concatenate([[0x47], payload]).astype(np.uint8)
                # CRC of this packet's payload arrives as next packet's first
                # byte; full inter-packet checking requires lookahead, so we
                # validate against the embedded previous-CRC chain instead.
                if st.crc >= 0 and st.crc != int(u[0]):
                    self.crc_errors += 1
                    pkt[1] |= TEI_FLAG
                st.crc = crc8_bytes(payload)
            out.append(pkt)
        if out:
            return np.concatenate(out)
        return np.empty(0, dtype=np.uint8)
