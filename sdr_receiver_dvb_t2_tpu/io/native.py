"""ctypes bindings for the native runtime (native/dvbt2_runtime.cc).

Builds the shared library on first use with g++ (cached next to the
source); falls back to the pure-Python implementations in io/bbframe.py
when no compiler is available.  The C ABI avoids a pybind11 dependency.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _SRC / "libdvbt2_runtime.so"
# wheel installs ship the prebuilt library as package data (see setup.py)
_PKG_LIB = Path(__file__).resolve().parent.parent / "_native" \
    / "libdvbt2_runtime.so"
_lib = None


def _build() -> Path:
    src = _SRC / "dvbt2_runtime.cc"
    if not src.exists():
        if _PKG_LIB.exists():
            return _PKG_LIB
        raise FileNotFoundError(src)
    if (_LIB_PATH.exists()
            and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime):
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         str(src), "-o", str(_LIB_PATH)],
        check=True, capture_output=True)
    return _LIB_PATH


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        lib = ctypes.CDLL(str(_build()))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bb_parser_new.restype = ctypes.c_void_p
    lib.bb_parser_free.argtypes = [ctypes.c_void_p]
    lib.bb_parser_parse.restype = ctypes.c_int
    lib.bb_parser_parse.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int, u8p]
    lib.bb_parser_parse_bytes.restype = ctypes.c_int
    lib.bb_parser_parse_bytes.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int,
                                          u8p, ctypes.c_int64]
    lib.bb_parser_parse_batch.restype = ctypes.c_int64
    lib.bb_parser_parse_batch.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int,
                                          ctypes.c_int, u8p, ctypes.c_int64]
    lib.bb_parser_copy_out.restype = ctypes.c_int64
    lib.bb_parser_copy_out.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
    lib.bb_parser_out_size.restype = ctypes.c_int64
    lib.bb_parser_out_size.argtypes = [ctypes.c_void_p]
    for name in ("header_errors", "crc_errors", "unsupported",
                 "null_reinserted", "truncated", "issy_stripped",
                 "last_issy"):
        fn = getattr(lib, f"bb_parser_{name}")
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.bb_parser_hem.restype = ctypes.c_int
    lib.bb_parser_hem.argtypes = [ctypes.c_void_p]
    lib.bb_parser_matype.restype = ctypes.c_int
    lib.bb_parser_matype.argtypes = [ctypes.c_void_p]
    lib.bb_parser_isi.restype = ctypes.c_int
    lib.bb_parser_isi.argtypes = [ctypes.c_void_p]
    lib.dvbt2_crc8_bytes.restype = ctypes.c_uint8
    lib.dvbt2_crc8_bytes.argtypes = [u8p, ctypes.c_int]
    lib.iq_ring_new.restype = ctypes.c_void_p
    lib.iq_ring_new.argtypes = [ctypes.c_uint64]
    lib.iq_ring_free.argtypes = [ctypes.c_void_p]
    lib.iq_ring_push.restype = ctypes.c_int
    lib.iq_ring_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.iq_ring_pop.restype = ctypes.c_uint64
    lib.iq_ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.iq_ring_fill.restype = ctypes.c_uint64
    lib.iq_ring_fill.argtypes = [ctypes.c_void_p]
    lib.iq_ring_dropped.restype = ctypes.c_uint64
    lib.iq_ring_dropped.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeBBFrameParser:
    """Drop-in native replacement for io.bbframe.BBFrameParser."""

    def __init__(self):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (no g++?)")
        self._lib = lib
        self._h = lib.bb_parser_new()
        self._out = np.empty(1 << 16, dtype=np.uint8)

    def parse(self, frame_bits: np.ndarray) -> np.ndarray:
        """Bit-array interface (one byte per bit); packs and delegates so
        NPD re-insertion gets the full-size output buffer."""
        return self.parse_bytes(np.packbits(
            np.ascontiguousarray(frame_bits, dtype=np.uint8)))

    def _refetch(self, out: np.ndarray, total: int) -> np.ndarray:
        """Total produced exceeded the guess buffer (heavy NPD expansion —
        up to ~256x is legal): re-copy from the parser's retained buffer.
        Nothing is ever dropped on this path."""
        if total <= len(out):
            return out[:total]
        big = np.empty(total, dtype=np.uint8)
        n = self._lib.bb_parser_copy_out(self._h, _as_u8p(big), total)
        return big[:n]

    def parse_bytes(self, frame_bytes: np.ndarray) -> np.ndarray:
        """One packed (scrambled) BB frame of k_bch/8 bytes -> TS bytes."""
        b = np.ascontiguousarray(frame_bytes, dtype=np.uint8)
        cap = max(len(self._out), 64 * len(b))
        if cap > len(self._out):
            self._out = np.empty(cap, dtype=np.uint8)
        n = self._lib.bb_parser_parse_bytes(self._h, _as_u8p(b), len(b),
                                            _as_u8p(self._out), cap)
        if n <= 0:
            return np.empty(0, dtype=np.uint8)
        return self._refetch(self._out, n).copy()

    def parse_batch(self, frames_bytes: np.ndarray) -> np.ndarray:
        """[n_frames, k_bch/8] packed scrambled BB frames -> TS bytes.

        One native call for the whole LDPC batch — replaces the per-codeword
        Python loop on the streaming path (models/receiver.py).
        """
        f = np.ascontiguousarray(frames_bytes, dtype=np.uint8)
        n_frames, bytes_each = f.shape
        cap = 8 * n_frames * bytes_each + 256 * 188
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.bb_parser_parse_batch(self._h, _as_u8p(f), n_frames,
                                            bytes_each, _as_u8p(out), cap)
        return self._refetch(out, n)

    @property
    def header_errors(self) -> int:
        return self._lib.bb_parser_header_errors(self._h)

    @property
    def crc_errors(self) -> int:
        return self._lib.bb_parser_crc_errors(self._h)

    @property
    def unsupported(self) -> int:
        return self._lib.bb_parser_unsupported(self._h)

    @property
    def null_reinserted(self) -> int:
        return self._lib.bb_parser_null_reinserted(self._h)

    @property
    def truncated(self) -> int:
        return self._lib.bb_parser_truncated(self._h)

    @property
    def issy_stripped(self) -> int:
        """ISSY values consumed: per UP in NM, per frame in HEM."""
        return self._lib.bb_parser_issy_stripped(self._h)

    @property
    def last_issy(self) -> int:
        """Most recent ISSY value (opaque 2-3 byte ISCR), -1 if none."""
        return self._lib.bb_parser_last_issy(self._h)

    @property
    def matype(self) -> dict | None:
        """Last parsed MATYPE fields (the reference's L1/BB display set)."""
        v = self._lib.bb_parser_matype(self._h)
        if v < 0:
            return None
        return dict(ts_gs=v >> 8, sis_mis=(v >> 7) & 1, ccm_acm=(v >> 6) & 1,
                    issyi=(v >> 5) & 1, npd=(v >> 4) & 1,
                    isi=self._lib.bb_parser_isi(self._h))

    @property
    def mode_hem(self):
        v = self._lib.bb_parser_hem(self._h)
        return None if v < 0 else bool(v)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bb_parser_free(self._h)
            self._h = None


class IqRing:
    """SPSC lock-free byte ring (ingest thread -> compute thread)."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (no g++?)")
        self._lib = lib
        self._h = lib.iq_ring_new(capacity)

    def push(self, data: np.ndarray) -> bool:
        data = np.ascontiguousarray(data).view(np.uint8)
        return bool(self._lib.iq_ring_push(self._h, _as_u8p(data),
                                           data.nbytes))

    def pop(self, n_bytes: int, dtype=np.uint8) -> np.ndarray:
        out = np.empty(n_bytes, dtype=np.uint8)
        got = self._lib.iq_ring_pop(self._h, _as_u8p(out), n_bytes)
        return out[:got].view(dtype)

    @property
    def fill(self) -> int:
        return self._lib.iq_ring_fill(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.iq_ring_dropped(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.iq_ring_free(self._h)
            self._h = None


def make_bb_parser():
    """Best available BB-frame parser: native if buildable, else Python."""
    try:
        return NativeBBFrameParser()
    except RuntimeError:
        from .bbframe import BBFrameParser
        return BBFrameParser()
