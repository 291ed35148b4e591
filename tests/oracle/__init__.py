"""Build + load the reference-implementation oracle (tests/oracle/shim.cc).

Compiles the reference's Qt-free engines (/root/reference/src/DVB_T2:
LDPC decoder, freq-deinterleaver address generator, pilot generator)
into a test-only shared object.  Reference sources are compiled in
place, never copied; Qt includes resolve to empty stubs (qt_stubs/).
Tests skip when the reference tree or a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_REF = Path(os.environ.get("DVBT2_REFERENCE_DIR",
                           "/root/reference")) / "src" / "DVB_T2"

_SOURCES = ["dvbt2_definition.cpp", "address_freq_deinterleaver.cpp",
            "pilot_generator.cpp", "LDPC/tables_handler.cc",
            # interleaver oracle (shim_interleaver.cc): the reference's
            # bit-deint LUT builder and cell/time deinterleaver, run inert
            # behind the Qt stubs
            "time_deinterleaver.cpp", "llr_demapper.cpp",
            # L1-parse oracle (shim_l1.cc): the reference's p2_symbol
            # L1-pre/post bit walker
            "p2_symbol.cpp",
            # BB-deheader/TS oracle (shim_bb.cc)
            "bb_de_header.cpp"]
_SHIMS = ["shim.cc", "shim_interleaver.cc", "shim_l1.cc",
          "shim_bb.cc"]


@functools.lru_cache(maxsize=1)
def load():
    """Compile (cached by content hash) and load the oracle; None if the
    reference tree or g++ is unavailable."""
    if not (_REF / "dvbt2_definition.h").exists():
        return None
    h = hashlib.sha256()
    for s in _SHIMS:
        h.update((_HERE / s).read_bytes())
    for s in _SOURCES:
        h.update((_REF / s).read_bytes())
    for stub in sorted((_HERE / "qt_stubs").iterdir()):
        h.update(stub.read_bytes())
    so = Path(tempfile.gettempdir()) / f"dvbt2_oracle_{h.hexdigest()[:16]}.so"
    if not so.exists():
        # -mavx2: llr_demapper.cpp's demap kernels are AVX2 intrinsics
        cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
               "-Wno-attributes", "-mavx2",
               f"-I{_HERE / 'qt_stubs'}", f"-I{_REF}", f"-I{_REF.parent}"] \
              + [str(_HERE / s) for s in _SHIMS] \
              + [str(_REF / s) for s in _SOURCES] \
              + ["-o", str(so)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True,
                           timeout=300)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            err = getattr(e, "stderr", "")
            raise RuntimeError(f"oracle build failed:\n{err}") from e
    lib = ctypes.CDLL(str(so))
    ip = ctypes.POINTER(ctypes.c_int)
    fp = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.oracle_geometry.restype = ctypes.c_int
    lib.oracle_geometry.argtypes = [ctypes.c_int] * 5 + [ip]
    lib.oracle_freq_addresses.restype = ctypes.c_int
    lib.oracle_freq_addresses.argtypes = [ctypes.c_int] * 5 + [ip] * 6
    lib.oracle_pilots.restype = ctypes.c_int
    lib.oracle_pilots.argtypes = [ctypes.c_int] * 7 + [ip, fp, ip, fp, ip, fp]
    lib.oracle_geometry2.restype = ctypes.c_int
    lib.oracle_geometry2.argtypes = [ctypes.c_int] * 7 + [ip]
    lib.oracle_pilots2.restype = ctypes.c_int
    lib.oracle_pilots2.argtypes = [ctypes.c_int] * 9 + [ip, fp, ip, fp,
                                                        ip, fp]
    lib.oracle_ldpc_create.restype = ctypes.c_void_p
    lib.oracle_ldpc_create.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                       ctypes.c_int]
    lib.oracle_ldpc_n.restype = ctypes.c_int
    lib.oracle_ldpc_n.argtypes = [ctypes.c_void_p]
    lib.oracle_ldpc_k.restype = ctypes.c_int
    lib.oracle_ldpc_k.argtypes = [ctypes.c_void_p]
    lib.oracle_ldpc_decode.restype = ctypes.c_int
    lib.oracle_ldpc_decode.argtypes = [ctypes.c_void_p, i8p, ctypes.c_int]
    lib.oracle_ldpc_free.argtypes = [ctypes.c_void_p]
    lib.oracle_bit_deint_lut.restype = ctypes.c_int
    lib.oracle_bit_deint_lut.argtypes = [ctypes.c_int] * 3 + [ip]
    lib.oracle_cell_deint_permutation.restype = ctypes.c_int
    lib.oracle_cell_deint_permutation.argtypes = [ctypes.c_int] * 3 + [ip]
    lib.oracle_time_deint.restype = ctypes.c_int
    lib.oracle_time_deint.argtypes = [ctypes.c_int] * 5 + [fp] * 4
    lib.oracle_l1_parse.restype = ctypes.c_int
    lib.oracle_l1_parse.argtypes = [fp, fp, ctypes.c_int, ip, ctypes.c_int]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.oracle_bb_parse.restype = ctypes.c_int
    lib.oracle_bb_parse.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, u8p, ctypes.c_int]
    return lib


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# enum values from the reference headers (dvbt2_definition.h)
FFTSIZE = {2048: 0, 8192: 1, 4096: 2, 1024: 3, 16384: 4, 32768: 5}
DATA_CARRIER = 1


def geometry(fft_size: int, pp: int, extended: bool, guard: int = 0,
             papr: int = 0):
    lib = load()
    out = np.zeros(8, np.int32)
    lib.oracle_geometry(FFTSIZE[fft_size], pp, 1 if extended else 0, papr,
                        guard, _ip(out))
    return dict(k_total=int(out[0]), c_p2=int(out[1]), c_data=int(out[2]),
                n_fc=int(out[3]), c_fc=int(out[4]), n_p2=int(out[5]),
                l_nulls=int(out[6]), fft_size=int(out[7]))


def freq_addresses(fft_size: int, pp: int, extended: bool, guard: int = 0,
                   papr: int = 0):
    """Reference RX deinterleaver LUTs: dict of int32 arrays."""
    lib = load()
    g = geometry(fft_size, pp, extended, guard, papr)
    he_p2 = np.zeros(g["c_p2"], np.int32)
    ho_p2 = np.zeros(g["c_p2"], np.int32)
    he_d = np.zeros(max(g["c_data"], 1), np.int32)
    ho_d = np.zeros(max(g["c_data"], 1), np.int32)
    he_fc = np.zeros(max(g["n_fc"], 1), np.int32)
    ho_fc = np.zeros(max(g["n_fc"], 1), np.int32)
    lib.oracle_freq_addresses(FFTSIZE[fft_size], pp, 1 if extended else 0,
                              papr, guard, _ip(he_p2), _ip(ho_p2), _ip(he_d),
                              _ip(ho_d), _ip(he_fc), _ip(ho_fc))
    return dict(h_even_p2=he_p2, h_odd_p2=ho_p2, h_even_data=he_d,
                h_odd_data=ho_d, h_even_fc=he_fc, h_odd_fc=ho_fc, **g)


def pilots(fft_size: int, pp: int, extended: bool, n_data_total: int,
           l_fc: int, guard: int = 0, papr: int = 0):
    """Reference carrier maps + pilot reference values per symbol."""
    lib = load()
    g = geometry(fft_size, pp, extended, guard, papr)
    kt, n_p2 = g["k_total"], g["n_p2"]
    n_data = n_data_total - l_fc
    p2_map = np.zeros(kt, np.int32)
    p2_ref = np.zeros(n_p2 * kt, np.float32)
    d_map = np.zeros(max(n_data, 1) * kt, np.int32)
    d_ref = np.zeros(max(n_data, 1) * kt, np.float32)
    fc_map = np.zeros(kt, np.int32)
    fc_ref = np.zeros(kt, np.float32)
    lib.oracle_pilots(FFTSIZE[fft_size], pp, 1 if extended else 0, papr,
                      guard, n_data_total, l_fc, _ip(p2_map), _fp(p2_ref),
                      _ip(d_map), _fp(d_ref), _ip(fc_map), _fp(fc_ref))
    return dict(p2_map=p2_map, p2_ref=p2_ref.reshape(n_p2, kt),
                data_map=d_map.reshape(-1, kt),
                data_ref=d_ref.reshape(-1, kt),
                fc_map=fc_map, fc_ref=fc_ref, **g)


def geometry_miso(fft_size: int, pp: int, extended: bool, guard: int = 0,
                  papr: int = 0):
    """MISO-mode geometry (preamble T2_MISO)."""
    lib = load()
    out = np.zeros(8, np.int32)
    lib.oracle_geometry2(FFTSIZE[fft_size], pp, 1 if extended else 0, papr,
                         guard, 1, 0, _ip(out))
    return dict(k_total=int(out[0]), c_p2=int(out[1]), c_data=int(out[2]),
                n_fc=int(out[3]), c_fc=int(out[4]), n_p2=int(out[5]),
                l_nulls=int(out[6]), fft_size=int(out[7]))


def pilots_miso(fft_size: int, pp: int, extended: bool, n_data_total: int,
                l_fc: int, tx_group: int, guard: int = 0, papr: int = 0):
    """MISO carrier maps + pilot references for TX group 1 or 2.

    Inverted pilot positions appear as the *_INVERTED carrier-type codes
    (P2=7, SP=8, CP=9) and negated reference values."""
    lib = load()
    g = geometry_miso(fft_size, pp, extended, guard, papr)
    kt, n_p2 = g["k_total"], g["n_p2"]
    n_data = n_data_total - l_fc
    p2_map = np.zeros(kt, np.int32)
    p2_ref = np.zeros(n_p2 * kt, np.float32)
    d_map = np.zeros(max(n_data, 1) * kt, np.int32)
    d_ref = np.zeros(max(n_data, 1) * kt, np.float32)
    fc_map = np.zeros(kt, np.int32)
    fc_ref = np.zeros(kt, np.float32)
    lib.oracle_pilots2(FFTSIZE[fft_size], pp, 1 if extended else 0, papr,
                       guard, n_data_total, l_fc, 1, tx_group - 1,
                       _ip(p2_map), _fp(p2_ref), _ip(d_map), _fp(d_ref),
                       _ip(fc_map), _fp(fc_ref))
    return dict(p2_map=p2_map, p2_ref=p2_ref.reshape(n_p2, kt),
                data_map=d_map.reshape(-1, kt),
                data_ref=d_ref.reshape(-1, kt),
                fc_map=fc_map, fc_ref=fc_ref, **g)


# reference table ids: (prefix, number) per tables_handler.cc
LDPC_TABLE = {
    "NORMAL_C1_2": ("A", 1), "NORMAL_C3_5": ("A", 2), "NORMAL_C2_3": ("A", 3),
    "NORMAL_C3_4": ("A", 4), "NORMAL_C4_5": ("A", 5), "NORMAL_C5_6": ("A", 6),
    "SHORT_C1_4": ("B", 1), "SHORT_C1_2": ("B", 2), "SHORT_C3_5": ("B", 3),
    "SHORT_C2_3": ("B", 4), "SHORT_C3_4": ("B", 5), "SHORT_C4_5": ("B", 6),
    "SHORT_C5_6": ("B", 7),
    "B8": ("B", 8), "B9": ("B", 9),     # T2-Lite rates 1/3 and 2/5
}


class LdpcOracle:
    """Scalar int8 instantiation of the reference layered OMS decoder."""

    def __init__(self, table_name: str):
        self._lib = load()
        prefix, number = LDPC_TABLE[table_name]
        self._h = self._lib.oracle_ldpc_create(b"T2", prefix.encode(),
                                               number)
        assert self._h, table_name
        self.n = self._lib.oracle_ldpc_n(self._h)
        self.k = self._lib.oracle_ldpc_k(self._h)

    def decode(self, llr: np.ndarray, trials: int = 15):
        """[n] int8 natural-order LLRs -> (hard data bits [k], ok, trials
        used by the reference's own accounting)."""
        code = np.array(llr, dtype=np.int8)
        assert code.shape == (self.n,)
        rc = self._lib.oracle_ldpc_decode(
            self._h, code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            trials)
        hard = (code[:self.k] < 0).astype(np.uint8)
        return hard, rc >= 0, rc

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.oracle_ldpc_free(self._h)


# reference code-rate enum (dvbt2_definition.h:68-76) and mod codes
CODE_RATE = {"C1_2": 0, "C3_5": 1, "C2_3": 2, "C3_4": 3, "C4_5": 4,
             "C5_6": 5}
PLP_MOD = {"QPSK": 0, "QAM16": 1, "QAM64": 2, "QAM256": 3}


def bit_deint_lut(plp_mod: int, normal: bool, code_rate: int) -> np.ndarray:
    """Reference combined bit-deinterleave scatter LUT (llr_demapper ctor):
    u_position = lut[demapped_stream_bit] with u the parity-interleaved
    codeword."""
    lib = load()
    out = np.zeros(64800 if normal else 16200, np.int32)
    n = lib.oracle_bit_deint_lut(plp_mod, 1 if normal else 0, code_rate,
                                 _ip(out))
    assert n == len(out), (n, len(out))
    return out


def cell_deint_permutation(plp_mod: int, normal: bool,
                           num_blocks: int) -> np.ndarray:
    """Reference cell-deinterleaver permutation, [num_blocks * cells]."""
    lib = load()
    bits = {0: 2, 1: 4, 2: 6, 3: 8}[plp_mod]
    cells = (64800 if normal else 16200) // bits
    out = np.zeros(num_blocks * cells, np.int32)
    n = lib.oracle_cell_deint_permutation(plp_mod, 1 if normal else 0,
                                          num_blocks, _ip(out))
    assert n == len(out)
    return out.reshape(num_blocks, cells)


def time_deinterleave(plp_mod: int, normal: bool, stream: np.ndarray,
                      num_blocks: int, num_blocks_max: int,
                      time_il_length: int) -> np.ndarray:
    """Run the reference time_deinterleaver on one interleaving frame.

    stream: [num_blocks * cells] complex64, the PLP cell slice in
    transmission order.  Returns the deinterleaved cells (natural
    FEC-block-major order, Q-delay removed) as complex64."""
    lib = load()
    stream = np.asarray(stream, np.complex64)
    in_re = np.ascontiguousarray(stream.real, np.float32)
    in_im = np.ascontiguousarray(stream.imag, np.float32)
    out_re = np.zeros(len(stream), np.float32)
    out_im = np.zeros(len(stream), np.float32)
    n = lib.oracle_time_deint(plp_mod, 1 if normal else 0, num_blocks,
                              num_blocks_max, time_il_length,
                              _fp(in_re), _fp(in_im), _fp(out_re),
                              _fp(out_im))
    assert n == len(stream), (n, len(stream))
    return (out_re + 1j * out_im).astype(np.complex64)


def l1_parse(cells: np.ndarray):
    """Run the reference's p2_symbol L1 parser on equalized L1 cells.

    Returns the serialized int array (layout: shim_l1.cc), or raises on
    CRC failure."""
    lib = load()
    cells = np.asarray(cells, np.complex64)
    re = np.ascontiguousarray(cells.real, np.float32)
    im = np.ascontiguousarray(cells.imag, np.float32)
    out = np.zeros(4096, np.int32)
    n = lib.oracle_l1_parse(_fp(re), _fp(im), len(cells), _ip(out),
                            len(out))
    if n < 0:
        raise ValueError(f"reference L1 parse failed: code {n}")
    return out[:n]


def bb_parse(frames_bits: np.ndarray, plp_id: int = 0) -> np.ndarray:
    """Run the reference bb_de_header on descrambled BB-frame bit arrays
    ([n_frames, k_bch], one byte per bit) and return the TS bytes it
    emits."""
    lib = load()
    f = np.ascontiguousarray(frames_bits, np.uint8)
    n_frames, frame_bits = f.shape
    u8 = ctypes.POINTER(ctypes.c_uint8)
    out = np.zeros(n_frames * frame_bits // 8 + 4096, np.uint8)
    n = lib.oracle_bb_parse(f.ctypes.data_as(u8), n_frames, frame_bits,
                            plp_id, out.ctypes.data_as(u8), len(out))
    assert 0 <= n <= len(out), n
    return out[:n]
