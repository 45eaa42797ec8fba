"""ctypes bindings to the native entropy coder (oav1ec.c).

Compiled on first use with the system toolchain; the pure-Python
implementation (rangecoder.py) remains the reference and fallback. The CDF
arena keeps all adaptive CDFs in contiguous NumPy memory shared with C.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "oav1ec.c"
_SO = Path(__file__).parent / "_oav1ec.so"

_lib: Optional[C.CDLL] = None
_build_failed = False


def _build() -> Optional[C.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            with tempfile.TemporaryDirectory() as td:
                tmp = Path(td) / "_oav1ec.so"
                subprocess.run(
                    ["gcc", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO)
        lib = C.CDLL(str(_SO))
        lib.enc_new.restype = C.c_void_p
        lib.enc_done.restype = C.c_size_t
        lib.enc_done.argtypes = [C.c_void_p, C.POINTER(C.POINTER(C.c_uint8))]
        lib.enc_symbol_adapt.argtypes = [
            C.c_void_p, C.POINTER(C.c_uint16), C.c_int, C.c_int,
        ]
        lib.enc_bool.argtypes = [C.c_void_p, C.c_int, C.c_uint32]
        lib.enc_literal.argtypes = [C.c_void_p, C.c_uint32, C.c_int]
        lib.enc_symbol.argtypes = [
            C.c_void_p, C.POINTER(C.c_uint16), C.c_int, C.c_int,
        ]
        lib.enc_free.argtypes = [C.c_void_p]
        lib.inv_txfm2d_c.argtypes = [
            C.POINTER(C.c_int32), C.c_int, C.c_int, C.c_int,
        ]
        lib.enc_coeffs.restype = C.c_int
        lib.enc_coeffs.argtypes = [
            C.c_void_p,
            C.POINTER(C.c_int32), C.c_int,
            C.POINTER(C.c_int32),
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_uint16), C.c_int,
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_uint16),
            C.POINTER(C.c_int32),
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[C.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def _u16p(arr: np.ndarray):
    return arr.ctypes.data_as(C.POINTER(C.c_uint16))


def _i32p(arr: np.ndarray):
    return arr.ctypes.data_as(C.POINTER(C.c_int32))


class NativeEncoder:
    """Drop-in replacement for RangeEncoder, CDFs as NumPy uint16 rows of
    shape (..., nsym+1) — last element is the adaptation counter."""

    def __init__(self) -> None:
        self.lib = get_lib()
        assert self.lib is not None
        self._enc = self.lib.enc_new()

    def __del__(self) -> None:
        try:
            if self._enc:
                self.lib.enc_free(self._enc)
                self._enc = None
        except Exception:
            pass

    def sym_adapt(self, cdf_row: np.ndarray, s: int) -> None:
        self.lib.enc_symbol_adapt(self._enc, _u16p(cdf_row), len(cdf_row) - 1, s)

    def sym_noadapt(self, cdf_row: np.ndarray, s: int) -> None:
        self.lib.enc_symbol(self._enc, _u16p(cdf_row), len(cdf_row) - 1, s)

    def bool_q15(self, val: int, f: int) -> None:
        self.lib.enc_bool(self._enc, val, f)

    def literal(self, value: int, bits: int) -> None:
        self.lib.enc_literal(self._enc, value, bits)

    def coeffs(
        self,
        levels: np.ndarray,  # (cw, cw) int32, natural order
        scan: np.ndarray,  # (cw*cw,) int32
        txb_skip_row: np.ndarray,
        eob_pt_row: np.ndarray,
        eob_extra_rows: np.ndarray,  # (9, 3)
        base_eob_rows: np.ndarray,  # (4, 4)
        base_rows: np.ndarray,  # (42, 5)
        br_rows: np.ndarray,  # (21, 5)
        dc_sign_row: np.ndarray,
    ):
        cw = levels.shape[0]
        lv = np.ascontiguousarray(levels, dtype=np.int32)
        out_ctx = np.zeros(2, dtype=np.int32)
        eob = self.lib.enc_coeffs(
            self._enc,
            _i32p(lv), cw,
            _i32p(scan),
            _u16p(txb_skip_row),
            _u16p(eob_pt_row), len(eob_pt_row) - 1,
            _u16p(eob_extra_rows),
            _u16p(base_eob_rows),
            _u16p(base_rows),
            _u16p(br_rows),
            _u16p(dc_sign_row),
            _i32p(out_ctx),
        )
        return eob, int(out_ctx[0]), int(out_ctx[1])

    def done(self) -> bytes:
        ptr = C.POINTER(C.c_uint8)()
        n = self.lib.enc_done(self._enc, C.byref(ptr))
        return bytes(bytearray(C.cast(ptr, C.POINTER(C.c_uint8 * n))[0]))


def inv_txfm2d_native(coeffs: np.ndarray, bitdepth: int = 8) -> Optional[np.ndarray]:
    """Native inverse DCT_DCT 2D transform; None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = coeffs.shape
    buf = np.ascontiguousarray(coeffs, dtype=np.int32).copy()
    lib.inv_txfm2d_c(_i32p(buf), w, h, bitdepth)
    return buf.astype(np.int64)
