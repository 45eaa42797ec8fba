"""Second decode oracle: libaom's decoder via ctypes.

dav1d (through libavif, io/avif_ctypes.py) is the primary conformance
oracle; this decodes raw AV1 temporal units with libaom.so.3 so the
test suite can hold streams to TWO independent decoders (and so
decoder-disagreement questions — e.g. the SGRPROJ xqd ref-mid
off-by-one — can be arbitrated). The reference's decode path is
libavif/dav1d behind decodeAvifToRgb (reference src/io.zig:638-666);
libaom is the encoder-side's own decoder, making it the natural
second opinion. Pinned ABI facts: aom_codec_dec_init_ver takes ABI
version 22 on libaom 3.6; aom_image's plane pointers sit after seven
ints (fmt, cp, tc, mc, monochrome, csp, range) + w/h/depth + 4 more.
"""

from __future__ import annotations

import ctypes as C

import numpy as np

_AOM_DEC_ABI = 22  # AOM_CODEC_ABI_VERSION for libaom 3.6


class _AomImage(C.Structure):
    # matches aom_image_t layout for libaom 3.x (aom/aom_image.h)
    _fields_ = [
        ("fmt", C.c_int),
        ("cp", C.c_int),
        ("tc", C.c_int),
        ("mc", C.c_int),
        ("monochrome", C.c_int),
        ("csp", C.c_int),
        ("range", C.c_int),
        ("w", C.c_uint),
        ("h", C.c_uint),
        ("bit_depth", C.c_uint),
        ("d_w", C.c_uint),
        ("d_h", C.c_uint),
        ("r_w", C.c_uint),
        ("r_h", C.c_uint),
        ("x_chroma_shift", C.c_uint),
        ("y_chroma_shift", C.c_uint),
        ("planes", C.c_void_p * 3),
        ("stride", C.c_int * 3),
        ("sz", C.c_size_t),
        ("bps", C.c_int),
        ("temporal_id", C.c_uint),
        ("spatial_id", C.c_uint),
        ("user_priv", C.c_void_p),
        ("img_data", C.c_void_p),
        ("img_data_owner", C.c_int),
        ("self_allocd", C.c_int),
        ("fb_priv", C.c_void_p),
    ]


class _AomCodecCtx(C.Structure):
    _fields_ = [
        ("name", C.c_char_p),
        ("iface", C.c_void_p),
        ("err", C.c_int),
        ("err_detail", C.c_char_p),
        ("init_flags", C.c_long),
        ("config", C.c_void_p),
        ("priv", C.c_void_p),
    ]


_lib = None


def _aom():
    global _lib
    if _lib is None:
        lib = C.CDLL("libaom.so.3")
        lib.aom_codec_av1_dx.restype = C.c_void_p
        lib.aom_codec_dec_init_ver.argtypes = [
            C.POINTER(_AomCodecCtx), C.c_void_p, C.c_void_p, C.c_long,
            C.c_int,
        ]
        lib.aom_codec_decode.argtypes = [
            C.POINTER(_AomCodecCtx), C.c_char_p, C.c_size_t, C.c_void_p,
        ]
        lib.aom_codec_get_frame.restype = C.POINTER(_AomImage)
        lib.aom_codec_get_frame.argtypes = [
            C.POINTER(_AomCodecCtx), C.POINTER(C.c_void_p),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    """True when libaom.so.3 is loadable on this host."""
    try:
        _aom()
        return True
    except OSError:
        return False


def decode_obu_to_yuv(obu: bytes):
    """Decode a raw AV1 temporal unit; returns ([Y, U, V] int32 arrays,
    bit_depth). Raises on decode failure."""
    lib = _aom()
    ctx = _AomCodecCtx()
    rc = lib.aom_codec_dec_init_ver(C.byref(ctx), lib.aom_codec_av1_dx(),
                                    None, 0, _AOM_DEC_ABI)
    if rc != 0:
        raise RuntimeError(f"aom dec_init failed rc={rc}")
    try:
        rc = lib.aom_codec_decode(C.byref(ctx), obu, len(obu), None)
        if rc != 0:
            detail = ctx.err_detail.decode() if ctx.err_detail else ""
            raise RuntimeError(f"aom decode failed rc={rc}: {detail}")
        it = C.c_void_p(None)
        img = lib.aom_codec_get_frame(C.byref(ctx), C.byref(it))
        if not img:
            raise RuntimeError("aom: no frame")
        im = img.contents
        planes = []
        hbd = im.fmt & 0x800  # AOM_IMG_FMT_HIGHBITDEPTH
        for p in range(3):
            pw = im.d_w >> (im.x_chroma_shift if p else 0)
            ph = im.d_h >> (im.y_chroma_shift if p else 0)
            stride = im.stride[p]
            if hbd:
                buf = (C.c_uint16 * ((stride // 2) * ph)).from_address(
                    im.planes[p])
                a = np.frombuffer(buf, np.uint16).reshape(ph, stride // 2)
            else:
                buf = (C.c_uint8 * (stride * ph)).from_address(im.planes[p])
                a = np.frombuffer(buf, np.uint8).reshape(ph, stride)
            planes.append(a[:, :pw].astype(np.int32).copy())
        return planes, int(im.bit_depth)
    finally:
        lib.aom_codec_destroy(C.byref(ctx))
