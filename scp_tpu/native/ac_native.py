"""ctypes bindings for the native range coder."""

from __future__ import annotations

import ctypes

import numpy as np

from scp_tpu.native.build import load_library

_CONFIGURED = False


def _lib():
    global _CONFIGURED
    lib = load_library()
    if lib is None:
        return None
    if not _CONFIGURED:
        lib.ac_encode_cdf.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.ac_encode_cdf.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ac_free.restype = None
        lib.ac_free.argtypes = [ctypes.c_void_p]
        lib.ac_decoder_new.restype = ctypes.c_void_p
        lib.ac_decoder_new.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.ac_decoder_free.restype = None
        lib.ac_decoder_free.argtypes = [ctypes.c_void_p]
        lib.ac_decode_batch.restype = ctypes.c_int64
        lib.ac_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.ac_encoder_new.restype = ctypes.c_void_p
        lib.ac_encoder_new.argtypes = []
        lib.ac_encoder_append.restype = None
        lib.ac_encoder_append.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.ac_encoder_finish.restype = ctypes.c_int64
        lib.ac_encoder_finish.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ac_encoder_free.restype = None
        lib.ac_encoder_free.argtypes = [ctypes.c_void_p]
        lib.ac_encoder_append_intervals.restype = None
        lib.ac_encoder_append_intervals.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.ac_encoder_append_pdf.restype = None
        lib.ac_encoder_append_pdf.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.ac_decode_batch_pdf.restype = ctypes.c_int64
        lib.ac_decode_batch_pdf.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _CONFIGURED = True
    return lib


def available() -> bool:
    return _lib() is not None


def encode_cdf(cdf_u16: np.ndarray, syms: np.ndarray) -> bytes:
    """Encode int16 symbols against (N, Lp) uint16 quantized CDF rows."""
    lib = _lib()
    cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
    syms = np.ascontiguousarray(syms, dtype=np.int16)
    n, lp = cdf_u16.shape
    assert syms.shape == (n,)
    out_len = ctypes.c_int64(0)
    buf = lib.ac_encode_cdf(
        cdf_u16.ctypes.data_as(ctypes.c_void_p),
        n,
        lp,
        syms.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(out_len),
    )
    try:
        return ctypes.string_at(buf, out_len.value)
    finally:
        lib.ac_free(buf)


class NativeEncoder:
    """Streaming encoder: append (cdf_rows, syms) chunks, then finish()."""

    def __init__(self):
        self._lib = _lib()
        self._h = self._lib.ac_encoder_new()

    def append(self, cdf_u16: np.ndarray, syms: np.ndarray):
        cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
        syms = np.ascontiguousarray(syms, dtype=np.int16)
        m, lp = cdf_u16.shape
        self._lib.ac_encoder_append(
            self._h,
            cdf_u16.ctypes.data_as(ctypes.c_void_p),
            m,
            lp,
            syms.ctypes.data_as(ctypes.c_void_p),
        )

    def append_intervals(self, iv_u16: np.ndarray):
        """Append pre-gathered (c_low, c_high) interval pairs (m, 2) u16;
        c_high == 0 means the wrapped CDF top 2^16."""
        iv_u16 = np.ascontiguousarray(iv_u16, dtype=np.uint16)
        m = iv_u16.shape[0]
        self._lib.ac_encoder_append_intervals(
            self._h, iv_u16.ctypes.data_as(ctypes.c_void_p), m
        )

    def append_pdf(self, pdf_f32: np.ndarray, syms: np.ndarray):
        """Fused CDF quantization + encode from float32 pdf rows."""
        pdf_f32 = np.ascontiguousarray(pdf_f32, dtype=np.float32)
        syms = np.ascontiguousarray(syms, dtype=np.int16)
        m, L = pdf_f32.shape
        self._lib.ac_encoder_append_pdf(
            self._h,
            pdf_f32.ctypes.data_as(ctypes.c_void_p),
            m,
            L,
            syms.ctypes.data_as(ctypes.c_void_p),
        )

    def finish(self) -> bytes:
        n = self._lib.ac_encoder_finish(self._h, None)
        buf = ctypes.create_string_buffer(n)
        self._lib.ac_encoder_finish(self._h, buf)
        return buf.raw

    def close(self):
        if self._h:
            self._lib.ac_encoder_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeDecoder:
    """Streaming decoder: one bitstream, many batched decode calls."""

    def __init__(self, stream: bytes, n_sym: int):
        self._lib = _lib()
        self._h = self._lib.ac_decoder_new(stream, len(stream), n_sym)

    def decode_batch(self, cdf_u16: np.ndarray) -> np.ndarray:
        """Decode cdf_u16.shape[0] symbols; row i gates symbol i."""
        cdf_u16 = np.ascontiguousarray(cdf_u16, dtype=np.uint16)
        m, lp = cdf_u16.shape
        out = np.empty(m, dtype=np.int16)
        got = self._lib.ac_decode_batch(
            self._h,
            cdf_u16.ctypes.data_as(ctypes.c_void_p),
            m,
            lp,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:got]

    def decode_batch_pdf(self, pdf_f32: np.ndarray) -> np.ndarray:
        """Fused CDF quantization + decode from float32 pdf rows."""
        pdf_f32 = np.ascontiguousarray(pdf_f32, dtype=np.float32)
        m, L = pdf_f32.shape
        out = np.empty(m, dtype=np.int16)
        got = self._lib.ac_decode_batch_pdf(
            self._h,
            pdf_f32.ctypes.data_as(ctypes.c_void_p),
            m,
            L,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:got]

    def close(self):
        if self._h:
            self._lib.ac_decoder_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
