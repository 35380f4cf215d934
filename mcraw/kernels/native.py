"""Host-side serial scans: native C++ fast path with pure-Python fallback.

Two format-imposed serial chains run on the host (SURVEY.md §7 hard parts):
- the modern codec's metadata streams (inline 2-byte headers; ~numBlocks/64
  iterations per frame), and
- the legacy codec's whole-block header chain (~W*H/16 iterations per frame).

The C extension (native/mcraw_host.cpp, built by native/build.py) walks both
at memory speed; this module falls back to the NumPy reference when the
extension is unavailable so every feature works everywhere.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from . import numpy_ref as R
from . import tables as T
from ..errors import DecodeError

_lib = None
_lib_tried = False


def _find_ext() -> Path | None:
    env = os.environ.get("MCRAW_NATIVE_LIB")
    if env and Path(env).exists():
        return Path(env)
    root = Path(__file__).resolve().parents[2] / "native"
    try:
        # Stamp-checked: rebuilds when mcraw_host.cpp changed, no-op
        # otherwise. Keeps a stale .so from being silently preferred.
        import sys

        sys.path.insert(0, str(root.parent))
        try:
            from native.build import build
        finally:
            sys.path.pop(0)
        return build()
    except Exception as e:
        # Build unavailable (no toolchain / read-only tree). Only fall back
        # to an existing binary if its stamp matches the current source;
        # a stale .so could silently diverge from the Python reference.
        p = root / "libmcraw_host.so"
        stamp = root / ".build_stamp"
        src = root / "mcraw_host.cpp"
        if p.exists() and stamp.exists() and src.exists():
            import hashlib
            import logging

            if stamp.read_text() == hashlib.sha256(src.read_bytes()).hexdigest():
                return p
            logging.getLogger("mcraw").warning(
                "native build failed (%s) and libmcraw_host.so is stale; "
                "using the pure-Python scans", e,
            )
        return None


def get_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    path = _find_ext()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None

    lib.mcraw_metadata_scan.restype = ctypes.c_int64
    lib.mcraw_metadata_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
    ]
    lib.mcraw_legacy_scan.restype = ctypes.c_int64
    lib.mcraw_legacy_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int64),
    ]
    if hasattr(lib, "mcraw_length_segments"):
        lib.mcraw_length_segments.restype = ctypes.c_int64
        lib.mcraw_length_segments.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return get_lib() is not None


def decode_metadata_stream(data: np.ndarray, offset: int) -> tuple[np.ndarray, int]:
    """Decode one modern metadata stream. Native when available."""
    lib = get_lib()
    if lib is None:
        return R.decode_metadata_stream(data, offset)

    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = len(data)
    if offset + 4 > n:
        raise DecodeError("metadata stream header out of bounds")
    num_blocks = int(np.frombuffer(data[offset : offset + 4].tobytes(), "<u4")[0])
    if num_blocks > 64 * max(0, n - offset - 4) // 2:
        raise DecodeError("metadata stream declares impossible block count")
    groups = (num_blocks + 63) // 64
    out = np.zeros(groups * 64, dtype=np.uint16)
    end = lib.mcraw_metadata_scan(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        num_blocks,
    )
    if end < 0:
        raise DecodeError("metadata stream truncated")
    return out[:num_blocks], int(end)


def length_segments(
    bits: np.ndarray, stride: int
) -> tuple[int, np.ndarray] | None:
    """(total_payload_bytes, per-stride segment sums) for modern bits.

    One native pass replaces the NumPy lengths LUT-gather + reduceat
    (~0.8 ms/4K frame). Returns None when the extension is unavailable or
    lacks the symbol (callers fall back to NumPy).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "mcraw_length_segments"):
        return None
    bits = np.ascontiguousarray(bits, dtype=np.uint16)
    n = len(bits)
    nseg = max(0, -(-n // stride)) if stride > 0 else 0
    seg = np.empty(nseg, dtype=np.int64)
    total = lib.mcraw_length_segments(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n,
        stride,
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return int(total), seg


def legacy_scan(
    data: np.ndarray, num_blocks: int, start_offset: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Walk the legacy header chain. Native when available."""
    lib = get_lib()
    if lib is None:
        return R.legacy_scan(data, num_blocks, start_offset)

    data = np.ascontiguousarray(data, dtype=np.uint8)
    bits = np.zeros(num_blocks, dtype=np.int32)
    refs = np.zeros(num_blocks, dtype=np.uint16)
    offs = np.zeros(num_blocks, dtype=np.int64)
    end = lib.mcraw_legacy_scan(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        start_offset,
        num_blocks,
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if end < 0:
        raise DecodeError("legacy stream truncated")
    return bits, refs, offs
