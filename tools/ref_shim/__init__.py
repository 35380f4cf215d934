"""ctypes bindings to the compiled C++ reference decoder, for differential
tests only. Builds lazily into a cache dir; returns None when the reference
tree or a toolchain is unavailable (tests skip)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path(os.environ.get("MCRAW_REFERENCE_ROOT", "/root/reference"))
_SHIM_SRC = Path(__file__).with_name("shim.cpp")
_CACHE = Path(tempfile.gettempdir()) / "mcraw_ref_shim"

_lib = None
_lib_err: str | None = None


def _build() -> Path:
    _CACHE.mkdir(parents=True, exist_ok=True)
    so = _CACHE / "libmcrawref.so"
    srcs = [
        str(_SHIM_SRC),
        str(REFERENCE_ROOT / "lib/RawData.cpp"),
        str(REFERENCE_ROOT / "lib/RawData_Legacy.cpp"),
    ]
    stamp = so.with_suffix(".stamp")
    key = "|".join(srcs)
    if so.exists() and stamp.exists() and stamp.read_text() == key:
        return so
    cmd = [
        "g++", "-std=c++17", "-O2", "-fPIC", "-shared",
        # RawData_Legacy.cpp uses std::memset/memcpy without <cstring>.
        "-include", "cstring",
        "-I", str(REFERENCE_ROOT / "lib/include"),
        "-I", str(REFERENCE_ROOT / "thirdparty"),
        "-o", str(so), *srcs,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    stamp.write_text(key)
    return so


def get_lib():
    """Load (building if needed) the reference shim; None if unavailable."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    if not (REFERENCE_ROOT / "lib/RawData.cpp").exists():
        _lib_err = "reference tree not found"
        return None
    try:
        lib = ctypes.CDLL(str(_build()))
    except (subprocess.CalledProcessError, OSError) as e:
        _lib_err = str(e)
        return None
    for name in ("ref_decode", "ref_decode_legacy"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
        ]
    _lib = lib
    return _lib


def _call(name: str, payload: np.ndarray, width: int, height: int, out_rows: int):
    lib = get_lib()
    assert lib is not None
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    out = np.zeros((out_rows, width), dtype=np.uint16)
    n = getattr(lib, name)(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        width,
        height,
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(payload),
    )
    return n, out


def build_example() -> Path | None:
    """Compile the reference example CLI (DNG+WAV emitter) for end-to-end
    byte-parity tests. Returns the binary path or None."""
    if not (REFERENCE_ROOT / "example.cpp").exists():
        return None
    _CACHE.mkdir(parents=True, exist_ok=True)
    exe = _CACHE / "ref_example"
    srcs = [
        str(REFERENCE_ROOT / "example.cpp"),
        str(REFERENCE_ROOT / "lib/Decoder.cpp"),
        str(REFERENCE_ROOT / "lib/RawData.cpp"),
        str(REFERENCE_ROOT / "lib/RawData_Legacy.cpp"),
    ]
    stamp = exe.with_suffix(".stamp")
    key = "|".join(srcs)
    if exe.exists() and stamp.exists() and stamp.read_text() == key:
        return exe
    cmd = [
        "g++", "-std=c++17", "-O2", "-include", "cstring",
        "-I", str(REFERENCE_ROOT / "lib/include"),
        "-I", str(REFERENCE_ROOT / "thirdparty"),
        "-o", str(exe), *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError:
        return None
    stamp.write_text(key)
    return exe


def ref_decode(payload: np.ndarray, width: int, height: int):
    """Run the reference modern decoder. Returns (written_count, image).

    The output buffer is over-allocated to 4*ceil(encodedHeight/4) rows since
    the reference writes encodedHeight rows regardless of `height`
    (RawData.cpp:571-609); callers should crop.
    """
    enc_h = int(np.frombuffer(np.ascontiguousarray(payload[:16]), "<u4")[1])
    rows = max(height, 4 * ((enc_h + 3) // 4))
    return _call("ref_decode", payload, width, height, rows)


def ref_decode_legacy(payload: np.ndarray, width: int, height: int):
    return _call("ref_decode_legacy", payload, width, height, height)
