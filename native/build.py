#!/usr/bin/env python3
"""Build the native host runtime (libmcraw_host.so).

Plain C ABI over ctypes — no Python headers required. Idempotent; safe to
call at import time from tooling.
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
SRC = ROOT / "mcraw_host.cpp"
OUT = ROOT / "libmcraw_host.so"
STAMP = ROOT / ".build_stamp"


def build(force: bool = False) -> Path:
    key = hashlib.sha256(SRC.read_bytes()).hexdigest()
    if not force and OUT.exists() and STAMP.exists() and STAMP.read_text() == key:
        return OUT
    # Portable baseline (not -march=native): the .so may be built on one
    # host and loaded on another; SIGILL at call time is worse than a few %.
    cmd = [
        "g++", "-std=c++17", "-O3", "-fPIC", "-shared",
        "-Wall", "-Werror",
        "-o", str(OUT), str(SRC),
    ]
    subprocess.run(cmd, check=True)
    STAMP.write_text(key)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
