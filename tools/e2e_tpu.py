#!/usr/bin/env python3
"""End-to-end CLI-on-TPU byte parity: the FULL stack on real silicon.

hw_parity.py certifies the kernels (device checksum vs oracle);
tests/ certify the CLI byte-for-byte on CPU. This closes the remaining
integration gap: `python -m mcraw decode --backend jax --kernel pallas`
run from /root/repo (the axon plugin's required cwd) on a synthetic
clip, with every emitted file byte-compared against the compiled
reference example. Tiny geometry keeps the frame D2H under the tunnel's
post-execute H2D/D2H collapse (CLAUDE.md trap #8).

First run r5 (2026-08-21): codec 7 and codec 6, 4 files each,
byte-exact.

Usage: python tools/e2e_tpu.py  (exit 0 = byte-exact)
"""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = str(Path(__file__).resolve().parents[1])


def main() -> int:
    from tools import ref_shim

    ref_exe = ref_shim.build_example()
    assert ref_exe, "reference example unavailable"

    d = tempfile.mkdtemp(prefix="mcraw_e2e_")
    # APPEND to PYTHONPATH: the axon TPU plugin loads from a site dir
    # already on it (overwriting breaks backend registration).
    env = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    for codec in (7, 6):
        clip = os.path.join(d, f"clip{codec}.mcraw")
        subprocess.run(
            [sys.executable, "-m", "mcraw", "encode", clip,
             "--frames", "3", "--width", "320", "--height", "96",
             "--codec", str(codec)],
            check=True, cwd=REPO, env=env, capture_output=True,
            timeout=300,
        )
        refdir = os.path.join(d, f"ref{codec}")
        os.makedirs(refdir)
        subprocess.run(
            [ref_exe, clip], check=True, cwd=refdir,
            capture_output=True, timeout=300,
        )
        out = os.path.join(d, f"tpu{codec}")
        os.makedirs(out)
        r = subprocess.run(
            [sys.executable, "-m", "mcraw", "decode", clip,
             "--backend", "jax", "--kernel", "pallas",
             "--output-dir", out],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=900,
        )
        if r.returncode != 0:
            print(f"codec {codec}: decode failed rc={r.returncode}\n"
                  f"{r.stderr[-500:]}")
            return 1
        names = sorted(os.listdir(refdir))
        for n in names:
            a = Path(refdir, n).read_bytes()
            b = Path(out, n).read_bytes()
            if a != b:
                print(f"codec {codec}: {n} DIFFERS")
                return 1
        print(f"codec {codec}: {len(names)} files byte-exact on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
