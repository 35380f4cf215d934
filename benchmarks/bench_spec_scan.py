#!/usr/bin/env python3
"""Speculative legacy scan: pass-count + wall evidence (VERDICT r3 #6).

This box exposes ONE 2.1 GHz vCPU, so wall-clock parallel speedup is not
measurable here (CLAUDE.md: judge host work by pass counts, not ms). The
meaningful metrics for a K-core host:

  - critical-path bytes: the longest single-thread scan = segment bytes +
    overscan window (+ any serial rescans) vs the serial scan's full
    payload walk — the wall-time bound on a real multicore host;
  - overhead fraction: total extra bytes scanned (overscan windows +
    non-convergence rescans) / payload — the efficiency cost of
    speculation;
  - splice vs rescan counts per content class.

Writes benchmarks/spec_scan_results.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from mcraw import encode as E
    from mcraw.kernels import native as N
    from mcraw.kernels import numpy_ref as R

    assert N.get_lib() is not None
    rng = np.random.default_rng(11)
    h, w = 3072, 4096
    nblk = h * (R.legacy_padded_width(w) // 32) * 2
    window = 4096
    results = {}
    for name, hi in (("lo6", 1 << 6), ("mid12", 1 << 12), ("full16", 1 << 16)):
        img = rng.integers(0, hi, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(
            E.encode_legacy(img, add_offset_table=False), dtype=np.uint8
        )
        t0 = time.perf_counter()
        ser = N.legacy_scan(payload, nblk)
        t_ser = time.perf_counter() - t0
        for nseg in (4, 16):
            stats = {}
            t0 = time.perf_counter()
            spec = N.legacy_scan_speculative(
                payload, nblk, nseg=nseg, window=window, stats=stats
            )
            t_spec = time.perf_counter() - t0
            assert spec is not None
            for a, b in zip(ser, spec):
                assert np.array_equal(
                    np.asarray(a, np.int64), np.asarray(b, np.int64)
                )
            n = len(payload)
            seg = n // nseg
            # Each of the nseg threads scans its segment + the overscan
            # window; non-converged segments are rescanned serially on
            # the stitch path (critical path grows by the rescan bytes).
            rescan_bytes = stats["rescanned"] * (seg + window)
            crit = seg + window + rescan_bytes
            results[f"{name}_nseg{nseg}"] = {
                "payload_mb": round(n / 1e6, 2),
                "blocks": nblk,
                "spliced": stats["spliced"],
                "rescanned": stats["rescanned"],
                "splice_bytes": stats["splice_bytes"],
                "critical_path_frac": round(crit / n, 4),
                "overhead_frac": round(
                    (nseg * window + rescan_bytes) / n, 4
                ),
                "serial_ms_1vcpu": round(t_ser * 1e3, 2),
                "speculative_ms_1vcpu": round(t_spec * 1e3, 2),
            }
            print(name, nseg, results[f"{name}_nseg{nseg}"], flush=True)

    out = Path(__file__).with_name("spec_scan_results.json")
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
