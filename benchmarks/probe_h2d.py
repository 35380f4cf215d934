#!/usr/bin/env python3
"""Characterize the tunnel's H2D path for the sustained-streaming design.

The r2 stream bench measured 3 fps end-to-end while the one-shot H2D leg
said 1.68 GB/s (~96 fps of 16MB frames) and puts-only measured 4.42 fps —
the contradiction means per-put COST dominates, not bandwidth. This probe
separates per-put latency from bandwidth by sweeping the transfer
granularity in one process:

  put_seq_16MB     N sequential device_put(16MB), block each
  put_async_16MB   N device_puts queued, one block at the end
  put_stack_{k}    N/k puts of k frames stacked into one (k*16MB) buffer
  put_u8 vs i32    dtype/view effect at 16MB

Writes benchmarks/probe_h2d.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAME_WORDS = 4 * 1024 * 1024  # 16 MB int32 per synthetic frame
N = 12
REPS = 3


def main():
    import jax

    bufs = [
        np.arange(k, k + FRAME_WORDS, dtype=np.int32) for k in range(N)
    ]
    nbytes = bufs[0].nbytes
    results = {}

    def leg(name, fn):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        fps = N / best
        results[name] = {
            "s": round(best, 4),
            "frames_per_s": round(fps, 2),
            "gbps": round(N * nbytes / best / 1e9, 3),
        }
        print(f"{name}: {fps:.2f} fps, {N*nbytes/best/1e9:.3f} GB/s",
              flush=True)

    # warm the path
    jax.block_until_ready(jax.device_put(bufs[0]))

    def put_seq():
        outs = []
        for b in bufs:
            d = jax.device_put(b)
            jax.block_until_ready(d)
            outs.append(d)
        return outs

    def put_async():
        return [jax.device_put(b) for b in bufs]

    def put_stack(k):
        stacks = [
            np.stack(bufs[i : i + k]) for i in range(0, N, k)
        ]

        def f():
            return [jax.device_put(s) for s in stacks]

        return f

    leg("put_seq_16MB", put_seq)
    leg("put_async_16MB", put_async)
    for k in (2, 4, 6, 12):
        leg(f"put_stack_{k}x16MB", put_stack(k))
    u8 = [b.view(np.uint8) for b in bufs]
    leg("put_async_u8", lambda: [jax.device_put(b) for b in u8])

    with open("/root/repo/benchmarks/probe_h2d.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
