#!/usr/bin/env python3
"""Characterize the tunnel's execute<->transfer interaction (round 3).

The r2 stream bench read 3 fps end-to-end while its own H2D leg said
1.3-1.7 GB/s (~75-95 fps of these ~19 MB frames). This probe pins the
contradiction to ONE property of the axon relay:

  H2D through this tunnel runs at ~90-110 fps (apparently) ONLY BEFORE
  the process executes its first device program. After ANY execute —
  even a tiny jitted x+1 — every subsequent device_put runs at ~2-3 fps
  (~55 MB/s), with NO recovery (idle wait does not restore it).

The pre-execute rate is therefore a LAZY-STAGING artifact (the client
acks puts without a full device round trip until the device is active);
the REAL sustained H2D rate for fresh high-entropy payloads is the
post-execute one. Every end-to-end streaming number in this environment
is capped by it: interleaved put+decode, puts-then-decodes, batched
8-frame puts, and block-before-dispatch pipelines all land at 2-3 fps
(legs below), while each component alone is fast (host prep 1000+ fps,
staged-input device decode 1100+ fps).

Consequence for reading stream_results.json: `h2d_gbps` measured before
any execute is an artifact; `sustained_fps_measured_overlap` is the real
measured end-to-end rate HERE, and the co-located sustained estimate is
min(host_prep, device_fps) — the tunnel has no analogue on a real TPU
host (PCIe does not degrade after kernel launches).

Writes benchmarks/probe_overlap.json.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

H, W = 3072, 4096
N = 24


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench_stream as BS
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum
    from mcraw.pipeline import Decoder

    tmp = tempfile.mkdtemp(prefix="mcraw_probe_overlap_")
    clip = os.path.join(tmp, "c.mcraw")
    imgs = BS.make_clip(clip, codec=7)
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs[:4]]
    d = Decoder(clip, backend="jax")
    frames = d.frames

    def prep(ts):
        payload, window, meta = d._reader.frame_payload_window(ts)
        return PK.prepare_modern_light(payload, W, H, window=window)

    lights = [prep(ts) for ts in frames[:4]]
    results = {}

    def put_n(tag):
        t0 = time.perf_counter()
        outs = [jax.device_put(lights[i % 4][0]) for i in range(N)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        results[tag] = round(N / dt, 2)
        print(f"{tag}: {N/dt:.2f} fps", flush=True)

    jax.block_until_ready(jax.device_put(lights[0][0]))
    put_n("puts_before_any_execute")

    tiny = jax.jit(lambda x: x + 1)
    int(jax.block_until_ready(tiny(jnp.zeros((8, 128), jnp.int32))).sum())
    put_n("puts_after_tiny_execute")

    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    nf = max(l[5][2] for l in lights)
    geo = (lights[0][3], lights[0][4])

    @jax.jit
    def step(p32, bits, refs):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=geo[0], tx=geo[1], height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        return device_checksum(im)

    s0 = tuple(jax.device_put(x) for x in lights[0][:3])
    assert int(jax.block_until_ready(step(*s0))) == expected[0]
    put_n("puts_after_decode_execute")

    # End-to-end orderings (all post-execute, all checksum-forced once).
    def run_e2e(tag, order):
        t0 = time.perf_counter()
        acc = None
        if order == "interleaved":
            for i in range(N):
                bufs = tuple(jax.device_put(x) for x in lights[i % 4][:3])
                o = step(*bufs)
                acc = o if acc is None else acc + o
        else:  # phase-separated
            allb = [
                tuple(jax.device_put(x) for x in lights[i % 4][:3])
                for i in range(N)
            ]
            for b in allb:
                o = step(*b)
                acc = o if acc is None else acc + o
        total = int(acc)
        dt = time.perf_counter() - t0
        assert total == sum(expected[i % 4] for i in range(N)) % (1 << 32)
        results[tag] = round(N / dt, 2)
        print(f"{tag}: {N/dt:.2f} fps", flush=True)

    run_e2e("e2e_put_decode_interleaved", "interleaved")
    run_e2e("e2e_puts_then_decodes", "phased")

    with open("/root/repo/benchmarks/probe_overlap.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
