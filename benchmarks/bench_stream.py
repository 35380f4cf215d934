#!/usr/bin/env python3
"""End-to-end streaming measurements on a real container file.

bench.py's headline number is device decode throughput with inputs staged in
HBM. Sustained whole-clip streaming adds three more legs, each measured
separately here because this build environment's TPU is behind a network
tunnel whose host<->device link (~tens of MB/s) is ~1000x slower than a real
TPU host's PCIe — the measured end-to-end stream rate is therefore
tunnel-bound and reported as such, alongside the per-leg rates that
determine sustained throughput on co-located hardware:

  host_prep_fps     threaded parse+plan+chunk rate (no device work)
  h2d_gbps          payload upload bandwidth through this link
  device_fps        decode rate with staged inputs (bench.py's method)
  stream_fps        measured end-to-end on this hardware (tunnel-bound)
  sustained_model   min(host_prep_fps, device_fps, h2d-implied fps)

Writes benchmarks/stream_results.json. Checksum-verified throughout.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
UNIQUE = 4
FRAMES = 24  # enough to amortize; the tunnel makes big clips impractical


def make_clip(path):
    from bench import make_frames
    from mcraw import encode as E
    from mcraw.metadata import example_container_metadata, example_frame_metadata

    imgs, payloads = make_frames()
    writer = E.ContainerWriter(example_container_metadata())
    for i in range(FRAMES):
        writer.add_frame(
            1000 + 33 * i,
            payloads[i % UNIQUE].tobytes(),
            example_frame_metadata(W, H, 7),
        )
    writer.add_audio(np.zeros(2048, np.int16), 0)
    with open(path, "wb") as f:
        f.write(writer.finish())
    return imgs


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mcraw.kernels import pallas_unpack as PK
    from mcraw.pipeline import Decoder

    tmp = tempfile.mkdtemp(prefix="mcraw_stream_")
    clip = os.path.join(tmp, "clip.mcraw")
    imgs = make_clip(clip)
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    results = {"frames": FRAMES, "shape": [H, W],
               "clip_gb": round(os.path.getsize(clip) / 1e9, 3)}

    d = Decoder(clip, backend="jax")
    frames = d.frames

    # v6 path: host = serial scans only; offsets/meta built on-device.
    @functools.partial(
        jax.jit, static_argnames=("ty", "tx", "rows", "sub_rows")
    )
    def step(p32, bits, refs, *, ty, tx, rows=None, sub_rows=None):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows,
        )
        return im.astype(jnp.uint32).sum()

    def prep_host(ts):
        payload, window, meta = d._reader.frame_payload_window(ts)
        return PK.prepare_modern_light(payload, W, H, window=window)

    def prep_device(ts):
        p32, bits, refs, ty, tx, spans = prep_host(ts)
        return (
            jax.device_put(p32), jax.device_put(bits), jax.device_put(refs),
            ty, tx, spans,
        )

    # --- leg 1: host prep rate (threaded, no device) ---------------------
    for workers in (1, 4, 8):
        best = float("inf")
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(prep_host, frames[:4]))  # warm caches
            for _ in range(3):  # best-of-3: host load here swings 2x+
                t0 = time.perf_counter()
                list(pool.map(prep_host, frames))
                best = min(best, time.perf_counter() - t0)
        results[f"host_prep_fps_w{workers}"] = round(FRAMES / best, 1)
        print(f"host prep x{workers}: {FRAMES/best:.1f} fps", flush=True)

    # --- leg 2: H2D bandwidth through this link ---------------------------
    light = prep_host(frames[0])
    nbytes = light[0].nbytes + light[1].nbytes + light[2].nbytes
    dt = float("inf")
    for _ in range(3):  # best-of-3 single transfers (tunnel load varies)
        t0 = time.perf_counter()
        a = tuple(jax.device_put(x) for x in light[:3])
        jax.block_until_ready(a)
        dt = min(dt, time.perf_counter() - t0)
    results["h2d_gbps"] = round(nbytes / dt / 1e9, 4)
    results["h2d_fps_implied"] = round(1.0 / dt, 2)
    print(f"H2D: {nbytes/dt/1e9:.3f} GB/s -> {1.0/dt:.2f} frames/s", flush=True)

    # --- leg 3: device rate with staged inputs (bench.py's method) -------
    staged = [prep_device(ts) for ts in frames[:UNIQUE]]
    for a in staged:
        jax.block_until_ready(a[:3])
    rows = max(a[5][0] for a in staged)
    sub_rows = max(a[5][1] for a in staged)
    run = lambda i: step(*staged[i % UNIQUE][:3], ty=staged[0][3],
                         tx=staged[0][4], rows=rows, sub_rows=sub_rows)
    for i in range(UNIQUE):
        assert int(jax.block_until_ready(run(i))) == expected[i]
    iters = 90
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            o = run(i)
            acc = o if acc is None else acc + o
        total = int(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
        assert total == sum(expected[i % UNIQUE] for i in range(iters)) % (1 << 32)
    results["device_fps"] = round(1.0 / best, 1)
    print(f"device (staged): {1.0/best:.1f} fps", flush=True)

    # --- leg 4: measured end-to-end stream on this hardware --------------
    acc = None
    with ThreadPoolExecutor(max_workers=4) as pool:
        t0 = time.perf_counter()
        for a in pool.map(prep_device, frames):
            o = step(*a[:3], ty=a[3], tx=a[4], rows=rows, sub_rows=sub_rows)
            acc = o if acc is None else acc + o
        total = int(acc)
        dt = time.perf_counter() - t0
    assert total == sum(expected[i % UNIQUE] for i in range(FRAMES)) % (1 << 32)
    results["stream_fps_measured"] = round(FRAMES / dt, 2)
    print(f"stream (this hardware, tunnel-bound): {FRAMES/dt:.2f} fps", flush=True)

    # --- model: what binds sustained throughput where ---------------------
    results["sustained_model"] = {
        "this_env": min(
            results["host_prep_fps_w8"],
            results["device_fps"],
            results["h2d_fps_implied"],
        ),
        "colocated_host_note": (
            "on a co-located TPU host (PCIe >= 16 GB/s, >1000 fps H2D for "
            "these ~16MB frames) sustained = min(host_prep, device_fps)"
        ),
        "colocated_est_fps": min(
            results["host_prep_fps_w8"], results["device_fps"]
        ),
    }
    with open("/root/repo/benchmarks/stream_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
