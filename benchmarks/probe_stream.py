#!/usr/bin/env python3
"""Diagnose the overlapped-stream regression (0.84 fps vs 3.31 serial).

Isolates the H2D/decode interleaving patterns in ONE process with preps
precomputed, so the only variable is how device_put and step dispatches
interleave through the tunnel. Writes benchmarks/probe_stream.json.
"""

import functools
import json
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 12


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    imgs, payloads = make_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
    ty, tx = lights[0][3], lights[0][4]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)

    @functools.partial(
        jax.jit, static_argnames=("ty", "tx", "rows", "sub_rows")
    )
    def step(p32, bits, refs, *, ty, tx, rows=None, sub_rows=None):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows,
        )
        return device_checksum(im)

    def put(light):
        return tuple(jax.device_put(x) for x in light[:3])

    def run(buf):
        return step(*buf, ty=ty, tx=tx, rows=rows, sub_rows=sub_rows)

    # warm/verify
    for k in range(len(lights)):
        o = int(jax.block_until_ready(run(put(lights[k]))))
        assert o == expected[k], k

    results = {}

    def leg(name, f, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(N / best, 2)
        print(f"{name}: {results[name]} fps", flush=True)

    def check(acc):
        assert int(acc) % (1 << 32) == sum(
            expected[k % len(lights)] for k in range(N)
        ) % (1 << 32)

    # a) puts only, async, one sync at the end
    def put_only():
        bufs = [put(lights[k % len(lights)]) for k in range(N)]
        jax.block_until_ready(bufs)

    # b) fully serial: put+sync-decode per frame
    def seq_sync():
        acc = None
        for k in range(N):
            o = run(put(lights[k % len(lights)]))
            jax.block_until_ready(o)
            acc = o if acc is None else acc + o
        check(acc)

    # c) all async: puts+steps queued, single force at the end
    def seq_async():
        acc = None
        for k in range(N):
            o = run(put(lights[k % len(lights)]))
            acc = o if acc is None else acc + o
        check(acc)

    # d) deque overlap, like _stream_overlapped but without the pool
    def overlap(depth):
        acc = None
        inflight = deque()
        for k in range(N):
            inflight.append(put(lights[k % len(lights)]))
            if len(inflight) > depth:
                o = run(inflight.popleft())
                acc = o if acc is None else acc + o
        while inflight:
            o = run(inflight.popleft())
            acc = o if acc is None else acc + o
        check(acc)

    # e) the full _stream_overlapped shape incl. ThreadPool prep
    def overlap_pool():
        acc = None
        inflight = deque()
        prep = lambda k: lights[k % len(lights)]
        with ThreadPoolExecutor(max_workers=4) as pool:
            for light in pool.map(prep, range(N)):
                inflight.append(put(light))
                if len(inflight) > 3:
                    o = run(inflight.popleft())
                    acc = o if acc is None else acc + o
            while inflight:
                o = run(inflight.popleft())
                acc = o if acc is None else acc + o
        check(acc)

    leg("put_only", put_only)
    leg("seq_sync", seq_sync)
    leg("seq_async", seq_async)
    leg("overlap_d1", lambda: overlap(1))
    leg("overlap_d3", lambda: overlap(3))
    leg("overlap_d8", lambda: overlap(8))
    leg("overlap_pool_d3", overlap_pool)
    leg("seq_async_again", seq_async)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_stream.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
