#!/usr/bin/env python3
"""A/B the v7 (2D-grid) kernel against v5 on the real chip.

Timing discipline per CLAUDE.md: chained on-device checksums forced with
one int() per burst, best-of-N bursts, correctness-gated.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mcraw.kernels.checksum import device_checksum

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, "/root/repo")
    import bench as B
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    H, W = B.H, B.W
    imgs, payloads = B.make_frames()
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    num_chunks, txp, tr_sub = chunked[0][3:]
    args = [tuple(map(jax.device_put, ch[:3])) for ch in chunked]
    spans = [PK.prepare_modern_light(p, W, H)[5] for p in payloads]
    rows = max(s[0] for s in spans)
    sub_rows = max(s[1] for s in spans)
    expected = [int(img.astype(np.int64).sum() & 0xFFFFFFFF) for img in imgs]

    def make_step(kern):
        @functools.partial(
            jax.jit,
            static_argnames=("num_chunks", "txp", "tr_sub", "rows", "sub_rows"),
        )
        def step(payload2d, base_rows, meta, *, num_chunks, txp, tr_sub,
                 rows, sub_rows):
            img3 = kern.__wrapped__(
                payload2d, base_rows, meta,
                num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
                rows=rows, sub_rows=sub_rows,
            )
            im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
            return device_checksum(im)

        return lambda i: step(
            *args[i % len(args)],
            num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows,
        )

    results = {}
    kerns = {
        "v5": PK._unpack_image_pallas_v5,
        "v7": PK._unpack_image_pallas_v7,
    }
    names = sys.argv[1:] or ["v5", "v7"]
    for name in names:
        kern = kerns[name]
        run = make_step(kern)
        t0 = time.time()
        for i in range(len(args)):
            got = int(jax.block_until_ready(run(i)))
            assert got == expected[i], f"{name} checksum mismatch frame {i}"
        print(f"{name}: compiled+verified in {time.time()-t0:.1f}s", flush=True)

        acc = run(0)
        for i in range(1, 8):
            acc = acc + run(i)
        int(acc)
        best = float("inf")
        iters = 90
        for _ in range(8):
            t0 = time.perf_counter()
            acc = None
            for i in range(iters):
                o = run(i)
                acc = o if acc is None else acc + o
            total = int(acc)
            dt = (time.perf_counter() - t0) / iters
            want = sum(expected[i % len(args)] for i in range(iters)) % (1 << 32)
            assert total == want, f"{name} burst checksum mismatch"
            best = min(best, dt)
        results[name] = {"ms": best * 1e3, "fps": 1.0 / best}
        print(f"{name}: {best*1e3:.3f} ms/frame = {1/best:.1f} fps", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
