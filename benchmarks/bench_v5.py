#!/usr/bin/env python3
"""TPU timing: v5 fused-deinterleave kernel vs v4 + XLA epilogue.

Checksum-gated (CLAUDE.md timing traps): outputs chained into one scalar,
forced with int(), verified against the oracle images.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
FRAMES = 4
ITERS = 90


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    imgs, payloads = make_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    results = {}

    def time_run(run, tag):
        for i in range(FRAMES):
            got = int(jax.block_until_ready(run(i)))
            assert got == expected[i], f"{tag}: checksum mismatch frame {i}"
        acc0 = run(0)
        for i in range(1, 2 * FRAMES):
            acc0 = acc0 + run(i)
        int(acc0)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                o = run(i)
                acc = o if acc is None else acc + o
            total = int(acc)
            best = min(best, (time.perf_counter() - t0) / ITERS)
            want = sum(expected[i % FRAMES] for i in range(ITERS)) % (1 << 32)
            assert total == want, f"{tag}: burst checksum mismatch"
        results[tag] = {"ms": best * 1e3, "fps": 1.0 / best}
        print(f"{tag}: {best*1e3:.3f} ms/frame = {1.0/best:.1f} fps", flush=True)

    # ---- v5 fused ----
    ch5 = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc5, txp, tr_sub = ch5[0][3], ch5[0][4], ch5[0][5]
    args5 = [tuple(map(jax.device_put, c[:3])) for c in ch5]

    @functools.partial(jax.jit, static_argnames=("nc", "txp", "tr_sub"))
    def step5(p2d, br, meta, *, nc, txp, tr_sub):
        img3 = PK._unpack_image_pallas_v5.__wrapped__(
            p2d, br, meta, num_chunks=nc, txp=txp, tr_sub=tr_sub
        )
        img = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
        return img.astype(jnp.uint32).sum()

    t0 = time.perf_counter()
    time_run(
        lambda i: step5(*args5[i % FRAMES], nc=nc5, txp=txp, tr_sub=tr_sub),
        "v5_fused",
    )
    print(f"(v5 compile+run wall: {time.perf_counter()-t0:.1f}s)", flush=True)

    # ---- v4 + XLA epilogue (current shipping path) ----
    ch4 = [PK.prepare_chunked_v4(pl) for pl in plans]
    nc4, nblk = ch4[0][3], ch4[0][4]
    args4 = [tuple(map(jax.device_put, c[:3])) for c in ch4]
    ty, tx = plans[0].tiles_y, plans[0].tiles_x

    @functools.partial(jax.jit, static_argnames=("nc", "nb"))
    def step4(p2d, br, meta, *, nc, nb):
        vals = PK._unpack_blocks_pallas_v4.__wrapped__(
            p2d, br, meta, num_chunks=nc
        )[:nb]
        im = PK._deinterleave_packed.__wrapped__(vals, ty, tx)
        return im[:H, :W].astype(jnp.uint32).sum()

    time_run(lambda i: step4(*args4[i % FRAMES], nc=nc4, nb=nblk), "v4_epilogue")

    with open("/root/repo/benchmarks/v5_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
