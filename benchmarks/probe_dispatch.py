#!/usr/bin/env python3
"""Dispatch-floor probe: is the per-iteration benchmark floor the DEVICE
or the per-execution submission overhead (Python + tunnel)?

  tiny            one (8,128) sum per iteration — no real device work
  v5_single       the standard single-frame v5 step (current bench method)
  v5_x8_inline    ONE jit program running the v5 kernel 8x (4 distinct
                  frames, 2 rounds) and returning the summed checksums;
                  per-frame time = device truth, submission amortized 8x
  v6_batch4       the shipped batched path, 4 frames per dispatch

All in one process, interleaved, checksum-verified.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
ITERS = 60


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
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    args = [tuple(map(jax.device_put, c[:3])) for c in chunked]

    tiny = jax.device_put(np.arange(1024, dtype=np.uint32).reshape(8, 128))

    @jax.jit
    def tiny_sum(x):
        return x.sum()

    @functools.partial(
        jax.jit,
        static_argnames=("nc", "txp", "tr_sub", "rows", "sub_rows"),
    )
    def v5_step(p2d, br, meta, *, nc, txp, tr_sub, rows, sub_rows):
        img3 = PK._unpack_image_pallas_v5.__wrapped__(
            p2d, br, meta, num_chunks=nc, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows,
        )
        im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
        return im.astype(jnp.uint32).sum()

    @functools.partial(
        jax.jit,
        static_argnames=("nc", "txp", "tr_sub", "rows", "sub_rows"),
    )
    def v5_x8(a0, a1, a2, a3, *, nc, txp, tr_sub, rows, sub_rows):
        acc = jnp.uint32(0)
        for rnd in range(2):
            for a in (a0, a1, a2, a3):
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                acc = acc + im.astype(jnp.uint32).sum() + jnp.uint32(rnd)
        return acc

    # v6 batch: 4 frames, one dispatch (the shipped decode_batch path)
    rmax = max(len(l[0]) for l in lights)
    p32s = np.zeros((4, rmax), dtype=np.int32)
    for i, l in enumerate(lights):
        p32s[i, : len(l[0])] = l[0]
    bits = np.stack([l[1] for l in lights])
    refs = np.stack([l[2] for l in lights])
    ty, tx = lights[0][3], lights[0][4]
    b4 = (
        jax.device_put(p32s),
        jax.device_put(bits),
        jax.device_put(refs),
    )

    @functools.partial(
        jax.jit, static_argnames=("ty", "tx", "rows", "sub_rows")
    )
    def v6b(p32s, bits, refs, *, ty, tx, rows, sub_rows):
        im = PK.decode_modern_device_v6_batch.__wrapped__(
            p32s, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows,
        )
        return im.astype(jnp.uint32).sum()

    def timeit(run, per, iters, reps=4):
        int(jax.block_until_ready(run(0)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for i in range(iters):
                o = run(i)
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / (iters * per))
        return best * 1e3

    run_v5 = lambda i: v5_step(
        *args[i % 4], nc=nc, txp=txp, tr_sub=tr_sub,
        rows=rows, sub_rows=sub_rows,
    )
    run_x8 = lambda i: v5_x8(
        *args, nc=nc, txp=txp, tr_sub=tr_sub, rows=rows, sub_rows=sub_rows
    )
    run_v6b = lambda i: v6b(
        *b4, ty=ty, tx=tx, rows=rows, sub_rows=sub_rows
    )

    # verify
    for i in range(4):
        assert int(jax.block_until_ready(run_v5(i))) == expected[i]
    want8 = (2 * sum(expected) + 4) % (1 << 32)  # +rnd over 2x4 calls
    assert int(jax.block_until_ready(run_x8(0))) == want8
    assert int(jax.block_until_ready(run_v6b(0))) == sum(expected) % (1 << 32)

    results = {}
    order = [
        ("tiny", (lambda i: tiny_sum(tiny)), 1, 200),
        ("v5_single", run_v5, 1, ITERS),
        ("v5_x8_inline", run_x8, 8, 12),
        ("v6_batch4", run_v6b, 4, 20),
        ("tiny_again", (lambda i: tiny_sum(tiny)), 1, 200),
        ("v5_single_again", run_v5, 1, ITERS),
        ("v5_x8_inline_again", run_x8, 8, 12),
    ]
    for name, run, per, iters in order:
        results[name] = round(timeit(run, per, iters), 4)
        print(f"{name}: {results[name]:.3f} ms/frame-equiv", flush=True)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_dispatch.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
