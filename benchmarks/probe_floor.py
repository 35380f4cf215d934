#!/usr/bin/env python3
"""One-process floor attribution: ablate variants + checksum-epilogue cost.

Cross-process comparisons over the tunnel are confounded by ~1.7x load
noise; this runs every variant AND an epilogue-only probe back-to-back in
one process, interleaved A/B/A so drift shows up.
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
    rows, sub_rows = PK.prepare_modern_light(payloads[0], W, H)[5]
    args = [tuple(map(jax.device_put, c[:3])) for c in chunked]

    def timeit(run, reps=4):
        int(jax.block_until_ready(run(0)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                o = run(i)
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best * 1e3

    from mcraw.kernels.checksum import device_checksum

    def make_ab(ab, fast=False):
        @functools.partial(
            jax.jit,
            static_argnames=(
                "nc", "txp", "tr_sub", "rows", "sub_rows", "ablate", "fast"
            ),
        )
        def step(
            p2d, br, meta, *, nc, txp, tr_sub, rows, sub_rows, ablate, fast
        ):
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                p2d, br, meta, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                rows=rows, sub_rows=sub_rows, ablate=ablate,
            )
            if "rawout" in ablate:
                x = img3
            else:
                x = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
            if fast:
                return device_checksum(x, interpret=False)
            return x.astype(jnp.uint32).sum()

        return lambda i: step(
            *args[i % len(args)], nc=nc, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows, ablate=ab, fast=fast,
        )

    # Epilogue probes: what does the checksum itself cost on a staged
    # out-sized array (kernel completely absent)?
    staged = jax.device_put(
        np.zeros((nc * PK.SUBGROUPS_V5 * tr_sub * 4 * 128, 128), np.uint16)
    )
    big = jax.device_put(np.zeros((3072, 4096), np.uint16))

    @jax.jit
    def sum_u32(x):
        return x.astype(jnp.uint32).sum()

    @jax.jit
    def sum_i32view(x):
        v = jax.lax.bitcast_convert_type(x.reshape(-1, 2), jnp.int32)
        return v.astype(jnp.uint32).sum()

    from mcraw.kernels.checksum import _checksum_2d

    results = {}
    order = [
        ("full", make_ab("")),
        ("full_fastsum", make_ab("", fast=True)),
        ("skeleton rawout fastsum", make_ab("skeleton rawout", fast=True)),
        ("skeleton rawout nodma fastsum",
         make_ab("skeleton rawout nodma", fast=True)),
        ("fields0 fastsum", make_ab("fields0", fast=True)),
        ("epilogue_sum_u32_2d", lambda i: sum_u32(big)),
        ("epilogue_fast_2d", lambda i: _checksum_2d(big, interpret=False)),
        ("epilogue_fast_rawshape",
         lambda i: _checksum_2d(staged, interpret=False)),
        ("full_again", make_ab("")),
        ("full_fastsum_again", make_ab("", fast=True)),
    ]
    for name, run in order:
        results[name] = round(timeit(run), 4)
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    # checksum sanity for the real kernel, both consumers
    for fast in (False, True):
        run = make_ab("", fast=fast)
        got = int(jax.block_until_ready(run(0)))
        assert got == expected[0], f"full-kernel checksum mismatch fast={fast}"
    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_floor.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
