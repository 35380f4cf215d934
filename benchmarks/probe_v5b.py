#!/usr/bin/env python3
"""v5 vs v5b (two-phase batched subgroups) at 4K, inline-x8 methodology.

One process, 8 distinct staged frames bound as distinct jit parameters
(CSE-proof, CLAUDE.md trap #5); checksum-gated. Sweeps batch_sg.
Writes benchmarks/probe_v5b.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    imgs, payloads = make_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    argsets = [
        tuple(map(jax.device_put, chunked[k % len(chunked)][:3]))
        for k in range(N)
    ]
    flat = [x for a in argsets for x in a]

    def build(variant, batch_sg=8):
        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                a = flat_args[3 * k : 3 * k + 3]
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows,
                    variant=variant, batch_sg=batch_sg,
                )
                x = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                acc = acc + device_checksum(x, interpret=False) + jnp.uint32(k)
            return acc

        fn = jax.jit(xn)
        got = int(jax.block_until_ready(fn(*flat)))
        want = (
            sum(expected[k % len(expected)] for k in range(N))
            + N * (N - 1) // 2
        ) % (1 << 32)
        assert got == want, f"checksum {variant} bs={batch_sg}"
        return fn

    def timeit(fn, iters=12, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                o = fn(*flat)
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / (iters * N))
        return round(best * 1e3, 4)

    results = {}
    builds = {"v5": build("v5")}
    print("v5 compiled", flush=True)
    for bs in (4, 8, 12, 24):
        try:
            builds[f"v5b_{bs}"] = build("v5b", bs)
            print(f"v5b bs={bs} compiled", flush=True)
        except Exception as e:
            results[f"v5b_{bs}"] = f"FAILED: {type(e).__name__}"
            print(f"v5b bs={bs} FAILED: {e}", flush=True)

    order = list(builds) + ["v5"]
    seen = set()
    for tag in order:
        key = tag if tag not in seen else tag + "_again"
        seen.add(tag)
        results[key] = timeit(builds[tag])
        print(f"{key}: {results[key]} ms/frame", flush=True)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_v5b.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
