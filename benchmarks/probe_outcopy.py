#!/usr/bin/env python3
"""Is the v5 structural floor the Mosaic out-block copy stream?

CSE-proof inline-x8 (8 distinct parameter sets) per variant, one process:

  full            the real kernel (reference point)
  skeleton        DMA + loop + full-size slab stores, no compute
  skeleton smallout  same but the out block is (8,128)/chunk — if the
                  floor collapses, the VMEM->HBM out copy is the floor
  skeleton nodma smallout  loop machinery alone
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096


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
    nf = max(l[5][2] for l in lights)

    N = 8

    def make_xn(ablate):
        argsets = [
            tuple(map(jax.device_put, chunked[k % 4][:3])) for k in range(N)
        ]
        flat = [x for a in argsets for x in a]

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                a = flat_args[3 * k : 3 * k + 3]
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows, nfields=nf, ablate=ablate,
                )
                if not ablate:
                    x = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                else:
                    # flatten to 2D so every variant gets the same fold
                    x = img3.reshape(img3.shape[0], -1)
                acc = (
                    acc + device_checksum(x, interpret=False) + jnp.uint32(k)
                )
            return acc

        fn = jax.jit(xn)
        got = int(jax.block_until_ready(fn(*flat)))
        if not ablate:
            want = (
                sum(expected[k % 4] for k in range(N)) + N * (N - 1) // 2
            ) % (1 << 32)
            assert got == want, "full checksum"
        return fn, flat

    def timeit(fn, flat, iters=60, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                o = fn(*flat)
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / (iters * N))
        return best * 1e3

    variants = sys.argv[1:] or [
        "full", "skeleton", "skeleton smallout",
        "skeleton nodma smallout", "full_again",
    ]
    fns = {}
    for v in variants:
        ab = "" if v.startswith("full") else v
        if v not in fns:
            fns[v] = make_xn(ab)
        print(f"{v} compiled", flush=True)
    results = {}
    for v in variants:
        fn, flat = fns[v]
        results[v] = round(timeit(fn, flat), 4)
        print(f"{v}: {results[v]:.3f} ms/frame", flush=True)

    print(json.dumps(results))
    tag = "_".join(sys.argv[1:])[:40].replace(" ", "-") or "default"
    with open(f"/root/repo/benchmarks/probe_outcopy_{tag}.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
