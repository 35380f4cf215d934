#!/usr/bin/env python3
"""A/B the flat-2D out block (2 full-sublane stores/subgroup) vs the
legacy 3D block (4 sliced 64-lane stores). CSE-proof inline-x8 (8
distinct device buffers), one process, interleaved repeats, checksums.
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

    def make_xn(**kw):
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
                    rows=rows, sub_rows=sub_rows, nfields=nf, **kw,
                )
                if kw.get("ablate"):
                    x = img3.reshape(img3.shape[0], -1)
                else:
                    x = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                acc = (
                    acc + device_checksum(x, interpret=False) + jnp.uint32(k)
                )
            return acc

        fn = jax.jit(xn)
        got = int(jax.block_until_ready(fn(*flat)))
        if not kw.get("ablate"):
            want = (
                sum(expected[k % 4] for k in range(N)) + N * (N - 1) // 2
            ) % (1 << 32)
            assert got == want, f"checksum {kw}"
        return fn, flat

    def timeit(fn, flat, iters=60):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = fn(*flat)
            acc = o if acc is None else acc + o
        int(acc)
        return (time.perf_counter() - t0) / (iters * N) * 1e3

    def make_null():
        # No pallas call at all: 8 distinct staged (8, 128) arrays, fold
        # checksum + acc each — the inline harness's own per-frame cost.
        staged = [
            jax.device_put(np.full((8, 128), k + 1, np.uint16))
            for k in range(N)
        ]
        def xn(*arrs):
            acc = jnp.uint32(0)
            for k, a in enumerate(arrs):
                acc = acc + device_checksum(a, interpret=False) + jnp.uint32(k)
            return acc
        fn = jax.jit(xn)
        int(jax.block_until_ready(fn(*staged)))
        return fn, staged

    variant_kw = {
        "flat": dict(flat_out=True),
        "legacy": dict(flat_out=False),
        "chunkmt": dict(flat_out=True, chunk_mt=True),
        "empty": dict(flat_out=True, ablate="empty smallout"),
        "wide": dict(flat_out=True, wide_store=1),
        "wide1": dict(flat_out=True, wide_store=2),
        "cdesc": dict(flat_out=True, chunk_desc=True),
    }
    names = sys.argv[1:] or ["flat", "legacy"]
    fns = {
        v: (make_null() if v == "null" else make_xn(**variant_kw[v]))
        for v in names
    }
    print("compiled", flush=True)
    results = {v: [] for v in names}
    for _ in range(5):  # interleaved A/B
        for v in names:
            results[v].append(round(timeit(*fns[v]), 4))
        print(results, flush=True)
    summary = {k: min(v) for k, v in results.items()}
    summary["raw"] = results
    print(json.dumps(summary))
    tag = "_".join(names) or "default"
    with open(f"/root/repo/benchmarks/probe_store2_{tag}.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
