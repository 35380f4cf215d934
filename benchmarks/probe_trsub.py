#!/usr/bin/env python3
"""Clean re-sweep of subgroup size (tr_sub via TARGET_SG_V5) at 4K.

Total subgroup iterations per frame = ty_pad / tr_sub, and the clean
skeleton probes showed ~0.39 us of per-subgroup machinery that no vector
work explains — doubling tr_sub halves it at the cost of bigger pick
matmuls/iotas. The round-2 sweep that picked tr_sub=1 used the
dispatch-polluted methodology; this one is inline-x8, distinct args,
one process.
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

    def build(target_sg, ablate=""):
        PK.TARGET_SG_V5 = target_sg
        chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
        nc, txp, tr_sub = chunked[0][3:]
        # content spans via the light prep (uses the patched knobs)
        lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
        rows = max(l[5][0] for l in lights)
        sub_rows = max(l[5][1] for l in lights)
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
                    rows=rows, sub_rows=sub_rows, ablate=ablate,
                )
                x = (
                    img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                    if not ablate
                    else img3.reshape(img3.shape[0], -1)
                )
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
            assert got == want, f"checksum tr_sub={tr_sub}"
        return fn, flat, tr_sub

    def timeit(fn, flat, iters=12, reps=4):
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

    orig = PK.TARGET_SG_V5
    results = {}
    try:
        builds = {}
        for tgt in (128, 256, 512):
            for ab in ("", "skeleton smallout"):
                fn, flat, tr_sub = build(tgt, ab)
                tag = f"tr{tr_sub}" + ("_skel" if ab else "")
                builds[tag] = (fn, flat)
                print(f"{tag} compiled (target {tgt})", flush=True)
        order = list(builds) + ["tr1", "tr2"]
        seen = set()
        for tag in order:
            key = tag if tag not in seen else tag + "_again"
            seen.add(tag)
            fn, flat = builds[tag]
            results[key] = round(timeit(fn, flat), 4)
            print(f"{key}: {results[key]:.3f} ms/frame", flush=True)
    finally:
        PK.TARGET_SG_V5 = orig

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_trsub.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
