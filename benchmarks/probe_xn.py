#!/usr/bin/env python3
"""Inline-xN device-time probe, CSE-proof.

probe_x8.py reused the same jit parameters across rounds — XLA may CSE
identical pure custom-calls, which would fake the amortization. Here
every inline call gets its OWN jit parameter bound to its OWN device
buffer (same content cycled, distinct buffers), so no two calls are the
same SSA expression. Variants at n=4/8/16/32 map out the asymptote; the
checksum chain stays exact.
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

    def stage(k):
        # fresh device buffers each time -> distinct jit params, no CSE
        return tuple(map(jax.device_put, chunked[k % 4][:3]))

    def one(a):
        img3 = PK._unpack_image_pallas_v5.__wrapped__(
            *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows,
        )
        return img3.reshape(img3.shape[0], txp * 64)[:H, :W]

    def make_xn(n):
        argsets = [stage(k) for k in range(n)]
        flat = [x for a in argsets for x in a]

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(n):
                a = flat_args[3 * k : 3 * k + 3]
                im = one(a)
                acc = acc + device_checksum(im, interpret=False) + jnp.uint32(k)
            return acc

        fn = jax.jit(xn)
        want = (
            sum(expected[k % 4] for k in range(n)) + n * (n - 1) // 2
        ) % (1 << 32)
        assert int(jax.block_until_ready(fn(*flat))) == want, f"x{n} checksum"
        return fn, flat

    def timeit(fn, flat, per, iters, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                o = fn(*flat)
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / (iters * per))
        return best * 1e3

    results = {}
    fns = {}
    for n in (4, 8, 16, 32):
        fns[n] = make_xn(n)
        print(f"x{n} compiled+verified", flush=True)
    for n in (4, 8, 16, 32, 16, 32):
        fn, flat = fns[n]
        iters = max(4, 96 // n)
        key = f"x{n}" if f"x{n}" not in results else f"x{n}_again"
        results[key] = round(timeit(fn, flat, n, iters), 4)
        print(f"{key}: {results[key]:.3f} ms/frame", flush=True)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_xn.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
