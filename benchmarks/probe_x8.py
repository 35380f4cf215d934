#!/usr/bin/env python3
"""True device-time attribution with submission amortized 8-16x.

probe_dispatch.py established the per-execution submission overhead
through this environment's tunnel is ~0.42 ms — every single-dispatch
benchmark number since round 1 carries it. Here every variant runs N
kernel invocations inside ONE jit program:

  v5_x8_xlasum     8x v5 + XLA u16->u32 checksum per frame
  v5_x8_fastsum    8x v5 + Pallas fold checksum (true cost ~0.03 ms)
  v5_x16_fastsum   16x, tighter amortization
  skel_x8_fastsum  8x skeleton kernel (no compute) + fold checksum
  v6_x8_fastsum    8x v6 single-frame device-prep + decode + fold
  legacy_x8        8x legacy v6 decode + fold (4K legacy device time)

Checksum-verified; one process, interleaved repeats.
"""

import functools
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
    from mcraw import encode as E
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels.checksum import device_checksum

    imgs, payloads = make_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    args = [tuple(map(jax.device_put, c[:3])) for c in chunked]

    statics = dict(nc=nc, txp=txp, tr_sub=tr_sub, rows=rows, sub_rows=sub_rows)

    def one(a, ablate=""):
        img3 = PK._unpack_image_pallas_v5.__wrapped__(
            *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows, ablate=ablate,
        )
        return img3.reshape(img3.shape[0], txp * 64)[:H, :W]

    def make_xn(n, fast, ablate=""):
        @jax.jit
        def xn(a0, a1, a2, a3):
            acc = jnp.uint32(0)
            for k in range(n):
                im = one((a0, a1, a2, a3)[k % 4], ablate)
                cs = (
                    device_checksum(im, interpret=False)
                    if fast
                    else im.astype(jnp.uint32).sum()
                )
                acc = acc + cs + jnp.uint32(k)
            return acc

        return xn

    # v6 single-frame prep+decode, 8x inline
    v6in = [
        tuple(jax.device_put(np.asarray(x)) for x in l[:3]) for l in lights
    ]
    ty, tx = lights[0][3], lights[0][4]

    @jax.jit
    def v6_x8(b0, b1, b2, b3):
        acc = jnp.uint32(0)
        for k in range(8):
            im = PK.decode_modern_device_v6.__wrapped__(
                *(b0, b1, b2, b3)[k % 4], ty=ty, tx=tx, height=H, width=W,
                rows=rows, sub_rows=sub_rows,
            )
            acc = acc + device_checksum(im, interpret=False) + jnp.uint32(k)
        return acc

    # legacy 4K, 8x inline
    rngl = np.random.default_rng(5)
    limgs, llights = [], []
    for k in range(2):
        li = (
            rngl.normal(2000, 300, size=(H, W)).clip(0, 65535)
        ).astype(np.uint16)
        limgs.append(li)
        lp = np.frombuffer(E.encode_legacy(li, chunk_rows=192), np.uint8)
        llights.append(PL.prepare_legacy_light(lp, W, H))
    lrows = max(l[5] for l in llights)
    pwl = llights[0][4]
    lexp = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in limgs]
    largs = [
        tuple(jax.device_put(np.asarray(x, np.int32)) for x in l[:4])
        for l in llights
    ]

    @jax.jit
    def leg_x8(c0, c1):
        acc = jnp.uint32(0)
        for k in range(8):
            im = PL.decode_legacy_device_v6.__wrapped__(
                *(c0, c1)[k % 2], pw=pwl, h=H, width=W, rows=lrows,
            )
            acc = acc + device_checksum(im, interpret=False) + jnp.uint32(k)
        return acc

    def timeit(run, per, iters, reps=4):
        int(jax.block_until_ready(run()))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                o = run()
                acc = o if acc is None else acc + o
            int(acc)
            best = min(best, (time.perf_counter() - t0) / (iters * per))
        return best * 1e3

    x8_slow = make_xn(8, fast=False)
    x8_fast = make_xn(8, fast=True)
    x16_fast = make_xn(16, fast=True)
    skel_x8 = make_xn(8, fast=True, ablate="skeleton")

    # verify the real ones
    def extra(n):
        return n * (n - 1) // 2

    want8 = (2 * sum(expected) + extra(8)) % (1 << 32)
    want16 = (4 * sum(expected) + extra(16)) % (1 << 32)
    assert int(jax.block_until_ready(x8_slow(*args))) == want8
    assert int(jax.block_until_ready(x8_fast(*args))) == want8
    assert int(jax.block_until_ready(x16_fast(*args))) == want16
    assert int(jax.block_until_ready(v6_x8(*v6in))) == want8
    lwant = (4 * sum(lexp) + extra(8)) % (1 << 32)
    assert int(jax.block_until_ready(leg_x8(*largs))) == lwant

    results = {}
    order = [
        ("v5_x8_xlasum", lambda: x8_slow(*args), 8, 12),
        ("v5_x8_fastsum", lambda: x8_fast(*args), 8, 12),
        ("v5_x16_fastsum", lambda: x16_fast(*args), 16, 8),
        ("skel_x8_fastsum", lambda: skel_x8(*args), 8, 12),
        ("v6_x8_fastsum", lambda: v6_x8(*v6in), 8, 12),
        ("legacy_x8_fastsum", lambda: leg_x8(*largs), 8, 12),
        ("v5_x16_fastsum_again", lambda: x16_fast(*args), 16, 8),
    ]
    for name, run, per, iters in order:
        results[name] = round(timeit(run, per, iters), 4)
        print(f"{name}: {results[name]:.3f} ms/frame", flush=True)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_x8.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
