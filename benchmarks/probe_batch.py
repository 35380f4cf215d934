#!/usr/bin/env python3
"""Does ONE pallas launch over stacked frames beat N separate launches?

Every pallas_call drains its pipeline at the program boundary (DMA
prologue, final out-copy epilogue); a stacked launch (stack_chunked_v5:
F frames = F*nc chunks, one grid) keeps the double-buffered pipeline hot
across frame boundaries. In-process, CSE-proof, fold-checksum consumers.

  sep_x8      8 separate pallas_calls inside one jit (the probe baseline)
  stack8      ONE pallas_call over 8 stacked frames
  stack16     ONE pallas_call over 16 stacked frames
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

    # separate-launch baseline (8 distinct argsets)
    argsets = [
        tuple(map(jax.device_put, chunked[k % 4][:3])) for k in range(8)
    ]
    flat8 = [x for a in argsets for x in a]

    def sep(*flat_args):
        acc = jnp.uint32(0)
        for k in range(8):
            a = flat_args[3 * k : 3 * k + 3]
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                *a, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                rows=rows, sub_rows=sub_rows,
            )
            im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
            acc = acc + device_checksum(im, interpret=False) + jnp.uint32(k)
        return acc

    sep_fn = jax.jit(sep)
    want8 = (
        sum(expected[k % 4] for k in range(8)) + 28
    ) % (1 << 32)
    assert int(jax.block_until_ready(sep_fn(*flat8))) == want8

    # stacked launches
    def make_stack(f):
        p2d, br, meta, nck, txp2, tr2 = PK.stack_chunked_v5(
            [plans[k % 4] for k in range(f)]
        )
        args = tuple(map(jax.device_put, (p2d, br, meta)))

        def st(p2d, br, meta):
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                p2d, br, meta, num_chunks=nck, txp=txp2, tr_sub=tr2,
                rows=rows, sub_rows=sub_rows,
            )
            # At 4K there are no padded tail rows or dummy columns, so the
            # flat 2D view IS the f stacked frames — free reshape, and the
            # fold checksum equals the sum of per-frame checksums.
            return device_checksum(
                img3.reshape(img3.shape[0], txp2 * 64), interpret=False
            )

        fn = jax.jit(st)
        want = sum(expected[k % 4] for k in range(f)) % (1 << 32)
        assert int(jax.block_until_ready(fn(*args))) == want, f"stack{f}"
        return fn, args

    st8, a8 = make_stack(8)
    st16, a16 = make_stack(16)
    print("compiled", flush=True)

    results = {}
    for name, fn, flat, per, iters in [
        ("sep_x8", sep_fn, flat8, 8, 12),
        ("stack8", st8, a8, 8, 12),
        ("stack16", st16, a16, 16, 6),
        ("sep_x8_again", sep_fn, flat8, 8, 12),
        ("stack16_again", st16, a16, 16, 6),
    ]:
        results[name] = round(timeit(fn, flat, per, iters), 4)
        print(f"{name}: {results[name]:.3f} ms/frame", flush=True)

    print(json.dumps(results))
    with open("/root/repo/benchmarks/probe_batch.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
