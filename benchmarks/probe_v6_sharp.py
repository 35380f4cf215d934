#!/usr/bin/env python3
"""Sharp A/B: host-prep v5 kernel launch vs v6 device-side prep (+ an
isolated prep-only leg), post trap-#7 discipline.

An earlier per-dispatch measurement put the v6 batch path ~0.3 ms/frame
behind v5 — suspiciously equal to the harness's RTT share (timing trap #7).
This probe re-measures with the sharp pattern (inline-x8 distinct-parameter
jit, fold-checksum consumers, one amortized force, null calibration,
interleaved rounds):

  v5     — kernel only, host-built meta (the bench headline path)
  v6     — _v6_build_meta in-graph + the same kernel (what load_frame_device
           and the mesh/batch paths run)
  v6prep — _v6_build_meta alone (meta + base_rows checksummed): the true
           on-device prep cost, free of the kernel

Usage: python benchmarks/probe_v6_sharp.py [variant ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 8
ITERS = 60


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
    plans = [U.prepare_modern(p, W, H) for p in payloads[:4]]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads[:4]]
    ty, tx = lights[0][3], lights[0][4]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    nf = max(l[5][2] for l in lights)

    def consume(k, img):
        return device_checksum(img, interpret=False) + jnp.uint32(k)

    def finish(fn, flat, want=None):
        fn = jax.jit(fn)
        got = int(jax.block_until_ready(fn(*flat)))
        if want is not None:
            assert got == want, f"checksum: got {got} want {want}"
        return fn, flat

    def want_full():
        return (
            sum(expected[k % 4] for k in range(N)) + N * (N - 1) // 2
        ) % (1 << 32)

    def make_v5():
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
                    rows=rows, sub_rows=sub_rows, nfields=nf,
                )
                acc = acc + consume(
                    k, img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                )
            return acc

        return finish(xn, flat, want_full())

    def v6_args():
        argsets = [
            tuple(
                jax.device_put(np.asarray(a))
                for a in lights[k % 4][:3]
            )
            for k in range(N)
        ]
        return [x for a in argsets for x in a]

    def make_v6():
        flat = v6_args()

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                p32, bits, refs = flat_args[3 * k : 3 * k + 3]
                img = PK.decode_modern_device_v6.__wrapped__(
                    p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
                    rows=rows, sub_rows=sub_rows, nfields=nf,
                )
                acc = acc + consume(k, img)
            return acc

        return finish(xn, flat, want_full())

    def make_v6prep():
        flat = v6_args()

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                _, bits, refs = flat_args[3 * k : 3 * k + 3]
                meta, base_rows = PK._v6_build_meta(bits, refs, ty=ty, tx=tx)
                m2 = meta.reshape(-1, meta.shape[2]).astype(jnp.uint32)
                acc = (
                    acc
                    + consume(k, m2)
                    + base_rows.astype(jnp.uint32).sum()
                )
            return acc

        return finish(xn, flat)

    def make_null():
        staged = [
            jax.device_put(np.full((8, 128), k + 1, np.uint16))
            for k in range(N)
        ]

        def xn(*arrs):
            acc = jnp.uint32(0)
            for k, a in enumerate(arrs):
                acc = acc + consume(k, a)
            return acc

        return finish(xn, staged)

    MAKERS = {
        "null": make_null,
        "v5": make_v5,
        "v6": make_v6,
        "v6prep": make_v6prep,
    }

    def timeit(fn, flat):
        t0 = time.perf_counter()
        acc = None
        for _ in range(ITERS):
            o = fn(*flat)
            acc = o if acc is None else acc + o
        int(acc)
        return (time.perf_counter() - t0) / (ITERS * N) * 1e3

    names = sys.argv[1:] or ["null", "v5", "v6", "v6prep"]
    fns = {}
    failed = {}
    for v in names:
        try:
            fns[v] = MAKERS[v]()
            print(f"{v} compiled", flush=True)
        except Exception as e:  # noqa: BLE001 — keep the rest of the legs
            failed[v] = repr(e)[:300]
            print(f"{v} FAILED TO COMPILE: {failed[v]}", flush=True)
    names = [v for v in names if v in fns]

    results = {v: [] for v in names}
    for _ in range(5):  # interleaved rounds
        for v in names:
            results[v].append(round(timeit(*fns[v]), 4))
        print(results, flush=True)

    null_ms = min(results["null"]) if "null" in results else 0.0
    summary = {
        v: {"best_ms": min(r), "net_ms": round(min(r) - null_ms, 4), "raw": r}
        for v, r in results.items()
    }
    summary["_meta"] = {
        "null_ms": null_ms, "iters": ITERS, "inline_n": N,
        "geometry": [H, W], "nfields": nf, "rows": rows,
        "sub_rows": sub_rows, "failed": failed,
    }
    print(json.dumps(summary))
    tag = "_".join(names)[:48].replace(" ", "-")
    with open(f"/root/repo/benchmarks/probe_v6_sharp_{tag}.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
