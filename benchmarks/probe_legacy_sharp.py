#!/usr/bin/env python3
"""Sharp legacy-codec device-time decomposition (post trap-#7).

Same discipline as ablate_sharp/probe_v6_sharp (inline-x8 distinct-param
jit, fold checksums, one amortized force, null leg, interleaved rounds),
legacy 4K legs:

  lv5     — fused legacy kernel, host-built meta (prepare_chunked_legacy_v5)
  lv6     — device-side meta layout (decode_legacy_device_v6)
  lv6prep — the device meta build alone (reshapes; should be ~free)

Usage: python benchmarks/probe_legacy_sharp.py [variant ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 8
ITERS = 60


def make_legacy_frames():
    import os

    from bench import make_frames

    cache = f"/root/.cache/mcraw_bench_legacy_{H}x{W}_4.npz"
    try:
        z = np.load(cache)
        return (
            [z[f"img{k}"] for k in range(4)],
            [z[f"pay{k}"] for k in range(4)],
        )
    except Exception:
        pass
    from mcraw import encode as E

    imgs = make_frames()[0][:4]
    payloads = [
        np.frombuffer(E.encode_legacy(im), dtype=np.uint8) for im in imgs
    ]
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp.npz"
        np.savez(
            tmp[:-4],
            **{f"img{k}": imgs[k] for k in range(4)},
            **{f"pay{k}": payloads[k] for k in range(4)},
        )
        os.replace(tmp, cache)
    except Exception:
        pass
    return imgs, payloads


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import unpack as U
    from mcraw.kernels.checksum import device_checksum

    imgs, payloads = make_legacy_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_legacy(p, W, H) for p in payloads]
    chunked = [PL.prepare_chunked_legacy_v5(pl) for pl in plans]
    nc, segs = chunked[0][3], chunked[0][4]
    lrows = max(c[5] for c in chunked)
    lights = [PL.prepare_legacy_light(p, W, H) for p in payloads]
    assert all(l is not None for l in lights)
    pw = lights[0][4]
    v6rows = max(l[5] for l in lights)

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

    def make_lv5(plane_mode="halves", meta_mode="bytedot", ablate=None):
        argsets = [
            tuple(map(jax.device_put, chunked[k % 4][:3])) for k in range(N)
        ]
        flat = [x for a in argsets for x in a]

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                a = flat_args[3 * k : 3 * k + 3]
                out = PL._unpack_legacy_pallas_v5.__wrapped__(
                    *a, num_chunks=nc, rows=lrows, plane_mode=plane_mode,
                    meta_mode=meta_mode, ablate=ablate,
                )
                im = out[: H * segs].reshape(H, segs * 128)[:, :W]
                acc = acc + consume(k, im)
            return acc

        return finish(xn, flat, want_full() if ablate is None else None)

    def v6_args():
        argsets = [
            tuple(
                jax.device_put(np.asarray(x, np.int32))
                for x in lights[k % 4][:4]
            )
            for k in range(N)
        ]
        return [x for a in argsets for x in a]

    def make_lv6(plane_mode="halves", ablate=None, sub=None, meta_dot=True,
                 m24=False, meta_mode="bytedot"):
        # m24 now defaults False to match decode_legacy_device_v6's shipped
        # default (the device (b,24) concat was rejected; lv6m24 pins it).
        flat = v6_args()

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                p32, offs, bits, refs = flat_args[4 * k : 4 * k + 4]
                im = PL.decode_legacy_device_v6.__wrapped__(
                    p32, offs, bits, refs, pw=pw, h=H, width=W, rows=v6rows,
                    plane_mode=plane_mode, ablate=ablate, sub=sub,
                    meta_dot=meta_dot, m24=m24, meta_mode=meta_mode,
                )
                acc = acc + consume(k, im)
            return acc

        return finish(xn, flat, want_full() if ablate is None else None)

    def make_lv6prep():
        flat = v6_args()

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(N):
                _, offs, bits, refs = flat_args[4 * k : 4 * k + 4]
                base, o3, c3, r3 = PL._v6_legacy_build(
                    offs, bits, refs, pw=pw, h=H
                )
                for a in (base, o3, c3, r3):
                    acc = acc + a.astype(jnp.uint32).sum()
                acc = acc + jnp.uint32(k)
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
        "lv5": make_lv5,
        "lv6": make_lv6,
        "lv6prep": make_lv6prep,
        "lv5bytes": lambda: make_lv5("bytes"),
        "lv6bytes": lambda: make_lv6("bytes"),
        "lv5packed": lambda: make_lv5("packed"),
        "lv6packed": lambda: make_lv6("packed"),
        "lv5packed2": lambda: make_lv5("packed2"),
        "lv6packed2": lambda: make_lv6("packed2"),
        # v5-body attribution on the packed+meta-dot base (r3): stage-drop
        # legs (wrong output, no checksum) + exact meta-structure A/Bs.
        "lv5onedot": lambda: make_lv5("packed", meta_mode="onedot"),
        "lv5dot3": lambda: make_lv5("packed", meta_mode="dot3"),
        "lv6dot3": lambda: make_lv6("packed", meta_mode="dot3"),
        "lv6m24": lambda: make_lv6("packed", m24=True),
        # lane-major (nc, 24, b) DENSE device meta -> v5 kernel with one
        # in-kernel transpose (kills the minor-dim-8 padded materialize)
        "lv6lm": lambda: make_lv6("packed", m24="lanes"),
        "lv5merged": lambda: make_lv5("packed", ablate="merged"),
        "lv5nometa": lambda: make_lv5("packed", ablate="nometa"),
        "lv5noswap": lambda: make_lv5("packed", ablate="noswap"),
        "lv5oneg": lambda: make_lv5("packed", ablate="oneg"),
        # Stage-drop legs (wrong output, no checksum gate): packed base.
        "lv6merged": lambda: make_lv6("packed", ablate="merged"),
        "lv6nometa": lambda: make_lv6("packed", ablate="nometa"),
        "lv6noswap": lambda: make_lv6("packed", ablate="noswap"),
        "lv6oneg": lambda: make_lv6("packed", ablate="oneg"),
        # Structural A/Bs (all exact, checksum-gated): meta lane-expansion
        # dot (now default) vs the r2 widen8+gather path; subgrouped picks.
        "lv6widen": lambda: make_lv6("packed", meta_dot=False, m24=False),
        # 3-block-input v6 kernel (pre-m24) vs the m24 default (v5 kernel
        # fed by the device-built (b,24) meta).
        "lv6blocks": lambda: make_lv6("packed", m24=False),
        "lv6sub32": lambda: make_lv6("packed", sub=32),
        "lv6sub64": lambda: make_lv6("packed", sub=64),
        "lv6sub128": lambda: make_lv6("packed", sub=128),
        "lv6sub64bytes": lambda: make_lv6("bytes", sub=64),
        "lv6sub64merged": lambda: make_lv6("packed", sub=64, ablate="merged"),
    }

    def timeit(fn, flat):
        t0 = time.perf_counter()
        acc = None
        for _ in range(ITERS):
            o = fn(*flat)
            acc = o if acc is None else acc + o
        int(acc)
        return (time.perf_counter() - t0) / (ITERS * N) * 1e3

    names = sys.argv[1:] or ["null", "lv5", "lv6"]
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
    for _ in range(5):
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
        "geometry": [H, W], "rows_v5": lrows, "rows_v6": v6rows, "failed": failed,
    }
    print(json.dumps(summary))
    tag = "_".join(names)[:48].replace(" ", "-")
    with open(
        f"/root/repo/benchmarks/probe_legacy_sharp_{tag}.json", "w"
    ) as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
