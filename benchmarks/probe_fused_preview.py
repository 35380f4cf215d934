#!/usr/bin/env python3
"""Fused decode->develop attribution (VERDICT r4 #5): the official
decode_develop_fps leg (778.7 r4) undershot the projection from its
parts (v6 decode ~0.78 + develop net ~0.40 => ~1.18 ms => ~850 fps).
This probe measures, interleaved IN ONE PROCESS with the sharp
discipline (traps #5/#6/#7: distinct-arg inline-xN, null calibration,
amortized force):

  null   harness floor
  dec    v6 decode only (inline x2, the preview leg's n)
  dev    develop only, staged raw input (inline x2)
  fused  decode + develop in one program (the official leg's body)

fused - dec - dev (all net of null) is the true fusion overhead — if
~0, the r4 gap was cross-process comparison error (trap #6), not a
regression; if material, it's the HBM round trip of the intermediate
image or lost overlap.

Usage: python benchmarks/probe_fused_preview.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 2  # develop inline cap: the remote-compile helper dies at >= 4
ITERS = 120
ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import pallas_develop as PD
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    imgs, payloads = make_frames()
    cfa = (0, 1, 1, 2)
    params = jnp.asarray(
        PD.pack_develop_params(
            np.zeros(4, np.float32), 4095.0, np.ones(3, np.float32),
            np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
        )
    )
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads[:N]]
    spans = [l[5] for l in lights]
    rows = max(s[0] for s in spans)
    sub_rows = max(s[1] for s in spans)
    nf = max(s[2] for s in spans)
    ty, tx = lights[0][3], lights[0][4]
    rmax = max(len(l[0]) for l in lights)
    argsets = [
        (
            jax.device_put(np.pad(lights[k][0], (0, rmax - len(lights[k][0])))),
            jax.device_put(lights[k][1]),
            jax.device_put(lights[k][2]),
            params,
        )
        for k in range(N)
    ]
    staged = [jax.device_put(imgs[k]) for k in range(N)]

    def dec(p32, bits, refs):
        return PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )

    def dev(im, prm):
        return PD.develop_rgba_pallas.__wrapped__(
            im, prm, None, height=H, width=W, cfa=cfa
        )

    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs[:N]]

    def make(kind):
        if kind == "null":
            arrs = [
                jax.device_put(np.full((8, 128), k + 1, np.uint16))
                for k in range(N)
            ]

            def xn(*a):
                acc = jnp.uint32(0)
                for k, x in enumerate(a):
                    acc = acc + device_checksum(x, interpret=False)
                return acc

            fn = jax.jit(xn)
            int(jax.block_until_ready(fn(*arrs)))
            return fn, arrs, None
        if kind == "dec":
            flat = [x for a in argsets for x in a[:3]]

            def xn(*fa):
                acc = jnp.uint32(0)
                for k in range(N):
                    im = dec(*fa[3 * k: 3 * k + 3])
                    acc = acc + device_checksum(im, interpret=False)
                return acc

            want = sum(expected) % (1 << 32)
            return jax.jit(xn), flat, want
        if kind == "dev":
            flat = list(staged) + [params]

            def xn(*fa):
                acc = jnp.uint32(0)
                for k in range(N):
                    acc = acc + device_checksum(
                        dev(fa[k], fa[N]), interpret=False
                    )
                return acc

            return jax.jit(xn), flat, None  # gated vs fused below
        if kind == "fused":
            flat = [x for a in argsets for x in a]

            def xn(*fa):
                acc = jnp.uint32(0)
                for k in range(N):
                    p32, bits, refs, prm = fa[4 * k: 4 * k + 4]
                    acc = acc + device_checksum(
                        dev(dec(p32, bits, refs), prm), interpret=False
                    )
                return acc

            return jax.jit(xn), flat, None
        raise AssertionError(kind)

    fns = {}
    for v in ("null", "dec", "dev", "fused"):
        fn, flat, want = make(v)
        got = int(jax.block_until_ready(fn(*flat))) % (1 << 32)
        if want is not None:
            assert got == want, f"{v}: {got} != {want}"
        fns[v] = (fn, flat, got)
        print(f"{v} compiled", flush=True)
    # cross-gate: dev (staged true images) must equal fused (decoded
    # images are the same pixels)
    assert fns["dev"][2] == fns["fused"][2], "dev/fused checksum mismatch"

    res = {v: [] for v in fns}
    for _ in range(ROUNDS):
        for v, (fn, flat, want) in fns.items():
            t0 = time.perf_counter()
            acc = None
            for _ in range(ITERS):
                o = fn(*flat)
                acc = o if acc is None else acc + o
            total = int(acc) % (1 << 32)
            assert total == (want * ITERS) % (1 << 32), f"burst {v}"
            res[v].append(
                round((time.perf_counter() - t0) / (ITERS * N) * 1e3, 4)
            )
        print(res, flush=True)

    null = min(res["null"])
    out = {
        v: {"best_ms": min(r), "net_ms": round(min(r) - null, 4), "raw": r}
        for v, r in res.items()
    }
    out["_meta"] = {
        "fusion_overhead_ms": round(
            (min(res["fused"]) - null)
            - (min(res["dec"]) - null)
            - (min(res["dev"]) - null),
            4,
        ),
        "iters": ITERS, "inline_n": N, "nfields": nf,
        "rows": rows, "sub_rows": sub_rows,
    }
    path = "benchmarks/probe_fused_preview.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
