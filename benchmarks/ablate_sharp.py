#!/usr/bin/env python3
"""Sharp device-time decomposition of the v5 kernel (post trap-#7).

Every earlier attribution (ablate_v5.json, probe_outcopy*.json) carries
~0.3-0.4 ms/frame of harness: per-dispatch tunnel submission (trap #5)
plus the chained-acc scalar force's RTT share (trap #7). This harness is
the clean pattern from probe_store2.py generalized to the full stage
ladder:

  - inline-xN jit programs with N DISTINCT parameter sets (XLA CSEs
    identical pure pallas custom-calls — trap #5),
  - fold-checksum consumers so no stage is elided (trap #3),
  - ONE scalar force per iters-block (iters*N frames amortize the ~29 ms
    RTT to < 0.07 ms/frame — trap #7),
  - a "null" calibration leg (the harness's own cost) subtracted out,
  - variants interleaved across repeat rounds (trap #6: cross-run tunnel
    load swings; only within-process interleaved A/B is meaningful).

Usage: python benchmarks/ablate_sharp.py [variant ...]
Variants: null empty skel-smallout skeleton full fields0 fields1 fields2
          mergedout nodesc nopick nometa rawout legacy3d chunkmt wide wide1
Default ladder decomposes: grid/pipeline cost (empty), loop+DMA
(skel-smallout), + stores (skeleton), + compute (fields0..full), and the
store-layout A/Bs (flat=full vs wide/wide1).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
N = 8
ITERS = 60

VARIANTS = {
    # name: (ablate string, extra kw)
    "full": ("", {}),
    "empty": ("empty", {}),
    "skel-smallout": ("skeleton smallout", {}),
    "skel-tinyout": ("skeleton tinyout", {}),
    "skeleton": ("skeleton", {}),
    "skel-nodma": ("skeleton nodma", {}),
    "fields0": ("fields0", {}),
    "fields1": ("fields1", {}),
    "fields2": ("fields2", {}),
    # fieldsN with the desc dot kept at FULL static width: the pl.when
    # per-chunk-gating ceiling (structure fixed, only pass work skipped)
    "f1dw": ("fields1 dwfull", {}),
    "f2dw": ("fields2 dwfull", {}),
    "mergedout": ("mergedout", {}),
    "nodesc": ("nodesc", {}),
    "nopick": ("nopick", {}),
    # pick-complex splits (r3 cont.): both dots + convert live, no pair
    # select / no byte merge — the 0.42 ms pick complex's VPU halves.
    "noselect": ("noselect", {}),
    "nomerge": ("nomerge", {}),
    "noselmerge": ("noselect nomerge", {}),
    # chunk-wide pick one-hot build — only the dots stay in the
    # per-subgroup chain (r3 pick-split: select/merge free, 0.42 ms is
    # dots + one-hot builds)
    "chunkoh": ("", {"chunk_oh": True}),
    "nometa": ("nometa", {}),
    "rawout": ("rawout", {}),
    "legacy3d": ("", {"flat_out": False}),
    "chunkmt": ("", {"chunk_mt": True}),
    "wide": ("", {"wide_store": 1}),
    "wide1": ("", {"wide_store": 2}),
    "cdesc": ("", {"chunk_desc": True}),
    "bytes": ("", {"plane_mode": "bytes"}),  # == full since the default flip
    "halves": ("", {"plane_mode": "halves"}),  # the pre-flip default
    "packed": ("", {"plane_mode": "packed"}),  # one-dot pair-row pick
    # packed with constant-extract select (c & 255 / c >> 8 + where)
    # instead of packed's variable shift — MEASURED r3: 0.881 ~= packed
    # 0.876, both lose to bytes 0.658 (the variable shift was not the
    # loss); on legacy packed2 is 2.4x WORSE than the variable shift.
    "packed2": ("", {"plane_mode": "packed2"}),
    # int8 byte planes (bias -128): s8 x s8 -> s32 pick dots run at 2x the
    # bf16 MXU rate; windows start 32-aligned (remainder folded into q8).
    "s8": ("", {"plane_mode": "s8"}),
    # both pick one-hots M-stacked into ONE dot per subgroup (same MACs,
    # half the MXU dispatches) — dot-issue-count probe
    "pstack": ("", {"pick_stack": True}),
    # pick-cost split: dots with meta-independent constant one-hots
    # (pure MXU streaming) vs real one-hot builds without dots
    "ohcheap": ("ohcheap", {}),
    "ohonly": ("ohonly", {}),
    # uniform class-16 static-slice fast path (VERDICT r3 #1): only valid
    # on worst-case frames (WORST=1); pass nfields=UNIFORM16 + tx.
    "uni16": ("", {"_uni16": True}),
    # byte-plane DEFAULT-bf16 desc dot — REJECTED on modern (the weighted
    # one-hot build x24 subgroups costs 0.20 ms, the saved passes ~0:
    # 0.867 vs full/dot3 0.666 net, ablate_sharp_null_full_descdot3_
    # fields0_mergedout.json — that run's "full" was bytedot pre-revert);
    # kept pinned for A/B. The same trick WINS -40% on legacy (chunk-wide
    # meta outputs, one operand build per chunk — pallas_legacy.py).
    "descbyte": ("", {"desc_mode": "bytedot"}),
}

DEFAULT = [
    "null", "empty", "skel-smallout", "skel-tinyout", "skeleton",
    "fields0", "fields1", "full", "wide", "wide1", "cdesc",
]
# skel-smallout -> skel-tinyout isolates the out-block VMEM->HBM copy
# (tinyout keeps the full-size out block, stores 1 row/subgroup);
# skel-tinyout -> skeleton isolates VPU store issue.


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    import os

    worst = os.environ.get("WORST", "") == "1"
    # WORST=1 selects pure all-16-bit frames (bench content="all16" —
    # the uniform16 fast path's content; bench's "worst" adds a 5-bit
    # tile to force the general kernel instead). CONTENT overrides
    # directly (mix | all16 | worst) — CONTENT=worst is the honest-floor
    # content for the nfields-gating A/B (VERDICT r4 #3).
    content = os.environ.get("CONTENT", "all16" if worst else "mix")
    imgs, payloads = make_frames(content=content)
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    tx = plans[0].tiles_x
    lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
    rows = max(l[5][0] for l in lights)
    sub_rows = max(l[5][1] for l in lights)
    nf = max(l[5][2] for l in lights)

    def make_xn(ablate, kw, check):
        kw = dict(kw)
        nf_v = nf
        if kw.pop("_uni16", False):
            assert nf == PK.UNIFORM16, "uni16 needs worst-case frames (WORST=1)"
            kw["tx"] = tx
            nf_v = PK.UNIFORM16
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
                    rows=rows, sub_rows=sub_rows, nfields=nf_v,
                    ablate=ablate, **kw,
                )
                if check:
                    x = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                else:
                    x = img3.reshape(img3.shape[0], -1)
                acc = (
                    acc + device_checksum(x, interpret=False) + jnp.uint32(k)
                )
            return acc

        fn = jax.jit(xn)
        got = int(jax.block_until_ready(fn(*flat)))
        if check:
            want = (
                sum(expected[k % 4] for k in range(N)) + N * (N - 1) // 2
            ) % (1 << 32)
            assert got == want, f"checksum {ablate} {kw}"
        return fn, flat

    def make_null():
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

    def timeit(fn, flat):
        t0 = time.perf_counter()
        acc = None
        for _ in range(ITERS):
            o = fn(*flat)
            acc = o if acc is None else acc + o
        int(acc)
        return (time.perf_counter() - t0) / (ITERS * N) * 1e3

    names = sys.argv[1:] or DEFAULT
    fns = {}
    failed = {}
    for v in names:
        try:
            if v == "null":
                fns[v] = make_null()
            else:
                ab, kw = VARIANTS[v]
                fns[v] = make_xn(ab, kw, check=(ab == ""))
            print(f"{v} compiled", flush=True)
        except Exception as e:  # noqa: BLE001 — a Mosaic-rejected variant
            # must not kill the rest of the ladder
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
        v: {
            "best_ms": min(r),
            "net_ms": round(min(r) - null_ms, 4),
            "raw": r,
        }
        for v, r in results.items()
    }
    summary["_meta"] = {
        "null_ms": null_ms, "iters": ITERS, "inline_n": N,
        "geometry": [H, W], "nfields": nf, "rows": rows,
        "sub_rows": sub_rows, "failed": failed,
    }
    print(json.dumps(summary))
    tag = "_".join(names)[:48].replace(" ", "-")
    with open(f"/root/repo/benchmarks/ablate_sharp_{tag}.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
