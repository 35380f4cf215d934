#!/usr/bin/env python3
"""On-chip cost attribution for the v5 kernel: time stage-skip variants.

DEPRECATED for attribution: this harness predates timing trap #7 — its
per-variant numbers carry ~0.3-0.4 ms/frame of harness (per-dispatch
tunnel submission + the chained force's RTT share). Use
benchmarks/ablate_sharp.py (inline-xN, null-calibrated) instead; kept
for history and because its variant flags document the kernel stages.

Ablated variants produce WRONG pixels by design — they only exist to
measure where the kernel's time goes (outputs are still forced via a
chained D2H scalar so nothing is elided). The "" baseline is
checksum-verified against the oracle.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
FRAMES = 2
ITERS = 60

VARIANTS = [
    "",          # full kernel (checksummed)
    "fields2",   # drop field pass 3
    "fields1",   # drop passes 2+3
    "fields0",   # drop all field passes (+gathers)
    "nodesc",    # drop descriptor one-hot matmul
    "nopick",    # drop planes + both pick matmuls + merge
    "nopick fields0",  # floor: DMA + meta + slab stores only
    "rawout",    # full compute, raw (pair-row, 128) stores
    "rawout nopick fields0",  # floor without the slab-store layout
    "nometa nopick fields0",  # floor without the meta transposes
    "nometa",                 # full compute, no meta transposes
    "skeleton",               # DMA + scalar reads + slab stores ONLY
    "skeleton rawout",        # same, raw store layout
]


def main():
    import jax
    import jax.numpy as jnp

    from mcraw.kernels.checksum import device_checksum

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    imgs, payloads = make_frames()
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
    nc, txp, tr_sub = chunked[0][3:]
    rows, sub_rows = PK.prepare_modern_light(payloads[0], W, H)[5][:2]
    args = [tuple(map(jax.device_put, c[:3])) for c in chunked]

    variants = sys.argv[1:] or VARIANTS
    results = {}
    for ab in variants:
        @functools.partial(
            jax.jit,
            static_argnames=(
                "nc", "txp", "tr_sub", "rows", "sub_rows", "ablate"
            ),
        )
        def step(p2d, br, meta, *, nc, txp, tr_sub, rows, sub_rows, ablate):
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                p2d, br, meta, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                rows=rows, sub_rows=sub_rows, ablate=ablate,
            )
            if "rawout" in ablate:
                return device_checksum(img3)
            im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
            return device_checksum(im)

        run = lambda i: step(
            *args[i % FRAMES], nc=nc, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows, ablate=ab,
        )
        if ab == "":
            for i in range(FRAMES):
                got = int(jax.block_until_ready(run(i)))
                assert got == expected[i], f"baseline checksum frame {i}"
        else:
            int(jax.block_until_ready(run(0)))  # warm/compile

        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                o = run(i)
                acc = o if acc is None else acc + o
            int(acc)  # force the chain
            best = min(best, (time.perf_counter() - t0) / ITERS)
        tag = ab or "full"
        results[tag] = round(best * 1e3, 4)
        print(f"{tag}: {best*1e3:.3f} ms", flush=True)

    if sys.argv[1:]:
        print(json.dumps(results))
        with open("/root/repo/benchmarks/ablate_v5_extra.json", "w") as f:
            json.dump(results, f, indent=1)
        return
    full = results["full"]
    attrib = {
        "field_pass3_ms": round(full - results["fields2"], 3),
        "field_passes_ms": round(full - results["fields0"], 3),
        "desc_matmul_ms": round(full - results["nodesc"], 3),
        "planes_picks_ms": round(full - results["nopick"], 3),
        "slab_store_ms": round(full - results["rawout"], 3),
        "floor_ms": results["nopick fields0"],
        "floor_rawout_ms": results["rawout nopick fields0"],
        "floor_nometa_ms": results["nometa nopick fields0"],
        "meta_transpose_ms": round(full - results["nometa"], 3),
        "skeleton_ms": results["skeleton"],
        "skeleton_rawout_ms": results["skeleton rawout"],
    }
    results["attribution"] = attrib
    print(json.dumps(attrib))
    with open("/root/repo/benchmarks/ablate_v5.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
