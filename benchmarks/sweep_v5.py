#!/usr/bin/env python3
"""Sweep v5 kernel configs (SUBGROUPS x tr_sub) on the real chip.

Checksum-gated; chained-scalar timing (CLAUDE.md timing traps).
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os
H = int(os.environ.get("SWEEP_H", 3072))
W = int(os.environ.get("SWEEP_W", 4096))
FRAMES = 4
ITERS = 90


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_frames
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    imgs, payloads = make_frames(H, W)
    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs]
    plans = [U.prepare_modern(p, W, H) for p in payloads]
    results = {}

    def time_run(run, tag):
        for i in range(FRAMES):
            got = int(jax.block_until_ready(run(i)))
            assert got == expected[i], f"{tag}: checksum mismatch frame {i}"
        acc0 = run(0)
        for i in range(1, 2 * FRAMES):
            acc0 = acc0 + run(i)
        int(acc0)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                o = run(i)
                acc = o if acc is None else acc + o
            total = int(acc)
            best = min(best, (time.perf_counter() - t0) / ITERS)
            want = sum(expected[i % FRAMES] for i in range(ITERS)) % (1 << 32)
            assert total == want, f"{tag}: burst checksum mismatch"
        results[tag] = {"ms": round(best * 1e3, 4), "fps": round(1.0 / best, 1)}
        print(f"{tag}: {best*1e3:.3f} ms = {1.0/best:.1f} fps", flush=True)

    trb = 4 * plans[0].tiles_x  # 256 at 4K
    saved = (PK.SUBGROUPS_V5, PK.TARGET_SG_V5)

    import ast

    configs = ast.literal_eval(
        os.environ.get("SWEEP_CFGS", "[(24, 1), (16, 1), (32, 1)]")
    )
    for sub, tr in configs:
        PK.SUBGROUPS_V5 = sub
        PK.TARGET_SG_V5 = tr * trb
        try:
            ch = [PK.prepare_chunked_v5(pl) for pl in plans]
            nc, txp, tr_sub = ch[0][3:]
            assert tr_sub == tr, (tr_sub, tr)
            args = [tuple(map(jax.device_put, c[:3])) for c in ch]
            # Content-aware spans + static field count (the production
            # config): the per-(sub, tr) geometry cache is keyed on the
            # monkeypatched tunables, so these recompute per config.
            lights = [PK.prepare_modern_light(p, W, H) for p in payloads]
            rows = max(l[5][0] for l in lights)
            sub_rows = max(l[5][1] for l in lights)
            nf = max(l[5][2] for l in lights)

            @functools.partial(
                jax.jit,
                static_argnames=(
                    "nc", "txp", "tr_sub", "rows", "sub_rows", "nf", "tag"
                ),
            )
            def step(p2d, br, meta, *, nc, txp, tr_sub, rows, sub_rows,
                     nf, tag):
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    p2d, br, meta, num_chunks=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows, nfields=nf,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                return im.astype(jnp.uint32).sum()

            tag = f"sub{sub}_tr{tr}"
            time_run(
                lambda i: step(
                    *args[i % FRAMES], nc=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows, nf=nf, tag=tag
                ),
                tag,
            )
        except Exception as e:
            print(f"sub{sub}_tr{tr}: FAILED {e!r}", flush=True)
            results[f"sub{sub}_tr{tr}"] = {"error": str(e)[:200]}

    # Restore the tunables: jit caches are keyed on shapes, not on these
    # globals, so leaving them changed can serve stale-compiled kernels.
    PK.SUBGROUPS_V5, PK.TARGET_SG_V5 = saved

    with open(os.environ.get("SWEEP_OUT", "/root/repo/benchmarks/sweep_v5b.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
