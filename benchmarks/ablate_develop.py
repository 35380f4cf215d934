#!/usr/bin/env python3
"""Sharp device-time decomposition of the fused develop kernel (VERDICT
r3 #3): the ~1.2 ms develop stage never had the ablation treatment the
decode kernels got three rounds of.

Same discipline as ablate_sharp.py: inline-xN jit programs with N
DISTINCT parameter sets (trap #5: XLA CSEs identical pure pallas calls),
fold-checksum consumers (trap #3), ONE scalar force per iters-block
(trap #7), a null calibration leg, variants interleaved across rounds
(trap #6).

Ladder:
  null      harness floor (8 tiny staged checksums)
  table     full kernel, streamed (3H, W) f32 normalizer table (the r3
            shipping config: ~226 MB HBM traffic/frame at 4K)
  compute   full kernel, normalizer computed in-kernel from the CFA mask
            (bitwise-identical output, ~75 MB traffic) — the r4 default
  compute_br32 / table_br64  band-rows geometry sweep (br64 only fits
            VMEM in compute mode; the table variant documents the OOM)
  *_dma     DMA + normalize only (stage floor)
  *_demosaic  + mask convs and normalizer multiply
  *_nogamma   full color math minus the sRGB exp/log curve

table/compute are checksum-gated against each other (bitwise equality is
also pinned in tests/test_preview.py); ablation legs store wrong results
by design and run ungated.

Usage: python benchmarks/ablate_develop.py [variant ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 3072, 4096
# The axon remote-compile helper dies (HTTP 500, subprocess exit 1) on
# programs with >= 4 inline develop pallas calls — probed 2026-08-20:
# N=2 compiles, N=4 fails, deterministically, while decode kernels take
# N=8 fine. N=2 keeps trap #5 (distinct args) honest; the larger RTT
# share per force is identical in the null leg and subtracts out.
N = 2
ITERS = 120

# name: (use_table, ablate, band_rows, extra_kw)
VARIANTS = {
    "table": (True, "", None, {}),
    "compute": (False, "", None, {}),
    "compute_br32": (False, "", 32, {}),
    "compute_br128": (False, "", 128, {}),
    "table_br64": (True, "", 64, {}),
    "table_dma": (True, "dma", None, {}),
    "compute_dma": (False, "dma", None, {}),
    "table_demosaic": (True, "demosaic", None, {}),
    "compute_demosaic": (False, "demosaic", None, {}),
    "compute_nogamma": (False, "nogamma", None, {}),
    # minimax polynomial transfer curve (within the <= 1 LSB contract;
    # NOT checksum-equal to the exact curve, so gated only on
    # self-consistency via check=False)
    "compute_gpoly": (False, "", None, {"gamma_mode": "poly"}),
    # Malvar-He-Cutler 5x5 demosaic (r5 feature; BR=32 default — BR=64
    # malvar crashes the remote-compile helper at 4K). Different pixels
    # than bilinear by design -> self-consistency gate only.
    "malvar": (False, "", None, {"demosaic": "malvar"}),
    "malvar_br16": (False, "", 16, {"demosaic": "malvar"}),
}

DEFAULT = [
    "null", "table", "compute", "compute_br32", "table_dma", "compute_dma",
    "table_demosaic", "compute_demosaic", "compute_nogamma",
    "compute_gpoly",
]


def main():
    import jax
    import jax.numpy as jnp

    from mcraw import preview as P
    from mcraw.kernels import pallas_develop as PD
    from mcraw.kernels.checksum import device_checksum

    rng = np.random.default_rng(7)
    cfa = (0, 1, 1, 2)
    raws = [
        jax.device_put(
            rng.integers(0, 4096, size=(H, W), dtype=np.uint16)
        )
        for _ in range(4)
    ]
    params = jnp.asarray(
        PD.pack_develop_params(
            np.array([16, 20, 24, 28], np.float32),
            4095.0,
            np.array([0.55, 1.0, 0.71], np.float32),
            np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
        )
    )
    inv2d = jax.device_put(P._inv_dens(H, W, cfa).reshape(3 * H, W))

    # Gate: table and compute must agree frame-by-frame on hardware.
    expected = []
    one = jax.jit(
        lambda r, use_table: device_checksum(
            PD.develop_rgba_pallas.__wrapped__(
                r, params, inv2d if use_table else None,
                height=H, width=W, cfa=cfa,
            ),
            interpret=False,
        ),
        static_argnames=("use_table",),
    )
    for r in raws:
        ct = int(jax.block_until_ready(one(r, use_table=True)))
        cc = int(jax.block_until_ready(one(r, use_table=False)))
        assert ct == cc, f"table/compute checksum divergence: {ct} != {cc}"
        expected.append(ct)
    print("gate: table == compute on hw for all frames", flush=True)

    def make_xn(use_table, ablate, br, check, extra_kw=None):
        def xn(*rs):
            acc = jnp.uint32(0)
            for k in range(N):
                rgba = PD.develop_rgba_pallas.__wrapped__(
                    rs[k], params, inv2d if use_table else None,
                    height=H, width=W, cfa=cfa,
                    band_rows=br, ablate=ablate, **(extra_kw or {}),
                )
                acc = (
                    acc
                    + device_checksum(rgba, interpret=False)
                    + jnp.uint32(k)
                )
            return acc

        fn = jax.jit(xn)
        flat = [raws[k % 4] for k in range(N)]
        got = int(jax.block_until_ready(fn(*flat)))
        if check:
            want = (
                sum(expected[k % 4] for k in range(N)) + N * (N - 1) // 2
            ) % (1 << 32)
            assert got == want, f"checksum {use_table} {ablate} {br}"
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
                ut, ab, br, ekw = VARIANTS[v]
                fns[v] = make_xn(
                    ut, ab, br, check=(ab == "" and not ekw), extra_kw=ekw
                )
            print(f"{v} compiled", flush=True)
        except Exception as e:  # noqa: BLE001 — a rejected variant must
            # not kill the rest of the ladder
            failed[v] = repr(e)[:300]
            print(f"{v} FAILED: {failed[v]}", flush=True)
    names = [v for v in names if v in fns]

    results = {v: [] for v in names}
    for _ in range(5):
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
        "geometry": [H, W], "failed": failed,
    }
    print(json.dumps(summary))
    tag = "_".join(names)[:48].replace(" ", "-")
    with open(f"/root/repo/benchmarks/ablate_develop_{tag}.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
