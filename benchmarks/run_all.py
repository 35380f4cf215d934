#!/usr/bin/env python3
"""Full benchmark suite: every decode path on every config, JSON artifacts.

Measures (device-side, outputs kept live via checksums):
  - modern codec: Pallas kernel vs pure-XLA path, 4K and 1080p
  - legacy codec: XLA path
  - host stages: metadata scan (native vs python), legacy scan
  - C++ reference decoder on the same payloads (the baseline floor)

Writes benchmarks/results.json. `bench.py` at the repo root remains the
one-line headline bench; this is the engineering view.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit_host(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def make_frame(h, w, seed=11, maxv=4095):
    rng = np.random.default_rng(seed)
    base = (
        np.sin(np.arange(w) / 97)[None, :]
        * np.cos(np.arange(h) / 61)[:, None]
        * (maxv * 0.3)
        + maxv * 0.5
    )
    return (base + rng.normal(0, maxv / 136, size=(h, w))).clip(0, maxv).astype(
        np.uint16
    )


def main():
    import jax
    import jax.numpy as jnp

    from mcraw.kernels.checksum import device_checksum

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from mcraw import encode as E
    from mcraw.kernels import native, unpack as U, pallas_unpack as PK

    results = {
        "device": str(jax.devices()[0]),
        "variance_note": (
            "device timings via a remote TPU tunnel fluctuate ~1.7x "
            "run-to-run (environmental); each number is the best of 5 "
            "checksum-verified 90-frame bursts"
        ),
        "configs": {},
    }
    on_tpu = jax.devices()[0].platform != "cpu"

    def timeit_dev(fn, want_one, n=90):
        """Chained-scalar timing (CLAUDE.md timing traps): every iteration's
        checksum feeds one accumulator, forced with int() and verified; long
        bursts amortize the ~29 ms scalar D2H over the tunnel (trap #1).
        Best of 5 bursts: the tunneled chip's run-to-run noise is ~1.7x
        (measured 587-1036 fps for the same legacy program), so the best
        burst is the capability number; see results.json variance_note."""
        assert int(jax.block_until_ready(fn())) == want_one
        acc = fn()
        for _ in range(3):
            acc = acc + fn()
        int(acc)  # warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            acc = None
            for _ in range(n):
                o = fn()
                acc = o if acc is None else acc + o
            total = int(acc)
            best = min(best, (time.perf_counter() - t0) / n)
            assert total == (want_one * n) % (1 << 32), "checksum mismatch"
        return best

    for name, (h, w) in {"4k": (3072, 4096), "1080p": (1080, 1920)}.items():
        img = make_frame(h, w)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        want = int(img.astype(np.int64).sum() & 0xFFFFFFFF)
        cfg: dict = {
            "shape": [h, w],
            "payload_mb": round(len(payload) / 1e6, 2),
            "bits_per_px": round(8 * len(payload) / (h * w), 2),
        }

        plan = U.prepare_modern(payload, w, h)
        cfg["host_prep_ms"] = round(
            timeit_host(lambda: U.prepare_modern(payload, w, h)) * 1e3, 2
        )

        # XLA path
        a = tuple(map(jax.device_put, (plan.payload, plan.offsets, plan.cls, plan.refs)))

        @functools.partial(jax.jit, static_argnames=("ty", "tx"))
        def xla_sum(payload, offsets, cls, refs, *, ty, tx):
            im = U.decode_modern_device.__wrapped__(
                payload, offsets, cls, refs, tiles_y=ty, tiles_x=tx,
                width=w, height=h,
            )
            return device_checksum(im)

        run = lambda: xla_sum(*a, ty=plan.tiles_y, tx=plan.tiles_x)
        dt = timeit_dev(run, want)
        cfg["xla_ms"] = round(dt * 1e3, 3)
        cfg["xla_fps"] = round(1 / dt, 1)

        # Pallas v5 path (fused de-interleave; TPU only)
        if on_tpu:
            payload2d, base_rows, meta, num_chunks, txp, tr_sub = (
                PK.prepare_chunked_v5(plan)
            )
            rowsb, sub_rowsb = PK.prepare_modern_light(payload, w, h)[5]
            pa = tuple(map(jax.device_put, (payload2d, base_rows, meta)))

            @functools.partial(
                jax.jit,
                static_argnames=("nc", "txp", "tr_sub", "rows", "sub_rows"),
            )
            def pk_sum(
                payload2d, base_rows, meta, *, nc, txp, tr_sub, rows, sub_rows
            ):
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta,
                    num_chunks=nc, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:h, :w]
                return device_checksum(im)

            runp = lambda: pk_sum(
                *pa, nc=num_chunks, txp=txp, tr_sub=tr_sub,
                rows=rowsb, sub_rows=sub_rowsb,
            )
            dt = timeit_dev(runp, want, n=50)
            cfg["pallas_ms"] = round(dt * 1e3, 3)
            cfg["pallas_fps"] = round(1 / dt, 1)
            cfg["pallas_out_gbps"] = round(h * w * 2 / dt / 1e9, 2)

        # C++ reference floor
        try:
            from tools import ref_shim

            if ref_shim.get_lib():
                dt = timeit_host(lambda: ref_shim.ref_decode(payload, w, h), n=3)
                cfg["ref_cpu_ms"] = round(dt * 1e3, 1)
                cfg["ref_cpu_fps"] = round(1 / dt, 1)
        except Exception:
            pass

        results["configs"][f"modern_{name}"] = cfg
        print(json.dumps({f"modern_{name}": cfg}), flush=True)

    # Legacy codec: XLA path, fused v5 kernel, v6 device-prep, native scan.
    for lname, (h, w) in {
        "legacy_1080p": (1080, 1920),
        "legacy_4k": (3072, 4096),
    }.items():
        img = make_frame(h, w, maxv=1023)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        want = int(img.astype(np.int64).sum() & 0xFFFFFFFF)
        plan = U.prepare_legacy(payload, w, h)
        cfg = {
            "shape": [h, w],
            "payload_mb": round(len(payload) / 1e6, 2),
            "native_scan": native.have_native(),
            "chunk_table_entries": len(
                __import__(
                    "mcraw.kernels.numpy_ref", fromlist=["x"]
                ).legacy_chunk_offsets(payload)
            ),
            "host_prep_ms": round(
                timeit_host(lambda: U.prepare_legacy(payload, w, h)) * 1e3, 2
            ),
        }
        a = tuple(
            map(jax.device_put,
                (plan.payload, plan.offsets, plan.cls, plan.refs))
        )

        @functools.partial(jax.jit, static_argnames=("pw",))
        def leg_sum(payload, offsets, cls, refs, *, pw):
            im = U.decode_legacy_device.__wrapped__(
                payload, offsets, cls, refs,
                padded_width=pw, width=w, height=h,
            )
            return device_checksum(im)

        run = lambda: leg_sum(*a, pw=plan.padded_width)
        dt = timeit_dev(run, want, n=30)
        cfg["xla_ms"] = round(dt * 1e3, 3)
        cfg["xla_fps"] = round(1 / dt, 1)

        if on_tpu:
            from mcraw.kernels import pallas_legacy as PL

            payload2d, base_rows, meta, num_chunks, segs, lrows = (
                PL.prepare_chunked_legacy_v5(plan)
            )
            pa = tuple(map(jax.device_put, (payload2d, base_rows, meta)))

            @functools.partial(
                jax.jit, static_argnames=("nc", "segs", "lrows")
            )
            def leg_pk(payload2d, base_rows, meta, *, nc, segs, lrows):
                out = PL._unpack_legacy_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta, num_chunks=nc, rows=lrows
                )
                im = out[: h * segs].reshape(h, segs * 128)[:, :w]
                return device_checksum(im)

            runp = lambda: leg_pk(*pa, nc=num_chunks, segs=segs, lrows=lrows)
            dt = timeit_dev(runp, want, n=50)
            cfg["pallas_ms"] = round(dt * 1e3, 3)
            cfg["pallas_fps"] = round(1 / dt, 1)
            cfg["pallas_out_gbps"] = round(h * w * 2 / dt / 1e9, 2)

            # v6 device-prep path (host = scan only; meta laid out on chip)
            light = PL.prepare_legacy_light(payload, w, h)
            if light is not None:
                p32l, offsl, bitsl, refsl, pwl, rowsl = light
                va = tuple(
                    jax.device_put(np.asarray(x, np.int32))
                    for x in (p32l, offsl, bitsl, refsl)
                )

                @functools.partial(jax.jit, static_argnames=("pw", "lrows"))
                def leg_v6(p32, offs, bits, refs, *, pw, lrows):
                    im = PL.decode_legacy_device_v6.__wrapped__(
                        p32, offs, bits, refs,
                        pw=pw, h=h, width=w, rows=lrows,
                    )
                    return device_checksum(im)

                runv6 = lambda: leg_v6(*va, pw=pwl, lrows=rowsl)
                dt = timeit_dev(runv6, want, n=50)
                cfg["v6_ms"] = round(dt * 1e3, 3)
                cfg["v6_fps"] = round(1 / dt, 1)
        try:
            from tools import ref_shim

            if ref_shim.get_lib():
                dt = timeit_host(
                    lambda: ref_shim.ref_decode_legacy(payload, w, h), n=3
                )
                cfg["ref_cpu_ms"] = round(dt * 1e3, 1)
        except Exception:
            pass
        results["configs"][lname] = cfg
        print(json.dumps({lname: cfg}), flush=True)

    # Fused decode -> develop preview (BASELINE config 5), 4K on-device.
    if on_tpu:
        from mcraw import preview

        h, w = 3072, 4096
        img = make_frame(h, w)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        p32, bits, refs, ty, tx, _spans = PK.prepare_modern_light(payload, w, h)
        pa = tuple(map(jax.device_put, (p32, bits, refs)))
        cfa = (0, 1, 1, 2)
        black = jnp.zeros(4, jnp.uint16)
        white = jnp.float32(4095.0)
        neutral = jnp.ones(3, jnp.float32)
        fwd = jnp.asarray(np.diag([0.9642, 1.0, 0.8249]).astype(np.float32))

        from mcraw.kernels import pallas_develop as PD

        inv2d = preview._inv_dens_device(h, w, cfa).reshape(3 * h, w)
        params = jnp.asarray(
            PD.pack_develop_params(
                np.zeros(4, np.float32), 4095.0, np.ones(3, np.float32),
                np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
            )
        )

        @functools.partial(jax.jit, static_argnames=("ty", "tx"))
        def prev_sum(p32, bits, refs, params, inv2d, *, ty, tx):
            im = PK.decode_modern_device_v6.__wrapped__(
                p32, bits, refs, ty=ty, tx=tx, height=h, width=w
            )
            rgba = PD.develop_rgba_pallas.__wrapped__(
                im, params, inv2d, height=h, width=w, cfa=cfa
            )
            return device_checksum(rgba)

        runv = lambda: prev_sum(*pa, params, inv2d, ty=ty, tx=tx)
        want_prev = int(jax.block_until_ready(runv()))  # self-consistency
        dt = timeit_dev(runv, want_prev, n=60)
        results["configs"]["preview_4k"] = {
            "shape": [h, w],
            "decode_develop_ms": round(dt * 1e3, 3),
            "fps": round(1 / dt, 1),
        }
        print(json.dumps({"preview_4k": results["configs"]["preview_4k"]}),
              flush=True)

        # Fused develop at the dominant real phone geometry (4032x3024 —
        # width NOT a lane multiple; the kernel pads internally).
        h, w = 3024, 4032
        img = make_frame(h, w)
        raw = jax.device_put(img)
        inv2d = preview._inv_dens_device(h, w, cfa).reshape(3 * h, w)

        @jax.jit
        def dev_sum(raw, params, inv2d):
            rgba = PD.develop_rgba_pallas.__wrapped__(
                raw, params, inv2d, height=h, width=w, cfa=cfa
            )
            return device_checksum(rgba)

        rund = lambda: dev_sum(raw, params, inv2d)
        want_dev = int(jax.block_until_ready(rund()))  # self-consistency
        dt = timeit_dev(rund, want_dev, n=60)
        results["configs"]["develop_4032x3024"] = {
            "shape": [h, w],
            "develop_ms": round(dt * 1e3, 3),
            "fps": round(1 / dt, 1),
        }
        print(
            json.dumps(
                {"develop_4032x3024": results["configs"]["develop_4032x3024"]}
            ),
            flush=True,
        )

    out = Path(__file__).with_name("results.json")
    out.write_text(json.dumps(results, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
