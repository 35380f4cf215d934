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
            "kernel timings inline 8 calls per jit program bound as "
            "distinct parameters (device truth: amortizes the ~0.4-0.7 ms "
            "tunnel submission cost per dispatch and defeats XLA CSE of "
            "identical pure calls); XLA-path timings are per-dispatch "
            "bursts. Best checksum-verified burst either way; the tunnel "
            "still swings run-to-run. *_ms_net fields subtract "
            "harness_null_ms_per_frame (a no-work x8 program measured with "
            "the identical harness — per-dispatch submission + the one "
            "scalar force's RTT share, timing traps #5/#7); raw *_ms "
            "fields keep the harness cost in, matching bench.py's "
            "conservative headline discipline"
        ),
        "configs": {},
    }
    on_tpu = jax.devices()[0].platform != "cpu"

    def timeit_dev_inline(call, args, want_one, n_inline=8, iters=60, reps=4):
        """Device-truth timing per CLAUDE.md trap #5: n_inline calls of
        `call` (a traceable fn) inlined in ONE jit program, the same staged
        buffers bound as DISTINCT jit parameters so XLA cannot CSE the pure
        pallas calls; checksums chain into one forced scalar. iters*n_inline
        frames share that ONE ~29 ms scalar D2H round trip (trap #7: at 96
        frames the RTT alone added 0.30 ms/frame — 40% on top of the 4K
        kernel's ~0.75 ms device time); 480 frames cut it to <0.07."""
        na = len(args)
        flat = list(args) * n_inline

        def xn(*flat_args):
            acc = jnp.uint32(0)
            for k in range(n_inline):
                acc = (
                    acc
                    + call(*flat_args[k * na : (k + 1) * na])
                    + jnp.uint32(k)
                )
            return acc

        fn = jax.jit(xn)
        want = (
            want_one * n_inline + n_inline * (n_inline - 1) // 2
        ) % (1 << 32)
        assert int(jax.block_until_ready(fn(*flat))) % (1 << 32) == want
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                o = fn(*flat)
                acc = o if acc is None else acc + o
            total = int(acc) % (1 << 32)
            best = min(best, (time.perf_counter() - t0) / (iters * n_inline))
            assert total == (want * iters) % (1 << 32), "checksum mismatch"
        return best

    def latency_net(call, args, want_one, floor_s):
        """Single-frame latency for the AOT/latency path (VERDICT r3 #5),
        net of the tunnel RTT: one jitted dispatch + one scalar force,
        mirrored exactly by a trivial-program null (bench.py discipline);
        clamped below by the amortized per-frame device time."""
        fn = jax.jit(call)
        got = int(jax.block_until_ready(fn(*args))) % (1 << 32)
        assert got == want_one % (1 << 32), "latency leg checksum"
        null = jax.device_put(np.uint32(1))
        null_step = jax.jit(lambda x: x + jnp.uint32(1))
        int(null_step(null))

        def t(f):
            t0 = time.perf_counter()
            f()
            return time.perf_counter() - t0

        rtt = min(t(lambda: int(null_step(null))) for _ in range(12))
        lat = min(t(lambda: int(fn(*args))) for _ in range(12))
        return max(lat - rtt, floor_s)

    null_ms = None
    if on_tpu:
        # Null calibration: the inline-x8 harness's own per-frame cost
        # (per-dispatch tunnel submission + the amortized force RTT).
        null_arg = (jax.device_put(np.ones((8, 128), np.uint16)),)
        null_ms = (
            timeit_dev_inline(
                lambda a: device_checksum(a), null_arg, 8 * 128
            )
            * 1e3
        )
        results["harness_null_ms_per_frame"] = round(null_ms, 4)

    null2_ms = None
    if on_tpu:
        # Matched null for the n_inline=2 develop legs (the compile-helper
        # limit): per-frame submission share is 4x the x8 harness's, so
        # the x8 null would under-subtract there.
        null2_ms = (
            timeit_dev_inline(
                lambda a: device_checksum(a), null_arg, 8 * 128,
                n_inline=2, iters=240,
            )
            * 1e3
        )
        results["harness_null2_ms_per_frame"] = round(null2_ms, 4)

    def add_net(cfg, key, null_override=None):
        """pallas_ms -> pallas_ms_net/pallas_fps_net via the null leg."""
        nm = null_ms if null_override is None else null_override
        if nm is None or key not in cfg:
            return
        net = max(cfg[key] - nm, 1e-6)
        cfg[key.replace("_ms", "_ms_net")] = round(net, 3)
        cfg[key.replace("_ms", "_fps_net")] = round(1e3 / net, 1)

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
            rowsb, sub_rowsb, nfb = PK.prepare_modern_light(payload, w, h)[5]
            pa = tuple(map(jax.device_put, (payload2d, base_rows, meta)))

            def pk_body(payload2d, base_rows, meta):
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta,
                    num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
                    tx=plan.tiles_x,
                    rows=rowsb, sub_rows=sub_rowsb, nfields=nfb,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:h, :w]
                return device_checksum(im)

            dt = timeit_dev_inline(pk_body, pa, want)
            cfg["pallas_ms"] = round(dt * 1e3, 3)
            cfg["pallas_fps"] = round(1 / dt, 1)
            cfg["pallas_out_gbps"] = round(h * w * 2 / dt / 1e9, 2)
            add_net(cfg, "pallas_ms")
            cfg["latency_ms"] = round(
                latency_net(pk_body, pa, want, dt) * 1e3, 3
            )

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

            def leg_pk(payload2d, base_rows, meta):
                out = PL._unpack_legacy_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta,
                    num_chunks=num_chunks, rows=lrows,
                )
                im = out[: h * segs].reshape(h, segs * 128)[:, :w]
                return device_checksum(im)

            dt = timeit_dev_inline(leg_pk, pa, want)
            cfg["pallas_ms"] = round(dt * 1e3, 3)
            cfg["pallas_fps"] = round(1 / dt, 1)
            cfg["pallas_out_gbps"] = round(h * w * 2 / dt / 1e9, 2)
            add_net(cfg, "pallas_ms")
            cfg["latency_ms"] = round(
                latency_net(leg_pk, pa, want, dt) * 1e3, 3
            )

            # v6 device-prep path (host = scan only; meta laid out on chip)
            light = PL.prepare_legacy_light(payload, w, h)
            if light is not None:
                p32l, offsl, bitsl, refsl, pwl, rowsl = light
                va = tuple(
                    jax.device_put(np.asarray(x, np.int32))
                    for x in (p32l, offsl, bitsl, refsl)
                )

                def leg_v6(p32, offs, bits, refs):
                    im = PL.decode_legacy_device_v6.__wrapped__(
                        p32, offs, bits, refs,
                        pw=pwl, h=h, width=w, rows=rowsl,
                    )
                    return device_checksum(im)

                dt = timeit_dev_inline(leg_v6, va, want)
                cfg["v6_ms"] = round(dt * 1e3, 3)
                cfg["v6_fps"] = round(1 / dt, 1)
                add_net(cfg, "v6_ms")
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

        params = jnp.asarray(
            PD.pack_develop_params(
                np.zeros(4, np.float32), 4095.0, np.ones(3, np.float32),
                np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
            )
        )

        # inv2d=None: in-kernel normalizer (shipping default, bitwise ==
        # the streamed table). n_inline=2: the axon remote-compile helper
        # dies on >= 4 inline develop pallas calls (2026-08-20 probe);
        # iters raised so the one force RTT stays amortized.
        def prev_body(p32, bits, refs, params):
            im = PK.decode_modern_device_v6.__wrapped__(
                p32, bits, refs, ty=ty, tx=tx, height=h, width=w
            )
            rgba = PD.develop_rgba_pallas.__wrapped__(
                im, params, None, height=h, width=w, cfa=cfa
            )
            return device_checksum(rgba)

        want_prev = int(
            jax.block_until_ready(jax.jit(prev_body)(*pa, params))
        )  # self-consistency
        dt = timeit_dev_inline(
            prev_body, pa + (params,), want_prev, n_inline=2, iters=240
        )
        results["configs"]["preview_4k"] = {
            "shape": [h, w],
            "decode_develop_ms": round(dt * 1e3, 3),
            "fps": round(1 / dt, 1),
        }
        add_net(
            results["configs"]["preview_4k"], "decode_develop_ms",
            null_override=null2_ms,
        )
        print(json.dumps({"preview_4k": results["configs"]["preview_4k"]}),
              flush=True)

        # Fused develop at the dominant real phone geometry (4032x3024 —
        # width NOT a lane multiple; the kernel pads internally).
        h, w = 3024, 4032
        img = make_frame(h, w)
        raw = jax.device_put(img)

        def dev_body(raw, params):
            rgba = PD.develop_rgba_pallas.__wrapped__(
                raw, params, None, height=h, width=w, cfa=cfa
            )
            return device_checksum(rgba)

        want_dev = int(
            jax.block_until_ready(jax.jit(dev_body)(raw, params))
        )  # self-consistency
        dt = timeit_dev_inline(
            dev_body, (raw, params), want_dev, n_inline=2, iters=240
        )
        results["configs"]["develop_4032x3024"] = {
            "shape": [h, w],
            "develop_ms": round(dt * 1e3, 3),
            "fps": round(1 / dt, 1),
        }
        add_net(
            results["configs"]["develop_4032x3024"], "develop_ms",
            null_override=null2_ms,
        )
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
