#!/usr/bin/env python3
"""Headline benchmark: 4K 12-bit MCRAW modern-codec decode, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: sustained device decode throughput (fps) for 4096x3072 12-bit
  frames on one chip, host prep excluded (it overlaps device work in the
  streaming pipeline), outputs kept live via on-device checksums.
- vs_baseline: speedup vs the compiled C++ reference decoder (raw::Decode)
  measured on this machine's CPU over the same payloads — best-ever across
  runs, persisted to /root/.cache/mcraw_ref_floor.json (this 1-vCPU box's
  host timings swing 2x with load; the cached max is the stable capability
  estimate). Falls back to the driver north-star floor (30x realtime =
  720 fps at 24 fps content) if the reference toolchain is unavailable.
- worst_case_fps: the slowest content the format can force on the current
  kernel — full-range noise plus one 5-bit tile, so the general path runs
  at nfields=3 with near-maximal DMA spans (pure all-16-bit frames take
  the uniform16 fast path and no longer bound anything from below).
- all16_fps: pure all-16-bit frames via the uniform16 fast path.
- legacy_fps_4k: legacy-codec (type 6) 4K decode, fused v5 kernel.
- decode_develop_fps: fused RAW->RGBA8888 preview (decode + develop);
  decode_develop_malvar_fps: the same leg with the Malvar-He-Cutler
  demosaic; decode_develop_legacy_fps: the legacy-codec preview leg.
- fps_1080p / legacy_fps_1080p: the same modern/legacy legs at 1920x1080
  (small-frame dispatch amortization, certified since round 5).
All legs share the inline-xN + amortized-force + checksum-gate harness.

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


def make_frames(h=None, w=None, content="mix"):
    from mcraw import encode as E

    h, w = h or H, w or W
    # Disk cache: frames are deterministic (fixed seed), and encoding 8 4K
    # frames costs minutes of host CPU per probe/bench launch. (The old
    # cache key spelled content as int(worst_case); "all16" keeps that
    # file name so the warm cache survives the rename.)
    import os
    ckey = {"mix": "0", "all16": "1"}.get(content, content)
    cache = f"/root/.cache/mcraw_bench_frames_{h}x{w}_{ckey}_{FRAMES}.npz"
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
        if content in ("all16", "worst"):
            # Incompressible full-range noise: every block encodes at 16
            # bits (128 B/block) — span windows and payload DMA are
            # maximal. Pure all-16 content now takes the uniform16 fast
            # path (reported as all16_fps); the honest WORST case for the
            # current kernel additionally plants one 5-bit tile per frame,
            # which keeps uniform16 off and forces the general kernel to
            # its maximum static field-pass count (nfields=3: class 5/6
            # is the only 3-word-field class family) while the DMA spans
            # stay within one tile of maximal.
            img = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
            if content == "worst":
                img[0:4, 0:64] = rng.integers(
                    0, 32, size=(4, 64), dtype=np.uint16
                )
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


def bench_tpu(imgs, payloads, use_pallas=None, h=None, w=None):
    h, w = h or H, w or W
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

    plans = [U.prepare_modern(p, w, h) for p in payloads]

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
        spans = [PK.prepare_modern_light(p, w, h)[5] for p in payloads]
        rows = max(s[0] for s in spans)
        sub_rows = max(s[1] for s in spans)
        # Static field-pass count: max over the frames' present classes
        # (typical content needs 2 of the 3 funnel passes, 16-bit 1).
        nf = max(s[2] for s in spans)

        tx = plans[0].tiles_x  # enables the uniform16 fast path (nf == -1)

        @functools.partial(
            jax.jit,
            static_argnames=(
                "num_chunks", "txp", "tr_sub", "tx", "rows", "sub_rows", "nf"
            ),
        )
        def step(
            payload2d, base_rows, meta, *, num_chunks, txp, tr_sub, tx, rows,
            sub_rows, nf
        ):
            img3 = PK._unpack_image_pallas_v5.__wrapped__(
                payload2d, base_rows, meta,
                num_chunks=num_chunks, txp=txp, tr_sub=tr_sub, tx=tx,
                rows=rows, sub_rows=sub_rows, nfields=nf,
            )
            im = img3.reshape(img3.shape[0], txp * 64)[:h, :w]
            return device_checksum(im)

        run = lambda i: step(
            *args[i % FRAMES],
            num_chunks=num_chunks, txp=txp, tr_sub=tr_sub, tx=tx,
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
                "num_chunks", "txp", "tr_sub", "tx", "rows", "sub_rows", "nf"
            ),
        )
        def step_x8(
            flat, *, num_chunks, txp, tr_sub, tx, rows, sub_rows, nf
        ):
            acc = None
            for k in range(INLINE):
                payload2d, base_rows, meta = flat[3 * k : 3 * k + 3]
                img3 = PK._unpack_image_pallas_v5.__wrapped__(
                    payload2d, base_rows, meta,
                    num_chunks=num_chunks, txp=txp, tr_sub=tr_sub, tx=tx,
                    rows=rows, sub_rows=sub_rows, nfields=nf,
                )
                im = img3.reshape(img3.shape[0], txp * 64)[:h, :w]
                o = device_checksum(im)
                acc = o if acc is None else acc + o
            return acc

        flat_args = tuple(a for k in range(INLINE) for a in args[k % FRAMES])
        run_x8 = lambda: step_x8(
            flat_args,
            num_chunks=num_chunks, txp=txp, tr_sub=tr_sub, tx=tx,
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
                tiles_y=ty, tiles_x=tx, width=w, height=h,
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


def _bench_inline_xn(build_call, argsets, want_mod32, iters=None,
                     frames_per_call=1):
    """Shared device-throughput discipline for the extra legs: N inline
    calls with DISTINCT jit parameters (trap #5: XLA CSEs identical pure
    pallas calls), fold checksums, ONE amortized scalar force per burst
    (trap #7: keep iters*N >= ~400 frames so the ~29 ms force RTT stays
    < 0.1 ms/frame), best-of-rounds. Returns seconds/frame.

    NOTE (trap #9, measured r5): an on-device fori_loop repeating the N
    calls CANNOT amortize per-dispatch submission — the pallas calls are
    pure with loop-invariant operands, so XLA LICM/unroll+CSE executes
    them ONCE and loops over the additions; the checksum still passes
    (semantics preserved) while the "throughput" inflates by the trip
    count (observed: 4685 "fps" vs 745 real on the n=2 preview leg).
    Submission amortization requires DISTINCT per-call data. The develop
    legs are capped at 2 develop custom-calls per program by the
    remote-compile crash; since late r5 they batch 2 distinct frames
    through each develop call (frames_per_call=2, 4 frames/dispatch),
    halving the residual submission share vs the old n=2 shape
    (~0.17 ms/frame); device truth is still the net number
    (benchmarks/probe_fused_preview.json: dec 0.627 + dev 0.398 +
    fusion 0.079 = 1.103 ms -> ~900 fps)."""
    import jax
    import jax.numpy as jnp

    n = len(argsets)
    if iters is None:
        iters = max(ITERS_XN, -(-400 // (n * frames_per_call)))
    flat = [x for a in argsets for x in a]
    na = len(argsets[0])

    def xn(*flat_args):
        acc = jnp.uint32(0)
        for k in range(n):
            acc = acc + build_call(*flat_args[na * k : na * k + na])
        return acc

    fn = jax.jit(xn)
    got = int(jax.block_until_ready(fn(*flat))) % (1 << 32)
    assert got == want_mod32, f"inline-xN checksum: got {got} want {want_mod32}"
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = fn(*flat)
            acc = o if acc is None else acc + o
        total = int(acc) % (1 << 32)
        best = min(
            best, (time.perf_counter() - t0) / (iters * n * frames_per_call)
        )
        assert total == (want_mod32 * iters) % (1 << 32), \
            "burst checksum mismatch"
    return best


def bench_legacy_tpu(imgs, h=None, w=None):
    """Official legacy-codec leg (VERDICT r3 #2): 4K legacy decode fps on
    the fastest shipping path (host-built meta + fused v5 kernel,
    RawData_Legacy.cpp:445-495 parity), same harness discipline and
    correctness gate as the headline."""
    import os

    h, w = h or H, w or W

    import jax
    import numpy as np

    from mcraw import encode as E
    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import unpack as U
    from mcraw.kernels.checksum import device_checksum

    nleg = 4
    cache = f"/root/.cache/mcraw_bench_legacy_{h}x{w}_{nleg}.npz"
    try:
        z = np.load(cache)
        imgs_l = [z[f"img{k}"] for k in range(nleg)]
        payloads = [z[f"pay{k}"] for k in range(nleg)]
    except Exception:
        imgs_l = imgs[:nleg]
        payloads = [
            np.frombuffer(E.encode_legacy(im), dtype=np.uint8)
            for im in imgs_l
        ]
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = cache + ".tmp.npz"
            np.savez(
                tmp[:-4],
                **{f"img{k}": imgs_l[k] for k in range(nleg)},
                **{f"pay{k}": payloads[k] for k in range(nleg)},
            )
            os.replace(tmp, cache)
        except Exception:
            pass

    expected = [int(i.astype(np.int64).sum() & 0xFFFFFFFF) for i in imgs_l]
    plans = [U.prepare_legacy(p, w, h) for p in payloads]
    chunked = [PL.prepare_chunked_legacy_v5(pl) for pl in plans]
    nc, segs = chunked[0][3], chunked[0][4]
    lrows = max(c[5] for c in chunked)
    n = 8
    argsets = [
        tuple(map(jax.device_put, chunked[k % nleg][:3])) for k in range(n)
    ]

    def call(p2d, base, meta):
        out = PL._unpack_legacy_pallas_v5.__wrapped__(
            p2d, base, meta, num_chunks=nc, rows=lrows
        )
        im = out[: h * segs].reshape(h, segs * 128)[:, :w]
        return device_checksum(im, interpret=False)

    want = sum(expected[k % nleg] for k in range(n)) % (1 << 32)
    return 1.0 / _bench_inline_xn(call, argsets, want)


def bench_preview_tpu(payloads, imgs, demosaic="bilinear"):
    """Official fused decode->develop preview leg (VERDICT r3 #2):
    4K RAW payload -> RGBA8888 on device (decode_modern_device_v6 +
    pallas_develop), the consumer-side pipeline of example.cpp:96-130.
    Gated before timing: the decode half must match the known-image
    oracle's checksum per measured frame, and the develop half must sit
    within 1 LSB per channel of the shared f64 scalar model
    (mcraw.preview.develop_f64) on one full frame read back from the
    device — self-consistency alone would re-certify a deterministic
    wrong-output regression."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcraw.kernels import pallas_develop as PD
    from mcraw.kernels import pallas_unpack as PK
    from mcraw.kernels.checksum import device_checksum

    cfa = (0, 1, 1, 2)
    params = jnp.asarray(
        PD.pack_develop_params(
            np.zeros(4, np.float32), 4095.0, np.ones(3, np.float32),
            np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
        )
    )
    # 4 distinct frames, dispatched as 2 PAIRS: each pair shares one
    # BATCHED develop pallas call (native frame-major band grid — vmap
    # can't lift the kernel's ANY-space operands), so the program
    # still holds only 2 develop custom-calls — under the remote-compile
    # helper's >=4-inline-develop crash threshold (probed 2026-08-20;
    # decode kernels take 8 fine) — while a dispatch now covers 4 frames,
    # halving the per-dispatch submission share the n=2 construction was
    # stuck with (trap #9: in-program loops can't amortize it). Distinct
    # args still defeat CSE (trap #5); the RTT share is amortized over
    # ITERS_XN chained dispatches per force (trap #7). Falls back to the
    # unbatched n=2 r5 shape if the batched program fails to compile.
    n = 4
    lights = [
        PK.prepare_modern_light(p, W, H) for p in payloads[: n]
    ]
    spans = [l[5] for l in lights]
    rows = max(s[0] for s in spans)
    sub_rows = max(s[1] for s in spans)
    nf = max(s[2] for s in spans)
    ty, tx = lights[0][3], lights[0][4]
    rmax = max(len(l[0]) for l in lights)
    argsets = [
        (
            jax.device_put(
                np.pad(lights[k % len(lights)][0], (0, rmax - len(lights[k % len(lights)][0])))
            ),
            jax.device_put(lights[k % len(lights)][1]),
            jax.device_put(lights[k % len(lights)][2]),
            params,
        )
        for k in range(n)
    ]

    def call(p32, bits, refs, prm):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        # inv2d=None: in-kernel normalizer (the shipping default; bitwise
        # equal to the table path, tests/test_preview.py).
        rgba = PD.develop_rgba_pallas.__wrapped__(
            im, prm, None, height=H, width=W, cfa=cfa, demosaic=demosaic
        )
        return device_checksum(rgba, interpret=False)

    # Self-consistency want: one gated single-call evaluation per frame.
    # Correctness gates (not just self-consistency — a deterministic
    # wrong-output regression would reproduce its own checksum):
    #  1. decode half vs the known-image oracle, per measured frame;
    #  2. develop half vs the shared f64 scalar model (<= 1 LSB per
    #     channel, alpha exactly 255) on one full frame, read back once.
    def dec_only(p32, bits, refs):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        return device_checksum(im, interpret=False)

    dec_jit = jax.jit(dec_only)
    for k in range(n):
        got = int(jax.block_until_ready(dec_jit(*argsets[k][:3])))
        exp = int(imgs[k % len(lights)].astype(np.int64).sum() & 0xFFFFFFFF)
        assert got == exp, f"preview decode gate: frame {k} {got} != {exp}"

    def full_rgba(p32, bits, refs, prm):
        im = PK.decode_modern_device_v6.__wrapped__(
            p32, bits, refs, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        return PD.develop_rgba_pallas.__wrapped__(
            im, prm, None, height=H, width=W, cfa=cfa, demosaic=demosaic
        )

    from mcraw.preview import develop_f64

    rgba0 = np.asarray(jax.jit(full_rgba)(*argsets[0])).astype(np.int64)
    model = develop_f64(
        imgs[0], np.zeros(4), 4095.0, np.ones(3),
        np.diag([0.9642, 1.0, 0.8249]), cfa, demosaic=demosaic,
    )
    got3 = np.stack(
        [rgba0 & 0xFF, (rgba0 >> 8) & 0xFF, (rgba0 >> 16) & 0xFF], axis=-1
    )
    err = int(np.abs(got3 - model).max())
    assert err <= 1, f"preview develop gate: max |err| {err} > 1 LSB"
    assert int(((rgba0 >> 24) & 0xFF).min()) == 255, "alpha != 255"

    single = jax.jit(call)
    per = [int(jax.block_until_ready(single(*argsets[k]))) for k in range(n)]

    def call2(pa, ba, ra, pb, bb, rb, prm):
        ima = PK.decode_modern_device_v6.__wrapped__(
            pa, ba, ra, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        imb = PK.decode_modern_device_v6.__wrapped__(
            pb, bb, rb, ty=ty, tx=tx, height=H, width=W,
            rows=rows, sub_rows=sub_rows, nfields=nf,
        )
        # Native batched develop (kernel-level frame-major band grid):
        # jax.vmap cannot lift the kernel's ANY-space operands.
        rgba = PD.develop_rgba_pallas.__wrapped__(
            jnp.stack([ima, imb]), prm, None,
            height=H, width=W, cfa=cfa, demosaic=demosaic,
        )
        return device_checksum(rgba.reshape(2 * H, W), interpret=False)

    args2 = [
        argsets[0][:3] + argsets[1][:3] + (params,),
        argsets[2][:3] + argsets[3][:3] + (params,),
    ]
    try:
        # Exactness of the vmap lift is gated right here: each batched
        # pair's checksum must equal the sum of its (oracle-gated)
        # single-frame checksums — a wrong lift cannot certify.
        s2 = jax.jit(call2)
        for j in range(2):
            got = int(jax.block_until_ready(s2(*args2[j]))) % (1 << 32)
            exp = (per[2 * j] + per[2 * j + 1]) % (1 << 32)
            assert got == exp, f"paired develop gate: {got} != {exp}"
        want4 = sum(per) % (1 << 32)
        return 1.0 / _bench_inline_xn(
            call2, args2, want4, frames_per_call=2
        )
    except Exception as e:  # helper crash / Mosaic reject of the lift
        import sys

        print(f"paired develop leg fell back ({type(e).__name__}: {e}); "
              "using unbatched n=2", file=sys.stderr)
        want01 = (per[0] + per[1]) % (1 << 32)
        return 1.0 / _bench_inline_xn(call, argsets[:2], want01)


def bench_preview_legacy_tpu(imgs):
    """Legacy-codec decode->develop preview leg (VERDICT r4 #5): develop
    is codec-agnostic, but until round 5 the certified preview leg only
    covered the modern codec. Same gates as bench_preview_tpu: decode
    checksum vs the known-image oracle, develop vs the f64 scalar model
    (<= 1 LSB/channel), then the inline-xN fused throughput."""
    import os

    import jax
    import jax.numpy as jnp

    from mcraw import encode as E
    from mcraw.kernels import pallas_develop as PD
    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import unpack as U
    from mcraw.kernels.checksum import device_checksum

    # 4 distinct frames as 2 batched pairs — 2 develop custom-calls per
    # program (the remote-compile helper dies at >= 4 inline develop
    # calls), 4 frames per dispatch; falls back to unbatched n=2.
    nleg = 4
    cache = f"/root/.cache/mcraw_bench_legacy_{H}x{W}_4.npz"
    try:
        z = np.load(cache)
        imgs_l = [z[f"img{k}"] for k in range(nleg)]
        payloads = [z[f"pay{k}"] for k in range(nleg)]
    except Exception:
        imgs_l = imgs[:nleg]
        payloads = [
            np.frombuffer(E.encode_legacy(im), dtype=np.uint8)
            for im in imgs_l
        ]

    cfa = (0, 1, 1, 2)
    params = jnp.asarray(
        PD.pack_develop_params(
            np.zeros(4, np.float32), 4095.0, np.ones(3, np.float32),
            np.diag([0.9642, 1.0, 0.8249]).astype(np.float32),
        )
    )
    plans = [U.prepare_legacy(p, W, H) for p in payloads]
    chunked = [PL.prepare_chunked_legacy_v5(pl) for pl in plans]
    nc, segs = chunked[0][3], chunked[0][4]
    lrows = max(c[5] for c in chunked)
    argsets = [
        tuple(map(jax.device_put, chunked[k][:3])) + (params,)
        for k in range(nleg)
    ]

    def decode(p2d, base, meta):
        out = PL._unpack_legacy_pallas_v5.__wrapped__(
            p2d, base, meta, num_chunks=nc, rows=lrows
        )
        return out[: H * segs].reshape(H, segs * 128)[:, :W]

    # Gate 1: legacy decode checksum vs the known images.
    dec_jit = jax.jit(
        lambda p2d, base, meta: device_checksum(
            decode(p2d, base, meta), interpret=False
        )
    )
    for k in range(nleg):
        got = int(jax.block_until_ready(dec_jit(*argsets[k][:3])))
        exp = int(imgs_l[k].astype(np.int64).sum() & 0xFFFFFFFF)
        assert got == exp, f"legacy preview decode gate: {got} != {exp}"

    def call(p2d, base, meta, prm):
        rgba = PD.develop_rgba_pallas.__wrapped__(
            decode(p2d, base, meta), prm, None,
            height=H, width=W, cfa=cfa,
        )
        return device_checksum(rgba, interpret=False)

    # Gate 2: develop half vs the f64 scalar model on one frame.
    from mcraw.preview import develop_f64

    def full_rgba(p2d, base, meta, prm):
        return PD.develop_rgba_pallas.__wrapped__(
            decode(p2d, base, meta), prm, None,
            height=H, width=W, cfa=cfa,
        )

    rgba0 = np.asarray(jax.jit(full_rgba)(*argsets[0])).astype(np.int64)
    model = develop_f64(
        imgs_l[0], np.zeros(4), 4095.0, np.ones(3),
        np.diag([0.9642, 1.0, 0.8249]), cfa,
    )
    got3 = np.stack(
        [rgba0 & 0xFF, (rgba0 >> 8) & 0xFF, (rgba0 >> 16) & 0xFF], axis=-1
    )
    err = int(np.abs(got3 - model).max())
    assert err <= 1, f"legacy preview develop gate: max |err| {err} > 1 LSB"

    single = jax.jit(call)
    per = [
        int(jax.block_until_ready(single(*argsets[k]))) for k in range(nleg)
    ]

    def call2(pa, ba, ma, pb, bb, mb, prm):
        rgba = PD.develop_rgba_pallas.__wrapped__(
            jnp.stack([decode(pa, ba, ma), decode(pb, bb, mb)]), prm, None,
            height=H, width=W, cfa=cfa,
        )
        return device_checksum(rgba.reshape(2 * H, W), interpret=False)

    args2 = [
        argsets[0][:3] + argsets[1][:3] + (params,),
        argsets[2][:3] + argsets[3][:3] + (params,),
    ]
    try:
        s2 = jax.jit(call2)
        for j in range(2):
            got = int(jax.block_until_ready(s2(*args2[j]))) % (1 << 32)
            exp = (per[2 * j] + per[2 * j + 1]) % (1 << 32)
            assert got == exp, f"legacy paired develop gate: {got} != {exp}"
        return 1.0 / _bench_inline_xn(
            call2, args2, sum(per) % (1 << 32), frames_per_call=2
        )
    except Exception as e:  # helper crash / Mosaic reject of the lift
        import sys

        print(f"legacy paired develop leg fell back ({type(e).__name__}: "
              f"{e}); using unbatched n=2", file=sys.stderr)
        want01 = (per[0] + per[1]) % (1 << 32)
        return 1.0 / _bench_inline_xn(call, argsets[:2], want01)


_REF_FLOOR_CACHE = "/root/.cache/mcraw_ref_floor.json"


def _ref_floor(key: str, fps: float | None) -> float | None:
    """Best-ever compiled-reference fps across runs (VERDICT r3 #6/#7):
    this box's 1-vCPU host timings swing 2x with load, and a per-run
    denominator made vs_baseline meaningless (11.02 -> 18.33 at flat
    device fps). Host noise only ever makes the reference LOOK slower,
    so the max over history is the stable capability estimate."""
    import json as _json
    import os

    hist = {}
    try:
        with open(_REF_FLOOR_CACHE) as f:
            hist = _json.load(f)
    except Exception:
        pass
    if fps is not None:
        hist[key] = max(float(hist.get(key, 0.0)), fps)
        try:
            os.makedirs(os.path.dirname(_REF_FLOOR_CACHE), exist_ok=True)
            tmp = _REF_FLOOR_CACHE + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(hist, f)
            os.replace(tmp, _REF_FLOOR_CACHE)
        except Exception:
            pass
    return hist.get(key)


def bench_reference_cpu(payloads):
    try:
        sys.path.insert(0, ".")
        from tools import ref_shim

        if ref_shim.get_lib() is None:
            return _ref_floor(f"modern_{W}x{H}", None)
        # warm
        ref_shim.ref_decode(payloads[0], W, H)
        # Best-of-run per frame: the mean is hostage to transient load.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(FRAMES):
                ref_shim.ref_decode(payloads[i], W, H)
            best = min(best, (time.perf_counter() - t0) / FRAMES)
        return _ref_floor(f"modern_{W}x{H}", 1.0 / best)
    except Exception:
        return _ref_floor(f"modern_{W}x{H}", None)


def _tpu_preflight(tries=12, probe_timeout=100, sleep_s=90):
    """Bounded check that the accelerator backend can initialize AND
    execute.

    The axon TPU lives behind a relay; when the relay is down, jax init
    HANGS (it does not error), which would leave the bench producing no
    output at all — and in the 2026-08-20 outage mode `jax.devices()`
    still SUCCEEDED while any execute hung, so the probe must run an
    EXECUTE (CLAUDE.md). Probe in a subprocess with a timeout; retry
    through flapping-relay windows — worst-case patience is
    tries * (probe_timeout + sleep_s), ~38 min at the defaults, which
    covers the short down-windows seen 08-20→21 — then fall back to
    CPU with an explicit note instead of hanging forever.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    for k in range(tries):
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; jax.devices(); "
                 "int(jnp.arange(8).sum())"],
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

    # Worst-case content: full-range noise with one 5-bit tile — the
    # slowest configuration the format can force on the current kernel
    # (general path, nfields=3, near-maximal DMA spans). Pure all-16-bit
    # frames take the uniform16 fast path and are reported separately as
    # all16_fps (they are now FASTER than the headline mix, so calling
    # them "worst case" would overstate the guaranteed floor).
    try:
        imgs_w, payloads_w = make_frames(content="worst")
        fps_worst, _ = bench_tpu(imgs_w, payloads_w, use_pallas=use_pallas)
    except Exception as e:
        print(f"warning: worst-case leg failed ({e!r})", file=sys.stderr)
        fps_worst = None
    try:
        imgs_a, payloads_a = make_frames(content="all16")
        fps_all16, _ = bench_tpu(imgs_a, payloads_a, use_pallas=use_pallas)
    except Exception as e:
        print(f"warning: all16 leg failed ({e!r})", file=sys.stderr)
        fps_all16 = None

    # Legacy codec (the other half of the reference's L2) and the fused
    # decode->develop preview: certified in the SAME driver-visible
    # artifact with the same discipline (VERDICT r3 #2).
    try:
        fps_legacy = bench_legacy_tpu(imgs) if use_pallas is None else None
    except Exception as e:
        print(f"warning: legacy leg failed ({e!r})", file=sys.stderr)
        fps_legacy = None
    try:
        fps_preview = (
            bench_preview_tpu(payloads, imgs) if use_pallas is None else None
        )
    except Exception as e:
        print(f"warning: preview leg failed ({e!r})", file=sys.stderr)
        fps_preview = None

    try:
        fps_preview_legacy = (
            bench_preview_legacy_tpu(imgs) if use_pallas is None else None
        )
    except Exception as e:
        print(f"warning: legacy preview leg failed ({e!r})", file=sys.stderr)
        fps_preview_legacy = None
    try:
        fps_preview_malvar = (
            bench_preview_tpu(payloads, imgs, demosaic="malvar")
            if use_pallas is None else None
        )
    except Exception as e:
        print(f"warning: malvar preview leg failed ({e!r})", file=sys.stderr)
        fps_preview_malvar = None

    # 1080p legs (VERDICT r4 #4): small-frame dispatch amortization is
    # exactly where per-launch overhead bites — certify it instead of
    # leaving the 1080p numbers as engineering-JSON folklore.
    try:
        imgs_hd, payloads_hd = make_frames(h=1080, w=1920)
        fps_1080, _ = bench_tpu(
            imgs_hd, payloads_hd, use_pallas=use_pallas, h=1080, w=1920
        )
    except Exception as e:
        print(f"warning: 1080p leg failed ({e!r})", file=sys.stderr)
        imgs_hd, fps_1080 = None, None
    try:
        fps_legacy_1080 = (
            bench_legacy_tpu(imgs_hd, h=1080, w=1920)
            if use_pallas is None and imgs_hd is not None
            else None
        )
    except Exception as e:
        print(f"warning: 1080p legacy leg failed ({e!r})", file=sys.stderr)
        fps_legacy_1080 = None

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
                "all16_fps": (
                    round(fps_all16, 1) if fps_all16 else None
                ),
                "legacy_fps_4k": (
                    round(fps_legacy, 1) if fps_legacy else None
                ),
                "decode_develop_fps": (
                    round(fps_preview, 1) if fps_preview else None
                ),
                "decode_develop_malvar_fps": (
                    round(fps_preview_malvar, 1)
                    if fps_preview_malvar else None
                ),
                "decode_develop_legacy_fps": (
                    round(fps_preview_legacy, 1)
                    if fps_preview_legacy else None
                ),
                "fps_1080p": round(fps_1080, 1) if fps_1080 else None,
                "legacy_fps_1080p": (
                    round(fps_legacy_1080, 1) if fps_legacy_1080 else None
                ),
                "latency_ms_single_frame": round(latency_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
