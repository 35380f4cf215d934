#!/usr/bin/env python3
"""Extended randomized differential soak: our decoders vs the compiled
C++ reference (`raw::Decode` / `raw::DecodeLegacy`) on random geometries
and content mixes far beyond the fixed pytest samples.

Per iteration: random (h, w), random per-region bit depth (0-16, incl.
hard mixes and degenerate all-0 / all-16 frames), encode with our exact
codec inverses, then require element-exact agreement between
  - the compiled reference decoder,
  - the NumPy oracle,
  - the jitted XLA device path (CPU backend here),
for both codecs. Any mismatch dumps a reproducer .npz next to this file.

Usage: python tools/soak_differential.py [seconds] (default 600)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def random_image(rng, h, w):
    """Content engineered to hit every block class: per-region bit depth."""
    kind = rng.integers(0, 5)
    if kind == 0:  # constant (bits=0 blocks + pure reference offsets)
        return np.full((h, w), int(rng.integers(0, 1 << 16)), np.uint16)
    if kind == 1:  # full-range noise (all-16-bit blocks)
        return rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    if kind == 2:  # low-entropy gradient + noise (small bits classes)
        base = (
            np.linspace(0, int(rng.integers(16, 4096)), w)[None, :]
            + np.linspace(0, int(rng.integers(16, 512)), h)[:, None]
        )
        noise = rng.normal(0, float(rng.uniform(0.1, 30)), size=(h, w))
        return (base + noise).clip(0, 65535).astype(np.uint16)
    if kind == 3:  # per-band bit depth stripes (mixes classes in one frame)
        img = np.zeros((h, w), np.uint16)
        y = 0
        while y < h:
            band = int(rng.integers(4, 33))
            bits = int(rng.integers(0, 17))
            hi = (1 << bits) if bits else 1
            img[y : y + band] = rng.integers(
                0, hi, size=(min(band, h - y), w), dtype=np.uint16
            )
            y += band
        return img
    # kind == 4: sparse impulses over a flat field (tiny bits + big refs)
    img = np.full((h, w), int(rng.integers(0, 60000)), np.uint16)
    n = int(rng.integers(1, 1 + h * w // 64))
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    img[ys, xs] = rng.integers(0, 1 << 16, size=n, dtype=np.uint16)
    return img


def main():
    budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mcraw import encode as E
    from mcraw.kernels import numpy_ref as NR
    from mcraw.kernels import unpack as U
    from tools import ref_shim

    assert ref_shim.get_lib() is not None, "reference lib unavailable"

    rng = np.random.default_rng(int(time.time()) % (1 << 31))
    t0 = time.time()
    iters = 0
    fails = 0
    while time.time() - t0 < budget_s:
        iters += 1
        # Modern: any geometry (w padded to 64 internally by the encoder).
        h = int(rng.integers(4, 200)) & ~3 or 4
        w = int(rng.integers(16, 700))
        img = random_image(rng, h, w)
        # Random over-padded encode geometry exercises the crop-from-
        # encodedWidth semantics (RawData.cpp:598-608): encodedWidth is any
        # 64-multiple >= w, encodedHeight any 4-multiple >= h.
        ew = (w + 63) // 64 * 64 + 64 * int(rng.integers(0, 3))
        eh = (h + 3) // 4 * 4 + 4 * int(rng.integers(0, 3))
        payload = np.frombuffer(
            E.encode_modern(img, encoded_width=ew, encoded_height=eh),
            dtype=np.uint8,
        )
        # The jitted XLA leg retraces per geometry (seconds each on this
        # 1-vCPU box), so sample it; oracle-vs-reference runs every iter.
        do_xla = iters % 10 == 1
        try:
            n_ref, ref = ref_shim.ref_decode(payload, w, h)
            ours = NR.decode_modern(payload, w, h)
            # The reference writes encodedHeight rows regardless of the
            # requested height (RawData.cpp:571-609) — n_ref is eh * w.
            ok = (
                n_ref == eh * w
                and np.array_equal(ref[:h, :w], img)
                and np.array_equal(ours, img)
            )
            if ok and do_xla:
                plan = U.prepare_modern(payload, w, h)
                xla = np.asarray(
                    U.decode_modern_device(
                        plan.payload, plan.offsets, plan.cls, plan.refs,
                        tiles_y=plan.tiles_y, tiles_x=plan.tiles_x,
                        width=w, height=h,
                    )
                )
                ok = np.array_equal(xla, img)
        except Exception as e:  # noqa: BLE001 — soak must record, not die
            ok, ref = False, repr(e)
        if not ok:
            fails += 1
            np.savez(
                Path(__file__).with_name(f"soak_fail_modern_{iters}.npz"),
                img=img, payload=payload, h=h, w=w, note=str(ref)[:200],
            )
            print(f"MODERN FAIL iter {iters} h={h} w={w}", flush=True)

        # Legacy: same image, legacy codec (internally pads width to 32).
        try:
            # Random chunk-table shape: absent, or chunks of random height
            # (exercises the chunk-parallel host scan + the backwards 0xFF
            # table walk, RawData_Legacy.cpp:452-469).
            table = bool(rng.integers(0, 2))
            crows = (
                None if rng.integers(0, 2) else int(rng.integers(1, h + 4))
            )
            pl = np.frombuffer(
                E.encode_legacy(
                    img, chunk_rows=crows, add_offset_table=table
                ),
                dtype=np.uint8,
            )
            n_ref, ref = ref_shim.ref_decode_legacy(pl, w, h)
            ours = NR.decode_legacy(pl, w, h)
            ok = (
                n_ref == h * w
                and np.array_equal(ref[:h, :w], img)
                and np.array_equal(ours, img)
            )
            if ok and do_xla:
                lp = U.prepare_legacy(pl, w, h)
                xla = np.asarray(
                    U.decode_legacy_device(
                        lp.payload, lp.offsets, lp.cls, lp.refs,
                        padded_width=lp.padded_width, width=w, height=h,
                    )
                )
                ok = np.array_equal(xla, img)
        except Exception as e:  # noqa: BLE001
            ok, ref = False, repr(e)
        if not ok:
            fails += 1
            np.savez(
                Path(__file__).with_name(f"soak_fail_legacy_{iters}.npz"),
                img=img, payload=pl, h=h, w=w, note=str(ref)[:200],
            )
            print(f"LEGACY FAIL iter {iters} h={h} w={w}", flush=True)

        if iters % 50 == 0:
            print(
                f"{iters} iters, {fails} fails, "
                f"{time.time() - t0:.0f}s elapsed",
                flush=True,
            )

    print(f"DONE: {iters} iterations, {fails} failures", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
