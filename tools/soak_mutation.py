#!/usr/bin/env python3
"""Payload-MUTATION differential soak (VERDICT r2 #2): decode layouts the
canonical encoder never emits, differentially against the compiled C++
reference.

The canonical encoder always picks ref = block min, the smallest bits
class, canonical metadata-stream coding, 64-padded declared counts, and
adjacent streams. A decoder bug in any other format-legal layout would
pass the canonical soaks — so this one drives NONCANONICAL payloads:

  - refs below the block min (incl. 0), and for modern MAIN data refs up
    to 65535 (they travel through the refs stream as full uint16);
  - wraparound refs: bits>=11 classes store resid = (v - ref) mod 2^16,
    both decoders add refs in uint16 arithmetic (RawData.cpp:581-593,
    RawData_Legacy.cpp:483-486);
  - over-wide bits incl. header nibbles 12-15 (all decode as the 16-bit
    class: RawData.cpp:454-457, RawData_Legacy.cpp:395+:435-438), in main
    data AND in both metadata streams;
  - junk gap bytes before each metadata stream (offsets, not adjacency,
    define the layout);
  - arbitrary (non-reference) tail padding values in metadata streams
    (both decoders must crop identically);
  - encodedWidth/Height over-declared, encodedHeight not a multiple of 4.

Each case must decode element-exactly identically through
  - the compiled reference (tools/ref_shim),
  - the NumPy oracle,
  - the jitted XLA device path (sampled; CPU backend here).
Any mismatch dumps a reproducer .npz next to this file.

Deliberately NOT fuzzed against the reference (UB there, pinned by named
tests in tests/test_malformed_parity.py instead): declared stream counts
not a multiple of 64 (vector overrun, RawData.cpp:476 vs :485-494),
bits values > 16 in the bits stream (OOB table index, RawData.cpp:419),
truncated payloads (stale/uninitialized buffer reuse).

Usage: python tools/soak_mutation.py [seconds] (default 600)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_coder(rng, *, cap_bits, cap_ref, wrap_ok):
    """Random valid (bits, refs) chooser for encode.py's _coded contract."""

    def coder(blocks, ref_max):
        n = len(blocks)
        mins = np.minimum(blocks.min(axis=1), cap_ref)
        kind = rng.integers(0, 3, size=n)
        refs = rng.integers(0, mins + 1)  # <= min: no wraparound needed
        refs = np.where(kind == 0, 0, refs)  # stress ref=0
        if wrap_ok:
            # Arbitrary refs under a 16-bit class: resid wraps mod 2^16.
            refs = np.where(
                kind == 2, rng.integers(0, cap_ref + 1, size=n), refs
            )
        resid = (blocks - refs[:, None]) & 0xFFFF
        needed = np.array(
            [int(x).bit_length() for x in resid.max(axis=1)]
        )
        lo = np.where(needed <= 10, needed, 11)
        bits = rng.integers(lo, cap_bits + 1)
        # Anything needing >10 bits (incl. wraparound picks) must use a
        # 16-bit class (nibbles/values 11..cap_bits).
        bits = np.where(needed > 10, np.maximum(bits, 11), bits)
        return bits, refs

    return coder


def random_image(rng, h, w):
    from tools.soak_differential import random_image as ri

    return ri(rng, h, w)


def bayer_scene(rng, h, w):
    """Phone-sensor-like content (VERDICT r3 #9): 2x2 CFA-periodic channel
    means (G brighter than R/B), a smooth illumination gradient,
    level-scaled shot noise, deep shadows, and saturating specular
    highlights at a realistic white level. Produces the block-class
    mixtures real encoders see — mostly 9-12 bit mids, 5-8 bit shadows,
    16-bit-class highlight blocks — with per-block refs that track the
    local mean (unlike uniform noise, where refs are ~0)."""
    depth = int(rng.choice([10, 12, 14]))
    white = (1 << depth) - 1
    black = int(rng.integers(0, 260))
    # Illumination: product of two smooth 1-D profiles + a tilt.
    gy = np.interp(
        np.arange(h), [0, h - 1], rng.uniform(0.05, 1.0, 2)
    )[:, None]
    gx = np.interp(
        np.arange(w), [0, w - 1], rng.uniform(0.05, 1.0, 2)
    )[None, :]
    lum = gy * gx
    # CFA gains: G sites ~unity, R/B lower (white balance applied later
    # in the pipeline, not on the sensor).
    gains = np.array(
        [
            [rng.uniform(0.35, 0.7), 1.0],
            [1.0, rng.uniform(0.35, 0.7)],
        ]
    )
    cfa_gain = np.tile(gains, ((h + 1) // 2, (w + 1) // 2))[:h, :w]
    sig = lum * cfa_gain * white * rng.uniform(0.1, 0.9)
    # Shot noise ~ sqrt(signal), plus read noise.
    img = sig + rng.normal(0, 1, (h, w)) * (
        np.sqrt(np.maximum(sig, 0)) * 0.8 + 2.0
    )
    # Specular highlights: a few saturating blobs.
    for _ in range(int(rng.integers(0, 4))):
        cy, cx = int(rng.integers(0, h)), int(rng.integers(0, w))
        r = int(rng.integers(2, 12))
        yy, xx = np.ogrid[:h, :w]
        img = np.where(
            (yy - cy) ** 2 + (xx - cx) ** 2 < r * r, float(white), img
        )
    return (img + black).clip(0, white).astype(np.uint16)


def make_phone_coder(rng, *, legacy):
    """Conservative encoder heuristics phone firmware plausibly uses (the
    canonical test coder always picks the MINIMAL class): ref = block
    min, but bits rounded UP to a coarse class set, or chosen per-ROW of
    blocks (one class for a whole stripe), or with a fixed headroom bit."""
    coarse = np.array([0, 1, 2, 4, 6, 8, 10, 16], dtype=np.int64)
    style = int(rng.integers(0, 3))
    row_blocks = int(rng.choice([8, 16, 32, 64]))

    def coder(blocks, ref_max):
        n = len(blocks)
        refs = np.minimum(blocks.min(axis=1), ref_max)
        resid = (blocks - refs[:, None]) & 0xFFFF
        needed = np.array(
            [int(x).bit_length() for x in resid.max(axis=1)]
        )
        if style == 0:  # round up to a coarse class set
            bits = coarse[np.searchsorted(coarse, needed)]
        elif style == 1:  # one class per row-of-blocks stripe
            bits = needed.copy()
            for s in range(0, n, row_blocks):
                bits[s : s + row_blocks] = bits[s : s + row_blocks].max()
        else:  # fixed headroom bit (never risk the tight class)
            bits = np.where((needed > 0) & (needed < 16), needed + 1, needed)
        bits = np.where(needed > 10, np.maximum(bits, 11), bits)
        cap = 15 if legacy else 16
        return np.minimum(bits, cap), refs

    return coder


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
    iters = fails = 0
    while time.time() - t0 < budget_s:
        iters += 1
        h = int(rng.integers(4, 120)) & ~3 or 4
        w = int(rng.integers(16, 500))
        phone = iters % 2 == 0  # alternate flavors (VERDICT r3 #9)
        if phone:
            # Real-encoder heuristics: sensor-like content, encodedWidth
            # rounded to a line pitch, encodedHeight padded to a row
            # group, conservative-class main coder, canonical metadata.
            img = bayer_scene(rng, h, w)
            pitch = int(rng.choice([64, 128, 256, 512]))
            ew = -(-w // pitch) * pitch
            rowg = int(rng.choice([4, 8, 16, 32]))
            eh = -(-h // rowg) * rowg
            gaps = (b"", b"")
            meta_tail = None
            main_coder = make_phone_coder(rng, legacy=False)
            meta_coder = None
        else:
            img = random_image(rng, h, w)
            ew = (w + 63) // 64 * 64 + 64 * int(rng.integers(0, 3))
            # encodedHeight: any value >= h, incl. non-multiples of 4.
            eh = h + int(rng.integers(0, 9))
            gaps = (
                rng.bytes(int(rng.integers(0, 64))),
                rng.bytes(int(rng.integers(0, 64))),
            )
            meta_tail = rng.integers(
                0, 1 << 16, size=int(rng.integers(0, 64)), dtype=np.uint16
            )
            main_coder = make_coder(
                rng, cap_bits=16, cap_ref=0xFFFF, wrap_ok=True
            )
            meta_coder = make_coder(
                rng, cap_bits=15, cap_ref=0x0FFF, wrap_ok=True
            )
        do_xla = iters % 10 == 1
        try:
            payload = np.frombuffer(
                E.encode_modern(
                    img, encoded_width=ew, encoded_height=eh,
                    coder=main_coder, meta_coder=meta_coder,
                    meta_tail=meta_tail, gaps=gaps,
                ),
                dtype=np.uint8,
            )
            n_ref, ref = ref_shim.ref_decode(payload, w, h)
            ours = NR.decode_modern(payload, w, h)
            rows_written = 4 * ((eh + 3) // 4)
            ok = (
                n_ref == rows_written * w
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
                Path(__file__).with_name(f"mut_fail_modern_{iters}.npz"),
                img=img, payload=payload, h=h, w=w, note=str(ref)[:200],
            )
            print(f"MODERN FAIL iter {iters} h={h} w={w}", flush=True)

        # Legacy: inline headers cap refs at 12 bits, nibbles at 15.
        try:
            leg_coder = (
                make_phone_coder(rng, legacy=True)
                if phone
                else make_coder(rng, cap_bits=15, cap_ref=0x0FFF, wrap_ok=True)
            )
            table = bool(rng.integers(0, 2))
            crows = (
                None if rng.integers(0, 2) else int(rng.integers(1, h + 4))
            )
            pl = np.frombuffer(
                E.encode_legacy(
                    img, chunk_rows=crows, add_offset_table=table,
                    coder=leg_coder,
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
                Path(__file__).with_name(f"mut_fail_legacy_{iters}.npz"),
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
