"""Pallas unpack kernel, interpret mode (CPU). Real-TPU correctness is gated
separately in bench.py via checksums before any timing."""

import numpy as np
import pytest

pytest.importorskip("jax")

from mcraw import encode as E  # noqa: E402
from mcraw.kernels import pallas_unpack as PK  # noqa: E402


@pytest.mark.parametrize("maxv", [255, 4095, 65535])
def test_pallas_interpret_matches_image(rng, maxv):
    img = rng.integers(0, maxv + 1, size=(16, 256), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas(payload, 256, 16, interpret=True))
    assert np.array_equal(out, img)


def test_pallas_interpret_mixed_classes(rng):
    h, w = 16, 640
    img = np.zeros((h, w), dtype=np.uint16)
    for i, b in enumerate(range(0, 17, 2)):
        lo = 0 if b == 0 else 1 << (b - 1)
        img[:, i * 64 : (i + 1) * 64] = rng.integers(
            lo, (1 << b) if b else 1, size=(h, 64)
        )
    img[:, 576:] = rng.integers(0, 128, size=(h, 64))
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas(payload, w, h, interpret=True))
    assert np.array_equal(out, img)


def test_pallas_interpret_multi_chunk(rng):
    """More blocks than one chunk (exercises base-row DMA offsets)."""
    h, w = 32, 2048  # N = 8*32*4 = 1024 blocks = several chunks
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas(payload, w, h, interpret=True))
    assert np.array_equal(out, img)


def test_pallas_interpret_cropped_width(rng):
    img = rng.integers(0, 4096, size=(8, 100), dtype=np.uint16)
    payload = np.frombuffer(
        E.encode_modern(img, encoded_width=192), dtype=np.uint8
    )
    out = np.asarray(PK.decode_modern_pallas(payload, 100, 8, interpret=True))
    assert np.array_equal(out, img)


class TestLegacyPallas:
    def test_bitwidths(self, rng):
        from mcraw.kernels import pallas_legacy as PL

        for maxv in (255, 4095, 65535):
            img = rng.integers(0, maxv + 1, size=(8, 96), dtype=np.uint16)
            payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
            out = np.asarray(PL.decode_legacy_pallas(payload, 96, 8, interpret=True))
            assert np.array_equal(out, img), maxv

    def test_padded_width_and_multichunk(self, rng):
        from mcraw.kernels import pallas_legacy as PL

        img = rng.integers(0, 4096, size=(24, 1000), dtype=np.uint16)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        out = np.asarray(PL.decode_legacy_pallas(payload, 1000, 24, interpret=True))
        assert np.array_equal(out, img)

    @pytest.mark.parametrize(
        "shape", [(8, 96), (24, 1000), (5, 50), (16, 1920)]
    )
    def test_v5_fused_interleave(self, rng, shape):
        """v5: 8 blocks/row -> 128 finished pixels, no epilogue."""
        from mcraw.kernels import pallas_legacy as PL

        h, w = shape
        img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        out = np.asarray(
            PL.decode_legacy_pallas_v5(payload, w, h, interpret=True)
        )
        assert np.array_equal(out, img)

    def test_v5_bitwidths(self, rng):
        from mcraw.kernels import pallas_legacy as PL

        for maxv in (1, 255, 1023, 65535):
            img = rng.integers(0, maxv + 1, size=(8, 96), dtype=np.uint16)
            payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
            out = np.asarray(
                PL.decode_legacy_pallas_v5(payload, 96, 8, interpret=True)
            )
            assert np.array_equal(out, img), maxv

    @pytest.mark.parametrize(
        "plane_mode", ["halves", "bytes", "packed", "packed2"]
    )
    def test_v5_v6_plane_modes(self, rng, plane_mode):
        """All pick-operand layouts stay exact on both legacy kernels:
        "halves" (f32 16-bit halves, HIGHEST), "bytes" (bf16 byte planes,
        the default), "packed" (one-dot pair fetch, c = p_q + p_{q+1}<<8,
        variable-shift select). Full 16-bit range content."""
        import jax.numpy as jnp
        from mcraw.kernels import pallas_legacy as PL

        h, w = 16, 1920
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        out = np.asarray(
            PL.decode_legacy_pallas_v5(
                payload, w, h, plane_mode=plane_mode, interpret=True
            )
        )
        assert np.array_equal(out, img)
        light = PL.prepare_legacy_light(payload, w, h)
        assert light is not None
        p32, offs, bits, refs, pw, rows = light
        out6 = PL.decode_legacy_device_v6.__wrapped__(
            jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
            jnp.asarray(np.asarray(refs, np.int32)),
            pw=pw, h=h, width=w, rows=rows, plane_mode=plane_mode,
            interpret=True,
        )
        assert np.array_equal(np.asarray(out6), img)

    @pytest.mark.parametrize(
        "plane_mode", ["halves", "bytes", "packed", "packed2"]
    )
    def test_v6_subgrouped_pick(self, rng, plane_mode):
        """The pinned non-default subgrouped-window pick (sub=N: modern-
        style chunk-wide plane scratch + per-subgroup 8-aligned window
        dots) stays exact for every pick-operand layout. Interpret-only:
        the sub path SIGABRTs Mosaic on hw (rejected for perf anyway, see
        CLAUDE.md)."""
        import jax.numpy as jnp
        from mcraw.kernels import pallas_legacy as PL

        h, w = 16, 1920
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        light = PL.prepare_legacy_light(payload, w, h)
        assert light is not None
        p32, offs, bits, refs, pw, rows = light
        out6 = PL.decode_legacy_device_v6.__wrapped__(
            jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
            jnp.asarray(np.asarray(refs, np.int32)),
            pw=pw, h=h, width=w, rows=rows, plane_mode=plane_mode,
            sub=64, interpret=True,
        )
        assert np.array_equal(np.asarray(out6), img)

    @pytest.mark.parametrize("meta_mode", ["bytedot", "onedot", "dot3"])
    def test_v5_meta_modes(self, rng, meta_mode):
        """Every meta lane-expansion structure is element-exact on both
        legacy kernels: "bytedot" (ONE DEFAULT bf16 byte-plane dot,
        {1,256,65536} selector — the default), "onedot" (fused f32 HIGHEST
        (b,24)x(24,384)), "dot3" (three f32 HIGHEST (b,8)x(8,128) dots).
        Full 16-bit content so refs exercise all 16 bits."""
        import jax.numpy as jnp
        from mcraw.kernels import pallas_legacy as PL

        h, w = 16, 1920
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        plan = PL.U.prepare_legacy(payload, w, h)
        p2d, base, meta, nc, segs, rows = PL.prepare_chunked_legacy_v5(plan)
        out = PL._unpack_legacy_pallas_v5(
            p2d, base, meta, num_chunks=nc, rows=rows, meta_mode=meta_mode,
            interpret=True,
        )
        got = np.asarray(out)[: h * segs].reshape(h, segs * 128)[:, :w]
        assert np.array_equal(got, img)
        if meta_mode == "onedot":
            return  # v6 kernel has no fused-HIGHEST variant
        light = PL.prepare_legacy_light(payload, w, h)
        p32, offs, bits, refs, pw, rows6 = light
        out6 = PL.decode_legacy_device_v6.__wrapped__(
            jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
            jnp.asarray(np.asarray(refs, np.int32)),
            pw=pw, h=h, width=w, rows=rows6, meta_mode=meta_mode,
            interpret=True,
        )
        assert np.array_equal(np.asarray(out6), img)

    @pytest.mark.parametrize("m24", [True, "lanes"])
    def test_v6_m24_meta_layouts(self, rng, m24):
        """Pinned non-default v6 meta layouts stay exact, single AND batch:
        m24=True (device-concat (b,24) block-major meta -> v5 kernel,
        rejected 0.930 vs 0.767 net) and m24="lanes" ((24,b) lane-major,
        dense in TPU tiling, transposed once per chunk in VMEM)."""
        import jax.numpy as jnp
        from mcraw.kernels import pallas_legacy as PL

        h, w = 16, 1920
        imgs = [
            rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
            for _ in range(2)
        ]
        lights = []
        for img in imgs:
            payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
            light = PL.prepare_legacy_light(payload, w, h)
            assert light is not None
            lights.append(light)
        p32, offs, bits, refs, pw, rows = lights[0]
        out6 = PL.decode_legacy_device_v6.__wrapped__(
            jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
            jnp.asarray(np.asarray(refs, np.int32)),
            pw=pw, h=h, width=w, rows=rows, m24=m24, interpret=True,
        )
        assert np.array_equal(np.asarray(out6), imgs[0])
        # batch: per-frame device prep, one launch
        rows_b = max(l[5] for l in lights)
        outb = PL.decode_legacy_device_v6_batch.__wrapped__(
            jnp.stack([jnp.asarray(l[0]) for l in lights]),
            jnp.stack([jnp.asarray(l[1]) for l in lights]),
            jnp.stack([jnp.asarray(l[2]) for l in lights]),
            jnp.stack(
                [jnp.asarray(np.asarray(l[3], np.int32)) for l in lights]
            ),
            pw=pw, h=h, width=w, rows=rows_b, m24=m24, interpret=True,
        )
        for k, img in enumerate(imgs):
            assert np.array_equal(np.asarray(outb)[k], img)


def test_pallas_batched_decode(rng):
    """Multi-frame single-launch decode (stacked chunks)."""
    from mcraw.kernels import unpack as U
    from mcraw.kernels import pallas_unpack as PK

    imgs, plans = [], []
    for _ in range(3):
        img = rng.integers(0, 4096, size=(16, 256), dtype=np.uint16)
        imgs.append(img)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        plans.append(U.prepare_modern(payload, 256, 16))
    out = np.asarray(PK.decode_modern_pallas_batch(plans, interpret=True))
    for i in range(3):
        assert np.array_equal(out[i], imgs[i])


@pytest.mark.parametrize("shape", [(16, 256), (8, 100), (32, 2048), (10, 64)])
def test_pallas_v5_fused_deinterleave(rng, shape):
    """v5 writes image rows directly (pair rows + host-permuted order)."""
    h, w = shape
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas_v5(payload, w, h, interpret=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "flat_out,chunk_mt,wide_store,shape",
    [
        (False, False, 0, (24, 384)),
        (True, True, 0, (24, 384)),
        (True, False, 1, (24, 384)),
        (True, False, 2, (24, 384)),
        # tr_sub == 1 (the 4K-class geometry: >= 64 tiles across)
        (True, False, 1, (8, 4096)),
        (True, False, 2, (8, 4096)),
        ("chunk_desc", None, 0, (24, 384)),  # chunk-wide desc matmul
        # f32 16-bit-half planes (6-pass HIGHEST picks) — the non-default
        # fallback now that bf16 byte planes are the default; both tr_sub
        # branches stay pinned
        ("halves", None, 0, (24, 384)),
        ("halves", None, 0, (8, 4096)),
        # one-dot pair-row pick (c = p0 + (p1 << 8)): variable-shift
        # select ("packed") and constant-extract + select ("packed2")
        ("packed", None, 0, (24, 384)),
        ("packed", None, 0, (8, 4096)),
        ("packed2", None, 0, (24, 384)),
        # int8 byte planes (bias -128, s8 x s8 -> s32 picks, 32-aligned
        # windows) — MEASURED r3 and rejected (0.876 vs bytes 0.669 ms
        # net 4K, ablate_sharp_null_s8_full_fields0.json); pinned
        ("s8", None, 0, (24, 384)),
        ("s8", None, 0, (8, 4096)),
        # chunk-wide pick one-hot build — MEASURED r3 and rejected
        # (0.731 vs 0.660 net, ablate_sharp_null_chunkoh_full_fields0);
        # pinned at both plane dtypes
        ("chunk_oh", None, 0, (24, 384)),
        ("chunk_oh_halves", None, 0, (8, 4096)),
        # DEFAULT-bf16 byte-plane desc dot — rejected on modern (the
        # weighted one-hot build x24 subgroups outweighs the saved MXU
        # passes; wins on legacy), pinned as a non-default A/B variant
        ("desc_byte", None, 0, (24, 384)),
        ("desc_byte", None, 0, (8, 4096)),
    ],
)
def test_pallas_v5_store_variants(rng, flat_out, chunk_mt, wide_store, shape):
    """The legacy 3D-out store path, the chunk-wide meta transpose, and the
    128-lane wide-store reshape layouts stay exact: they are the A/B
    baselines for the flat-2D default (benchmarks/probe_store2.py,
    benchmarks/ablate_sharp.py) and must not rot. Both tr_sub branches of
    the wide stores are pinned (multi-band 24x384, single-band 8x4096)."""
    h, w = shape
    img = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    from mcraw.kernels import unpack as U

    plan = U.prepare_modern(payload, w, h)
    p2d, base_rows, meta, nc, txp, tr_sub = PK.prepare_chunked_v5(plan)
    if flat_out == "chunk_desc":
        kw = dict(chunk_desc=True)
    elif flat_out == "desc_byte":
        kw = dict(desc_mode="bytedot")
    elif flat_out == "chunk_oh":
        kw = dict(chunk_oh=True)
    elif flat_out == "chunk_oh_halves":
        kw = dict(chunk_oh=True, plane_mode="halves")
    elif flat_out in ("halves", "packed", "packed2", "s8"):
        kw = dict(plane_mode=flat_out)
    else:
        # Unknown string modes must be mapped explicitly above: coercing
        # them into flat_out=<truthy str> would pass while exercising the
        # wrong path (the gap that once hid packed2).
        if not isinstance(flat_out, bool):
            raise ValueError(f"unmapped store-variant mode: {flat_out!r}")
        kw = dict(flat_out=flat_out, chunk_mt=chunk_mt,
                  wide_store=wide_store)
    img3 = PK._unpack_image_pallas_v5(
        np.asarray(p2d), np.asarray(base_rows), np.asarray(meta),
        num_chunks=nc, txp=txp, tr_sub=tr_sub, interpret=True, **kw,
    )
    got = np.asarray(img3).reshape(img3.shape[0], txp * 64)[:h, :w]
    assert np.array_equal(got, img)


def test_pallas_v5_mixed_classes(rng):
    h, w = 16, 640
    img = np.zeros((h, w), dtype=np.uint16)
    for i, b in enumerate(range(0, 17, 2)):
        lo = 0 if b == 0 else 1 << (b - 1)
        img[:, i * 64 : (i + 1) * 64] = rng.integers(
            lo, (1 << b) if b else 1, size=(h, 64)
        )
    img[:, 576:] = rng.integers(0, 128, size=(h, 64))
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas_v5(payload, w, h, interpret=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(16, 256), (8, 100), (64, 2048)])
def test_pallas_v6_device_prep(rng, shape):
    """v6: offsets/meta built on-device from the raw scan outputs."""
    import jax.numpy as jnp

    h, w = shape
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    p32, bits, refs, ty, tx, _spans = PK.prepare_modern_light(payload, w, h)
    out = np.asarray(
        PK.decode_modern_device_v6(
            jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
            ty=ty, tx=tx, height=h, width=w, interpret=True,
        )
    )
    assert np.array_equal(out, img)


def test_pallas_v6_batch_device_prep(rng):
    """v6 batch: per-frame device prep vmapped + ONE kernel launch."""
    import jax.numpy as jnp

    h, w = 16, 256
    imgs = [
        rng.integers(0, 1 << b, size=(h, w), dtype=np.uint16)
        for b in (12, 6, 16, 1)
    ]
    lights = []
    for img in imgs:
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        lights.append(PK.prepare_modern_light(payload, w, h))
    ty, tx = lights[0][3], lights[0][4]
    rmax = max(len(l[0]) for l in lights)
    p32s = np.zeros((len(lights), rmax), dtype=np.int32)
    for i, l in enumerate(lights):
        p32s[i, : len(l[0])] = l[0]
    bits = np.stack([l[1] for l in lights])
    refs = np.stack([l[2] for l in lights])
    out = np.asarray(
        PK.decode_modern_device_v6_batch(
            jnp.asarray(p32s), jnp.asarray(bits), jnp.asarray(refs),
            ty=ty, tx=tx, height=h, width=w, interpret=True,
        )
    )
    assert np.array_equal(out, np.stack(imgs))


@pytest.mark.parametrize("content", ["mid12", "all16"])
def test_v6_mesh_device_prep(rng, content):
    """v6 under shard_map: each shard builds its frames' meta on-device.
    all16: the UNIFORM16 sentinel must engage the fast path per-shard
    under the mesh too (same static threading as the batch path)."""
    import jax
    from jax.sharding import Mesh
    from mcraw.parallel import decode_frames_v6_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    h, w = 16, 256
    hi = 4096 if content == "mid12" else 1 << 16
    lo = 0 if content == "mid12" else 2048
    imgs = [
        rng.integers(lo, hi, size=(h, w), dtype=np.uint16) for _ in range(8)
    ]
    lights = []
    for img in imgs:
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        lights.append(PK.prepare_modern_light(payload, w, h))
    ty, tx = lights[0][3], lights[0][4]
    rmax = max(len(l[0]) for l in lights)
    p32s = np.zeros((len(lights), rmax), dtype=np.int32)
    for i, l in enumerate(lights):
        p32s[i, : len(l[0])] = l[0]
    bits = np.stack([l[1] for l in lights])
    refs = np.stack([l[2] for l in lights])
    nf = max(l[5][2] for l in lights)
    if content == "all16":
        assert nf == PK.UNIFORM16  # the sentinel survives the batch max()
    mesh = Mesh(np.array(jax.devices()[:4]), ("frames",))
    out = decode_frames_v6_mesh(
        p32s, bits, refs, ty=ty, tx=tx, height=h, width=w, nfields=nf,
        mesh=mesh, interpret=True,
    )
    assert len(out.sharding.device_set) == 4
    assert np.array_equal(np.asarray(out), np.stack(imgs))


def test_v6_content_spans_exact(rng):
    """Bucketed content spans: mixed-density frame (one all-16-bit band in
    low-bit content) decodes exactly with the tighter rows/sub_rows."""
    import jax.numpy as jnp

    h, w = 64, 512
    img = rng.integers(0, 16, size=(h, w), dtype=np.uint16)
    img[24:32] = rng.integers(0, 1 << 16, size=(8, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    p32, bits, refs, ty, tx, _spans = PK.prepare_modern_light(payload, w, h)
    rows, sub_rows = PK.v5_content_spans(bits, ty, tx)
    out = np.asarray(
        PK.decode_modern_device_v6(
            jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
            ty=ty, tx=tx, height=h, width=w,
            rows=rows, sub_rows=sub_rows, interpret=True,
        )
    )
    assert np.array_equal(out, img)


def test_v6_spans_adversarial_mixes(rng):
    """Span windows must hold for pathological density mixes: the scratch
    slice invariant (sub_base - chunk_base + sub_rows <= rows) broke for
    ~0.2% of random mixes before rows/sub_rows were decoupled (a late
    subgroup after dense ones, with the global-max subgroup elsewhere).
    In interpret mode a violation clamps the slice and decodes wrong
    pixels, which this catches."""
    import jax.numpy as jnp

    h, w = 4 * 4 * PK.SUBGROUPS_V5 + 8, 512  # multi-chunk + padded tail
    for trial in range(6):
        img = np.zeros((h, w), dtype=np.uint16)
        # random per-row density classes, plus one all-16-bit band and a
        # near-empty band adjacent to it
        for r in range(h):
            b = int(rng.integers(0, 17))
            img[r] = rng.integers(0, 1 << b if b else 1, size=w)
        dense = int(rng.integers(0, h - 4))
        img[dense : dense + 4] = rng.integers(0, 1 << 16, size=(4, w))
        img[dense + 4 :][:2] = 0
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        p32, bits, refs, ty, tx, (rows, sub_rows, _nf) = PK.prepare_modern_light(
            payload, w, h
        )
        out = np.asarray(
            PK.decode_modern_device_v6(
                jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
                ty=ty, tx=tx, height=h, width=w,
                rows=rows, sub_rows=sub_rows, interpret=True,
            )
        )
        assert np.array_equal(out, img), f"trial {trial}"


def test_light_prep_window_paths_agree(rng):
    """Zero-copy window path == copy path (the last frames of a clip fall
    back to copying when the mmap ends too soon)."""
    img = rng.integers(0, 4096, size=(16, 256), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    big = np.zeros(len(payload) + (64 << 20), dtype=np.uint8)
    big[: len(payload)] = payload
    rng2 = np.random.default_rng(9)
    big[len(payload):] = rng2.integers(0, 256, size=len(big) - len(payload))
    a = PK.prepare_modern_light(payload, 256, 16, window=big)
    b = PK.prepare_modern_light(payload, 256, 16, window=None)
    # Same scans; window payload words equal within the real payload.
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    n_words = len(payload) // 4
    np.testing.assert_array_equal(a[0][:n_words], b[0][:n_words])
    # And both decode to the image (trailing garbage is never addressed).
    import jax.numpy as jnp

    for p32, bits, refs, ty, tx, _sp in (a, b):
        out = np.asarray(
            PK.decode_modern_device_v6(
                jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
                ty=ty, tx=tx, height=16, width=256, interpret=True,
            )
        )
        assert np.array_equal(out, img)


def test_prepare_modern_light_validation(rng):
    from mcraw.errors import DecodeError

    img = rng.integers(0, 65536, size=(8, 64), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    with pytest.raises(DecodeError):
        PK.prepare_modern_light(payload[: len(payload) // 2], 64, 8)
    with pytest.raises(DecodeError):
        PK.prepare_modern_light(payload, 128, 8)  # width > encodedWidth


def test_pallas_v5_batched(rng):
    from mcraw.kernels import unpack as U

    imgs, plans = [], []
    for _ in range(3):
        img = rng.integers(0, 4096, size=(16, 256), dtype=np.uint16)
        imgs.append(img)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        plans.append(U.prepare_modern(payload, 256, 16))
    out = np.asarray(PK.decode_modern_pallas_batch_v5(plans, interpret=True))
    for i in range(3):
        assert np.array_equal(out[i], imgs[i])


def test_pallas_true_multichunk_v4(rng):
    """Frame large enough to span several v4 chunks (regression: a shadowed
    wrapper once decoded chunk 0 correctly and corrupted the rest)."""
    h, w = 128, 4096  # 8192 blocks = 4 chunks at 2048 blocks/chunk
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    out = np.asarray(PK.decode_modern_pallas(payload, w, h, interpret=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(16, 128), (32, 256)])
def test_pallas_legacy_v6_device_prep(rng, shape):
    """Legacy v6: host scan only; meta layout on device (pure reshapes)."""
    import jax.numpy as jnp
    from mcraw.kernels import pallas_legacy as PL

    h, w = shape
    img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
    light = PL.prepare_legacy_light(payload, w, h)
    assert light is not None
    p32, offs, bits, refs, pw, rows = light
    out = PL.decode_legacy_device_v6.__wrapped__(
        jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
        jnp.asarray(np.asarray(refs, np.int32)),
        pw=pw, h=h, width=w, rows=rows, interpret=True,
    )
    assert np.array_equal(np.asarray(out), img)


@pytest.mark.parametrize(
    "shape,plane_mode",
    [
        ((16, 96), "bytes"),  # pw=96 < 128: 2 dummy lanes per kernel row
        ((8, 300), "bytes"),  # pw=320, segs=3, ragged last segment
        ((8, 300), "packed"),
        ((6, 4032), "bytes"),  # the common phone sensor width (pw=4032)
        ((200, 300), "bytes"),  # 600 kernel rows -> chunk boundary mid-row
    ],
)
def test_pallas_legacy_v6_ragged_width(rng, shape, plane_mode):
    """Ragged padded widths (pw % 128 != 0) take the v6 device-prep path:
    _v6_legacy_build pads each image row's block run to segs*8 kernel
    lanes with zero-class dummies (VERDICT r2 #4 — 4032-wide frames used
    to fall back to host-prep v5)."""
    import jax.numpy as jnp
    from mcraw.kernels import numpy_ref as R
    from mcraw.kernels import pallas_legacy as PL

    h, w = shape
    assert R.legacy_padded_width(w) % 128 != 0
    img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
    light = PL.prepare_legacy_light(payload, w, h)
    assert light is not None
    p32, offs, bits, refs, pw, rows = light
    out = PL.decode_legacy_device_v6.__wrapped__(
        jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
        jnp.asarray(np.asarray(refs, np.int32)),
        pw=pw, h=h, width=w, rows=rows, plane_mode=plane_mode,
        interpret=True,
    )
    assert np.array_equal(np.asarray(out), img)


def test_pallas_legacy_v6_batch_ragged_width(rng):
    """Batched legacy v6 on a ragged geometry (vmapped _v6_legacy_build)."""
    import jax.numpy as jnp
    from mcraw.kernels import pallas_legacy as PL

    h, w = 8, 300
    imgs = [
        rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
        for _ in range(3)
    ]
    lights = [
        PL.prepare_legacy_light(
            np.frombuffer(E.encode_legacy(i), dtype=np.uint8), w, h
        )
        for i in imgs
    ]
    rows = max(l[5] for l in lights)
    rmax = max(len(l[0]) for l in lights)
    p32s = np.zeros((3, rmax), dtype=np.int32)
    for i, l in enumerate(lights):
        p32s[i, : len(l[0])] = l[0]
    out = PL.decode_legacy_device_v6_batch.__wrapped__(
        jnp.asarray(p32s),
        jnp.asarray(np.stack([l[1] for l in lights])),
        jnp.asarray(np.stack([l[2] for l in lights])),
        jnp.asarray(np.stack([np.asarray(l[3], np.int32) for l in lights])),
        pw=lights[0][4], h=h, width=w, rows=rows, interpret=True,
    )
    assert np.array_equal(np.asarray(out), np.stack(imgs))


def test_device_checksum_exact(rng):
    """The benchmark checksum kernel == int64 sum mod 2^32 (both the
    Pallas fold in interpret mode and the XLA fallback paths)."""
    import jax.numpy as jnp
    from mcraw.kernels.checksum import device_checksum, _checksum_2d

    for shape, dt in [
        ((96, 128), np.uint16),
        ((120, 256), np.uint16),
        ((64, 256), np.uint32),
        ((7, 128), np.uint16),   # falls back (height has no 8-divisor)
        ((16, 100), np.uint16),  # falls back (width not lane-aligned)
    ]:
        x = rng.integers(0, np.iinfo(dt).max, size=shape, dtype=dt)
        want = int(x.astype(np.int64).sum() & 0xFFFFFFFF)
        got = int(device_checksum(jnp.asarray(x)))
        assert got == want, (shape, dt)
    # wrap-around: values that overflow uint32 partial sums
    x = np.full((256, 256), 0xFFFF, dtype=np.uint16)
    want = int(x.astype(np.int64).sum() & 0xFFFFFFFF)
    assert int(_checksum_2d(jnp.asarray(x), interpret=True)) == want


class TestRequiredFields:
    """Static field-pass count (v5_required_fields): the kernel's funnel
    loop runs only max-fields-over-present-classes passes; exactness per
    content class is what makes the cut safe."""

    def test_counts_per_content(self, rng):
        # All blocks >= 11 bits = class 16 everywhere -> the UNIFORM16
        # sentinel (static-slice fast path); 9/10-bit (class 10): 2;
        # 5/6-bit (classes 5/6): 3. A single sub-11-bit block breaks
        # uniformity and the count reverts to max-over-present.
        assert PK.v5_required_fields(np.array([12, 16], np.uint16)) == (
            PK.UNIFORM16
        )
        assert PK.v5_required_fields(np.array([12, 16, 8], np.uint16)) == 1
        assert PK.v5_required_fields(np.array([9, 10], np.uint16)) == 2
        assert PK.v5_required_fields(np.array([5], np.uint16)) == 3
        assert PK.v5_required_fields(np.array([6], np.uint16)) == 3
        assert PK.v5_required_fields(np.array([0], np.uint16)) == 1
        # bits > 16 clip to the 16-bit class (RawData.cpp:424-458)
        assert PK.v5_required_fields(np.array([40], np.uint16)) == (
            PK.UNIFORM16
        )
        assert PK.v5_required_fields(np.array([40, 3], np.uint16)) == 2
        # mask form (native length_segments2 presence mask)
        assert PK.v5_required_fields_mask(1 << 12) == PK.UNIFORM16
        assert PK.v5_required_fields_mask((1 << 12) | (1 << 8)) == 1
        assert PK.v5_required_fields_mask((1 << 16) | (1 << 5)) == 3
        assert PK.v5_required_fields_mask(0) == 1

    @pytest.mark.parametrize(
        "lo,hi,nf_max",
        [
            (1 << 14, 1 << 16, 1),  # forces 16-bit blocks everywhere
            (1 << 8, 1 << 10, 2),  # 9/10-bit blocks
            (0, 64, 3),  # small classes incl. 5/6
        ],
    )
    def test_decode_exact_with_reduced_passes(self, rng, lo, hi, nf_max):
        h, w = 16, 256
        img = rng.integers(lo, hi, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        from mcraw.kernels import unpack as U

        plan = U.prepare_modern(payload, w, h)
        nf = PK.v5_required_fields_cls(plan.cls)
        assert nf <= nf_max
        # decode_modern_pallas_v5 derives the same nf internally
        out = np.asarray(
            PK.decode_modern_pallas_v5(payload, w, h, interpret=True)
        )
        assert np.array_equal(out, img)

    @pytest.mark.parametrize(
        "w,h",
        [
            (1920, 64),  # tr_sub == 1
            (256, 128),  # narrow: tr_sub == 2 (multi tile-rows/subgroup)
            (448, 32),   # tx == 7, txp == 8: dummy tile columns in play
        ],
    )
    def test_uniform16_fast_path_exact(self, rng, w, h):
        """All blocks class 16 (the format's worst case): the kernel takes
        the static-slice fast path — no pick dots, no plane builds — and
        must stay element-exact on both host-prep (v5) and device-prep
        (v6) entry points. Matches RawData.cpp:377-408 (Decode16 raw
        copy + reference add)."""
        import jax.numpy as jnp
        from mcraw.kernels import unpack as U

        img = rng.integers(2048, 1 << 16, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        plan = U.prepare_modern(payload, w, h)
        assert PK.v5_required_fields_cls(plan.cls) == PK.UNIFORM16
        out = PK.decode_modern_pallas_v5(payload, w, h, interpret=True)
        assert np.array_equal(np.asarray(out), img)

        p32, bits, refs, ty, tx, (rows, sub_rows, nf) = (
            PK.prepare_modern_light(payload, w, h)
        )
        assert nf == PK.UNIFORM16
        out6 = PK.decode_modern_device_v6.__wrapped__(
            jnp.asarray(p32), jnp.asarray(bits), jnp.asarray(refs),
            ty=ty, tx=tx, height=h, width=w, rows=rows, sub_rows=sub_rows,
            nfields=nf, interpret=True,
        )
        assert np.array_equal(np.asarray(out6), img)

    @pytest.mark.parametrize("plane_mode", ["halves", "packed"])
    def test_uniform16_nondefault_plane_mode_general_path(
        self, rng, plane_mode
    ):
        """Non-default plane_mode must NOT silently engage the uniform16
        fast path (which uses no planes at all — an A/B sweep would then
        compare identical programs). The gate routes these to the general
        kernel, which must still decode all-class-16 content exactly —
        this is also the only interpret coverage of the general path's
        class-16 machinery now that default all-16 frames take the fast
        path."""
        w, h = 256, 64
        img = rng.integers(2048, 1 << 16, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        out = PK.decode_modern_pallas_v5(
            payload, w, h, interpret=True, plane_mode=plane_mode
        )
        assert np.array_equal(np.asarray(out), img)

    def test_uniform16_batch_and_mixed_fallback(self, rng):
        """Batched v6: a batch is uniform iff ALL frames are (the sentinel
        composes through max()); a mixed batch falls back to the general
        kernel and stays exact for the uniform frame too."""
        import jax.numpy as jnp

        h, w = 32, 448
        uni = [
            rng.integers(2048, 1 << 16, size=(h, w), dtype=np.uint16)
            for _ in range(2)
        ]
        mixed = rng.integers(0, 1 << 9, size=(h, w), dtype=np.uint16)

        def light(img):
            payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
            return PK.prepare_modern_light(payload, w, h)

        for imgs in ([uni[0], uni[1]], [uni[0], mixed]):
            lights = [light(i) for i in imgs]
            ty, tx = lights[0][3], lights[0][4]
            nf = max(l[5][2] for l in lights)
            if all(l[5][2] == PK.UNIFORM16 for l in lights):
                assert nf == PK.UNIFORM16
            else:
                assert nf >= 1
            rmax = max(len(l[0]) for l in lights)
            p32s = np.zeros((len(lights), rmax), np.int32)
            for k, l in enumerate(lights):
                p32s[k, : len(l[0])] = l[0]
            out = PK.decode_modern_device_v6_batch.__wrapped__(
                jnp.asarray(p32s),
                jnp.stack([jnp.asarray(l[1]) for l in lights]),
                jnp.stack([jnp.asarray(l[2]) for l in lights]),
                ty=ty, tx=tx, height=h, width=w,
                rows=max(l[5][0] for l in lights),
                sub_rows=max(l[5][1] for l in lights),
                nfields=nf, interpret=True,
            )
            for k, img in enumerate(imgs):
                assert np.array_equal(np.asarray(out)[k], img)

    def test_v6_path_with_nfields(self, rng):
        h, w = 16, 256
        img = rng.integers(0, 1 << 10, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        p32, bits, refs, ty, tx, (rows, sub_rows, nf) = (
            PK.prepare_modern_light(payload, w, h)
        )
        assert nf == PK.v5_required_fields(bits)
        out = np.asarray(
            PK.decode_modern_device_v6(
                np.asarray(p32), bits, refs, ty=ty, tx=tx,
                height=h, width=w, rows=rows, sub_rows=sub_rows,
                nfields=nf, interpret=True,
            )
        )
        assert np.array_equal(out, img)
