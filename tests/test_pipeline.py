"""Decoder facade + batched/sharded decode on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mcraw import encode as E  # noqa: E402
from mcraw.errors import IOException  # noqa: E402
from mcraw.metadata import (  # noqa: E402
    example_container_metadata,
    example_frame_metadata,
)
from mcraw.pipeline import Decoder  # noqa: E402


def make_clip(rng, num_frames=8, h=16, w=128, codec=7):
    writer = E.ContainerWriter(example_container_metadata())
    frames = []
    for i in range(num_frames):
        img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
        frames.append(img)
        payload = E.encode_modern(img) if codec == 7 else E.encode_legacy(img)
        writer.add_frame(
            100 + i, payload, example_frame_metadata(w, h, codec)
        )
        writer.add_audio(
            rng.integers(-100, 100, size=64).astype(np.int16), i * 1000
        )
    return writer.finish(), frames


def test_load_frame_both_backends(rng):
    blob, frames = make_clip(rng, num_frames=2)
    for backend in ("numpy", "jax"):
        d = Decoder(blob, backend=backend)
        for ts, img in zip(d.frames, frames):
            out, meta = d.load_frame(ts)
            assert np.array_equal(out, img), backend
            assert meta["width"] == 128


def test_invalid_compression_type(rng):
    writer = E.ContainerWriter(example_container_metadata())
    img = rng.integers(0, 64, size=(4, 64), dtype=np.uint16)
    writer.add_frame(1, E.encode_modern(img), example_frame_metadata(64, 4, 99))
    d = Decoder(writer.finish())
    with pytest.raises(IOException, match="Invalid compression type"):
        d.load_frame(1)


def test_audio_loaders(rng):
    blob, _ = make_clip(rng, num_frames=3)
    d = Decoder(blob)
    batch = d.load_audio()
    stream = list(d.audio_chunks())
    assert len(batch) == len(stream) == 3
    for (ta, sa), (tb, sb) in zip(batch, stream):
        assert ta == tb
        assert np.array_equal(sa, sb)


def test_audio_stream_loader_object(rng):
    """load_audio_stream(): stateful loader parity (Decoder.hpp:41-45).

    The reference's loadAudio() returns the SAME loader member every call
    (Decoder.cpp:150,180), so iteration state persists across calls."""
    blob, _ = make_clip(rng, num_frames=3)
    d = Decoder(blob)
    loader = d.load_audio_stream()
    assert d.load_audio_stream() is loader  # one persistent instance
    first = loader.next()
    assert first is not None
    rest = list(loader)  # __iter__ resumes mid-stream
    assert len(rest) == 2
    assert loader.next() is None  # exhausted: next() keeps returning None
    batch = d.load_audio()
    for (ta, sa), (tb, sb) in zip(batch, [first] + rest):
        assert ta == tb and np.array_equal(sa, sb)


def test_audio_stream_loader_failure_no_advance(rng, monkeypatch):
    """A failed chunk load returns None WITHOUT advancing the index —
    AudioChunkLoaderImpl::next retries the same offset
    (/root/reference/lib/Decoder.cpp:83-93)."""
    blob, _ = make_clip(rng, num_frames=3)
    d = Decoder(blob)
    loader = d.load_audio_stream()
    assert loader.next() is not None
    reader_cls = type(d._reader)
    orig = reader_cls.audio_chunk
    monkeypatch.setattr(
        reader_cls,
        "audio_chunk",
        lambda self, i: None if i == 1 else orig(self, i),
    )
    assert loader.next() is None  # chunk 1 fails
    assert loader.next() is None  # still chunk 1: no advance on failure
    monkeypatch.undo()
    assert loader.next() is not None  # same index, now loadable
    assert loader.next() is not None  # chunk 2
    assert loader.next() is None  # end of stream


def test_decode_batch_single_device(rng):
    blob, frames = make_clip(rng, num_frames=4)
    d = Decoder(blob, backend="jax")
    imgs, metas = d.decode_batch()
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, 16, 128)
    for i, img in enumerate(frames):
        assert np.array_equal(imgs[i], img)
    assert len(metas) == 4


def test_decode_batch_legacy(rng):
    blob, frames = make_clip(rng, num_frames=2, codec=6)
    d = Decoder(blob, backend="jax")
    imgs, _ = d.decode_batch()
    for i, img in enumerate(frames):
        assert np.array_equal(np.asarray(imgs)[i], img)


def test_decode_batch_iter_bounded(rng):
    """Chunked batched decode: one launch per chunk, same pixels."""
    import mcraw.parallel as P

    blob, frames = make_clip(rng, num_frames=10)
    d = Decoder(blob, backend="jax")
    calls = []
    orig = P.decode_frames_batched

    def counting(plans, *a, **k):
        calls.append(len(plans))
        return orig(plans, *a, **k)

    P.decode_frames_batched, saved = counting, orig
    try:
        got, metas = [], []
        for imgs, ms in d.decode_batch_iter(chunk_frames=4):
            got.append(np.asarray(imgs))
            metas.extend(ms)
    finally:
        P.decode_frames_batched = saved
    assert calls == [4, 4, 2]  # bounded launches, incl. tail
    out = np.concatenate(got, axis=0)
    assert len(metas) == 10
    for i, img in enumerate(frames):
        assert np.array_equal(out[i], img)


def test_decode_batch_iter_mesh_tail(rng):
    """With a mesh, chunks round up to the mesh size; the short tail falls
    back to an unsharded launch instead of raising."""
    from mcraw.parallel import default_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    blob, frames = make_clip(rng, num_frames=11)
    d = Decoder(blob, backend="jax")
    chunks = list(d.decode_batch_iter(chunk_frames=6, mesh=default_mesh()))
    assert [c[0].shape[0] for c in chunks] == [8, 3]
    out = np.concatenate([np.asarray(c[0]) for c in chunks], axis=0)
    for i, img in enumerate(frames):
        assert np.array_equal(out[i], img)


def test_decode_batch_sharded_over_mesh(rng):
    """Frame data-parallelism over the 8-device virtual mesh."""
    from mcraw.parallel import default_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    blob, frames = make_clip(rng, num_frames=8)
    d = Decoder(blob, backend="jax")
    mesh = default_mesh()
    imgs, _ = d.decode_batch(mesh=mesh)
    # sharded across devices
    assert len(imgs.sharding.device_set) == 8
    imgs = np.asarray(imgs)
    for i, img in enumerate(frames):
        assert np.array_equal(imgs[i], img)


def test_pallas_kernel_under_mesh(rng):
    """shard_map + fused Pallas kernel per shard (interpret on CPU): the
    sharded batch path must not silently drop to the slow XLA kernel."""
    from mcraw.parallel import decode_frames_pallas_mesh, default_mesh
    from mcraw.kernels import unpack as U

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    imgs, plans = [], []
    for _ in range(8):
        img = rng.integers(0, 4096, size=(16, 256), dtype=np.uint16)
        imgs.append(img)
        payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
        plans.append(U.prepare_modern(payload, 256, 16))
    out = decode_frames_pallas_mesh(plans, default_mesh(), interpret=True)
    assert len(out.sharding.device_set) == 8
    out = np.asarray(out)
    for i, img in enumerate(imgs):
        assert np.array_equal(out[i], img)


def test_legacy_pallas_under_mesh(rng):
    """Legacy codec's fused kernel per shard under the mesh (interpret)."""
    from mcraw.parallel import decode_frames_legacy_mesh, default_mesh
    from mcraw.kernels import unpack as U

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    imgs, plans = [], []
    for _ in range(8):
        img = rng.integers(0, 4096, size=(16, 96), dtype=np.uint16)
        imgs.append(img)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        plans.append(U.prepare_legacy(payload, 96, 16))
    out = decode_frames_legacy_mesh(plans, default_mesh(), interpret=True)
    assert len(out.sharding.device_set) == 8
    out = np.asarray(out)
    for i, img in enumerate(imgs):
        assert np.array_equal(out[i], img)


def test_legacy_pallas_batch(rng):
    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import unpack as U

    imgs, plans = [], []
    for _ in range(3):
        img = rng.integers(0, 4096, size=(8, 200), dtype=np.uint16)
        imgs.append(img)
        payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
        plans.append(U.prepare_legacy(payload, 200, 8))
    out = np.asarray(PL.decode_legacy_pallas_batch_v5(plans, interpret=True))
    for i, img in enumerate(imgs):
        assert np.array_equal(out[i], img)


def test_single_frame_sharded_across_devices(rng):
    """SURVEY.md §5 long-context analogue: ONE frame's chunk/block range
    split across mesh devices, output row-sharded (interpret on CPU)."""
    from jax.sharding import Mesh
    from mcraw.parallel import decode_frame_sharded
    from mcraw.kernels import unpack as U, pallas_unpack as PK

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    # tr_sub=1 -> SUBGROUPS_V5 tile-rows per chunk; pick h for 4 chunks.
    h, w = 4 * 4 * PK.SUBGROUPS_V5, 2752
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    plan = U.prepare_modern(payload, w, h)
    assert PK.prepare_chunked_v5(plan)[3] == 4  # chunks == devices
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out = decode_frame_sharded(plan, mesh, interpret=True)
    assert len(out.sharding.device_set) == 4
    assert np.array_equal(np.asarray(out), img)

    # Decoder-level surface (same path, CPU interpret auto-selected).
    from mcraw.metadata import example_container_metadata, example_frame_metadata
    from mcraw import encode as E2

    writer = E2.ContainerWriter(example_container_metadata())
    writer.add_frame(1, E2.encode_modern(img), example_frame_metadata(w, h))
    d = Decoder(writer.finish(), backend="jax")
    out2, meta = d.load_frame_sharded(1, mesh)
    assert np.array_equal(np.asarray(out2), img)
    assert meta["width"] == w


def test_decode_batch_uneven_mesh_raises(rng):
    from mcraw.parallel import default_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    blob, _ = make_clip(rng, num_frames=3)
    d = Decoder(blob, backend="jax")
    with pytest.raises(ValueError, match="not divisible"):
        d.decode_batch(mesh=default_mesh())


def test_decode_clips_multi(rng):
    """Concurrent multi-clip decode, frame-sharded over the mesh."""
    from mcraw.parallel import decode_clips, default_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    clips, frames = [], []
    for _ in range(4):
        blob, f = make_clip(rng, num_frames=4)
        clips.append(Decoder(blob, backend="jax"))
        frames.append(f)
    imgs, metas = decode_clips(clips, mesh=default_mesh())
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, 4, 16, 128)
    for c in range(4):
        for f in range(4):
            assert np.array_equal(imgs[c, f], frames[c][f])


@pytest.mark.parametrize("codec", [7, 6])
def test_load_frame_device_pallas_kernel(rng, codec):
    """kernel='pallas' works everywhere: Mosaic on TPU, the Pallas
    interpreter elsewhere (both codecs' v5 kernels)."""
    blob, frames = make_clip(rng, num_frames=1, codec=codec)
    d = Decoder(blob, backend="jax", kernel="pallas")
    img, _ = d.load_frame_device(d.frames[0])
    assert np.array_equal(np.asarray(img), frames[0])


def test_decode_batch_v6_fast_path(rng, monkeypatch):
    """The accelerator-default _decode_batch_v6 path, driven on CPU via a
    patched eligibility check + interpret-mode kernels (conftest forces
    CPU, which otherwise always takes the plan-based path)."""
    from mcraw.metadata import example_container_metadata, example_frame_metadata
    from mcraw import encode as E2

    writer = E2.ContainerWriter(example_container_metadata())
    imgs = []
    for t in range(3):
        img = rng.integers(0, 4096, size=(16, 256), dtype=np.uint16)
        imgs.append(img)
        writer.add_frame(
            t + 1, E2.encode_modern(img), example_frame_metadata(256, 16)
        )
    d = Decoder(writer.finish(), backend="jax", kernel="pallas")
    monkeypatch.setattr(
        Decoder, "_v6_eligible", lambda self, payload: len(payload) < (1 << 26)
    )
    out, metas = d.decode_batch([1, 2, 3])
    assert np.array_equal(np.asarray(out), np.stack(imgs))
    assert len(metas) == 3

    # Mixed-codec clip falls back cleanly (returns None internally).
    writer2 = E2.ContainerWriter(example_container_metadata())
    writer2.add_frame(1, E2.encode_modern(imgs[0]), example_frame_metadata(256, 16))
    fm = example_frame_metadata(256, 16)
    fm["compressionType"] = 6
    writer2.add_frame(2, E2.encode_legacy(imgs[1]), fm)
    d2 = Decoder(writer2.finish(), backend="jax", kernel="pallas")
    monkeypatch.setattr(
        Decoder, "_v6_eligible", lambda self, payload: len(payload) < (1 << 26)
    )
    with pytest.raises(Exception):
        d2.decode_batch([1, 2])  # mixed codecs raise via the fallback


def test_v6_payload_ceiling_fallback_end_to_end(rng, monkeypatch):
    """Frames at/above the v6 device-prep payload ceiling (fp32 2^24
    word-offset exactness -> 64 MiB) must fall back to the integer
    host-prep v5 path END TO END through load_frame_device. The ceiling
    is lowered so the oversized frame stays interpret-mode tractable;
    the shipped boundary logic itself is exercised (only the platform
    gate is patched on the forced-CPU mesh)."""
    from mcraw.kernels import pallas_unpack as PK

    monkeypatch.setattr(PK, "V6_MAX_PAYLOAD", 1 << 16)
    monkeypatch.setattr(
        Decoder, "_accel_available", staticmethod(lambda: True)
    )

    # 256x128 full-range noise: 512 blocks x 128 B = 64 KiB main data
    # (+16B header + meta streams) -> over the patched ceiling.
    big = rng.integers(0, 1 << 16, size=(128, 256), dtype=np.uint16)
    small = rng.integers(0, 4096, size=(16, 128), dtype=np.uint16)
    writer = E.ContainerWriter(example_container_metadata())
    writer.add_frame(1, E.encode_modern(big), example_frame_metadata(256, 128))
    writer.add_frame(2, E.encode_modern(small), example_frame_metadata(128, 16))
    d = Decoder(writer.finish(), backend="jax", kernel="pallas")

    taken = []
    real_v6 = Decoder._load_frame_v6
    monkeypatch.setattr(
        Decoder,
        "_load_frame_v6",
        lambda self, *a, **k: taken.append("v6") or real_v6(self, *a, **k),
    )

    img, _ = d.load_frame_device(1)
    assert taken == []  # oversized frame: v6 REJECTED, v5 host-prep ran
    assert np.array_equal(np.asarray(img), big)

    img2, _ = d.load_frame_device(2)
    assert taken == ["v6"]  # under the ceiling: v6 engaged
    assert np.array_equal(np.asarray(img2), small)

    # prepare_modern_light itself refuses oversized payloads (the guard
    # the pipeline's eligibility check keeps callers away from).
    from mcraw.errors import DecodeError

    payload = np.frombuffer(E.encode_modern(big), dtype=np.uint8)
    with pytest.raises(DecodeError, match="too large"):
        PK.prepare_modern_light(payload, 256, 128)


def test_legacy_v6_device_prep_paths(rng, monkeypatch):
    """Legacy device-prep (v6) fast paths: single-frame, batch, and mesh —
    host contributes only the serial header scan; kernel metadata is laid
    out on device (pure reshapes). CPU-driven via the patched platform
    gate + interpret-mode kernels."""
    import jax
    from jax.sharding import Mesh

    monkeypatch.setattr(
        Decoder, "_accel_available", staticmethod(lambda: True)
    )
    imgs = []
    writer = E.ContainerWriter(example_container_metadata())
    for t in range(4):
        img = rng.integers(0, 4096, size=(16, 128), dtype=np.uint16)
        imgs.append(img)
        writer.add_frame(
            t + 1, E.encode_legacy(img), example_frame_metadata(128, 16, 6)
        )
    d = Decoder(writer.finish(), backend="jax", kernel="pallas")

    taken = []
    real = Decoder._load_frame_legacy_v6
    monkeypatch.setattr(
        Decoder,
        "_load_frame_legacy_v6",
        lambda self, *a, **k: taken.append(1) or real(self, *a, **k),
    )
    img0, _ = d.load_frame_device(1)
    assert taken and np.array_equal(np.asarray(img0), imgs[0])

    out, metas = d.decode_batch([1, 2, 3, 4])
    assert np.array_equal(np.asarray(out), np.stack(imgs))
    assert len(metas) == 4

    mesh = Mesh(np.array(jax.devices()[:4]), ("f",))
    out2, _ = d.decode_batch([1, 2, 3, 4], mesh=mesh)
    assert np.array_equal(np.asarray(out2), np.stack(imgs))


def test_legacy_v6_unaligned_width_takes_v6(rng, monkeypatch):
    """padded_width % 128 != 0 (e.g. 300 -> pw 320) now takes the v6
    device-prep path (dummy kernel lanes) instead of falling back to the
    host-prep plan path — VERDICT r2 #4."""
    monkeypatch.setattr(
        Decoder, "_accel_available", staticmethod(lambda: True)
    )
    img = rng.integers(0, 1024, size=(8, 300), dtype=np.uint16)
    writer = E.ContainerWriter(example_container_metadata())
    writer.add_frame(1, E.encode_legacy(img), example_frame_metadata(300, 8, 6))
    d = Decoder(writer.finish(), backend="jax", kernel="pallas")

    taken = []
    real = Decoder._load_frame_legacy_v6
    monkeypatch.setattr(
        Decoder,
        "_load_frame_legacy_v6",
        lambda self, *a, **k: taken.append(1) or real(self, *a, **k),
    )
    out, _ = d.load_frame_device(1)
    assert taken
    assert np.array_equal(np.asarray(out), img)


def test_legacy_parallel_scan_matches_serial(rng):
    """Chunk-parallel host scan over the trailing offset table ==
    the serial walk, and bogus tables fall back cleanly."""
    from mcraw.kernels import native as N
    from mcraw.kernels import numpy_ref as R

    img = rng.integers(0, 65536, size=(64, 640), dtype=np.uint16)
    payload = np.frombuffer(
        E.encode_legacy(img, chunk_rows=8), dtype=np.uint8
    )
    nblk = 64 * (R.legacy_padded_width(640) // 32) * 2
    chunks = R.legacy_chunk_offsets(payload)
    assert len(chunks) == 7
    ser = N.legacy_scan(payload, nblk)
    par = N.legacy_scan_parallel(payload, nblk, chunks)
    if par is None:
        pytest.skip("native extension unavailable")
    for a, b in zip(ser, par):
        assert np.array_equal(
            np.asarray(a, np.int64), np.asarray(b, np.int64)
        )
    # table entries not on block boundaries -> refused
    assert N.legacy_scan_parallel(payload, nblk, [3, 7]) is None
    # decode through prepare_legacy still exact
    from mcraw.kernels import unpack as U2

    plan = U2.prepare_legacy(payload, 640, 64)
    assert np.array_equal(np.asarray(plan.offsets, np.int64), ser[2])


def test_legacy_mismatched_chunk_table_property(rng):
    """VERDICT r2 #9: a trailing table that points mid-block (or belongs
    to different content) must NEVER yield a silently wrong parallel
    scan — legacy_scan_parallel returns None (callers fall back to the
    serial walk) or a result identical to it. Fuzzed over shifted,
    foreign, duplicated, reordered and truncated tables."""
    from mcraw.kernels import native as N
    from mcraw.kernels import numpy_ref as R

    h, w = 48, 320
    img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(
        E.encode_legacy(img, chunk_rows=6), dtype=np.uint8
    )
    nblk = h * (R.legacy_padded_width(w) // 32) * 2
    good = R.legacy_chunk_offsets(payload)
    ser = N.legacy_scan(payload, nblk)
    if N.legacy_scan_parallel(payload, nblk, good) is None:
        pytest.skip("native extension unavailable")

    other = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    foreign = R.legacy_chunk_offsets(
        np.frombuffer(E.encode_legacy(other, chunk_rows=6), dtype=np.uint8)
    )
    tables = [foreign, sorted(good, reverse=True), good[: len(good) // 2],
              [g for g in good for _ in range(2)]]
    for _ in range(200):
        t = [int(g) + int(rng.integers(-33, 34)) for g in good]
        tables.append(t)
    for t in tables:
        par = N.legacy_scan_parallel(payload, nblk, t)
        if par is not None:
            for a, b in zip(ser, par):
                assert np.array_equal(
                    np.asarray(a, np.int64), np.asarray(b, np.int64)
                ), f"parallel scan silently diverged for table {t[:4]}..."


def test_legacy_speculative_scan_matches_serial(rng):
    """Speculative parallel scan (NO offset table, VERDICT r3 #6) == the
    serial walk on table-less clips: guesses are misaligned byte
    positions, yet the self-synchronizing header chain splices every
    segment onto the true chain (or rescans it serially). Sweeps content
    classes so block-length distributions vary."""
    from mcraw.kernels import native as N
    from mcraw.kernels import numpy_ref as R

    if N.get_lib() is None:
        pytest.skip("native extension unavailable")
    h, w = 128, 1024
    nblk = h * (R.legacy_padded_width(w) // 32) * 2
    for hi in (1 << 16, 1 << 12, 1 << 6, 1 << 3):
        img = rng.integers(0, hi, size=(h, w), dtype=np.uint16)
        payload = np.frombuffer(
            E.encode_legacy(img, add_offset_table=False), dtype=np.uint8
        )
        ser = N.legacy_scan(payload, nblk)
        stats = {}
        spec = N.legacy_scan_speculative(
            payload, nblk, nseg=4, window=4096, stats=stats
        )
        assert spec is not None, (hi, len(payload))
        for a, b in zip(ser, spec):
            assert np.array_equal(
                np.asarray(a, np.int64), np.asarray(b, np.int64)
            ), hi
        # random content converges: the parallel path actually engaged
        assert stats["spliced"] + stats["rescanned"] == 3, (hi, stats)
        assert stats["spliced"] >= 1, (hi, stats)


def test_legacy_speculative_scan_adversarial_no_convergence():
    """A stream built to DEFEAT speculation: every block is bits=15 with
    all-0xF0 payload bytes, so a chain started at any phase other than
    the true one steps by 34 forever and never lands on the true chain.
    The speculative scan must detect the miss, rescan each segment
    serially from its true entry, and still equal the serial walk —
    correctness is structural, not probabilistic."""
    from mcraw.kernels import native as N

    if N.get_lib() is None:
        pytest.skip("native extension unavailable")
    nblk = 3000  # 3000 * 34 B + tail > 4 * window
    block = bytes([0xF0, 0x00]) + bytes([0xF0]) * 32
    payload = np.frombuffer(
        block * nblk + b"\x00" * 64, dtype=np.uint8
    )
    ser = N.legacy_scan(payload, nblk)
    stats = {}
    spec = N.legacy_scan_speculative(
        payload, nblk, nseg=4, window=2048, stats=stats
    )
    assert spec is not None
    for a, b in zip(ser, spec):
        assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64))
    assert stats["rescanned"] >= 1, stats


def test_legacy_speculative_scan_truncation_falls_back():
    """num_blocks beyond the stream: the speculative path returns None so
    the serial scan owns the (reference-exact) truncation error."""
    from mcraw.kernels import native as N

    if N.get_lib() is None:
        pytest.skip("native extension unavailable")
    block = bytes([0xF0, 0x00]) + bytes([0xF0]) * 32
    payload = np.frombuffer(block * 2000, dtype=np.uint8)
    assert (
        N.legacy_scan_speculative(payload, 2500, nseg=4, window=2048)
        is None
    )


def test_legacy_tableless_prepare_uses_speculative(rng, monkeypatch):
    """prepare_legacy on a table-less clip routes through the speculative
    scan (when the frame is big enough) and decodes exactly."""
    from mcraw.kernels import native as N
    from mcraw.kernels import numpy_ref as R
    from mcraw.kernels import unpack as U2

    if N.get_lib() is None:
        pytest.skip("native extension unavailable")
    h, w = 256, 1024
    img = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(
        E.encode_legacy(img, add_offset_table=False), dtype=np.uint8
    )
    calls = {}
    orig = N.legacy_scan_speculative

    def spy(*a, **k):
        out = orig(*a, **k)
        calls["used"] = out is not None
        return out

    monkeypatch.setattr(U2, "LEGACY_PARALLEL_MIN_BLOCKS", 1)
    monkeypatch.setattr(N.os, "cpu_count", lambda: 8)  # multicore host
    monkeypatch.setattr(N, "legacy_scan_speculative", spy)
    plan = U2.prepare_legacy(payload, w, h)
    assert calls.get("used"), "speculative scan did not engage"
    nblk = h * (R.legacy_padded_width(w) // 32) * 2
    ser = N.legacy_scan(payload, nblk)
    assert np.array_equal(np.asarray(plan.offsets, np.int64), ser[2])
    assert np.array_equal(np.asarray(R.decode_legacy(payload, w, h)), img)


def test_legacy_corrupt_embedded_table_decodes_exactly(rng, monkeypatch):
    """A clip whose EMBEDDED trailing table is corrupted mid-block must
    still decode exactly end-to-end (continuity check -> serial-scan
    fallback), on both the oracle and the light-prep v6 path."""
    import struct as _struct

    from mcraw.kernels import numpy_ref as R
    from mcraw.kernels import pallas_legacy as PL
    from mcraw.kernels import unpack as U

    h, w = 48, 320
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = bytearray(E.encode_legacy(img, chunk_rows=6))
    # last table entry: [u32 BE pos][0xFF] just before the final byte
    pos = _struct.unpack(">I", bytes(payload[-5:-1]))[0]
    assert payload[-1] == 0xFF and 0 < pos < len(payload)
    payload[-5:-1] = _struct.pack(">I", pos + 1)  # now mid-block
    payload = np.frombuffer(bytes(payload), dtype=np.uint8)

    assert np.array_equal(R.decode_legacy(payload, w, h), img)
    # the parallel scan path must be exercised AND refuse
    monkeypatch.setattr(U, "LEGACY_PARALLEL_MIN_BLOCKS", 1)
    light = PL.prepare_legacy_light(payload, w, h)
    assert light is not None
    import jax.numpy as jnp

    p32, offs, bits, refs, pw, rows = light
    out = PL.decode_legacy_device_v6.__wrapped__(
        jnp.asarray(p32), jnp.asarray(offs), jnp.asarray(bits),
        jnp.asarray(np.asarray(refs, np.int32)),
        pw=pw, h=h, width=w, rows=rows, interpret=True,
    )
    assert np.array_equal(np.asarray(out), img)


def test_decode_batch_iter_heterogeneous(rng):
    """A clip that switches codec AND resolution mid-stream (legal per the
    container format; the reference decodes frame-at-a-time,
    example.cpp:187-195) must decode through the batch iterator: chunks
    split into homogeneous runs in stream order (VERDICT r3 #3)."""
    writer = E.ContainerWriter(example_container_metadata())
    specs = [
        (7, 128, 16), (7, 128, 16),          # modern run
        (6, 128, 16),                        # codec switch mid-stream
        (7, 256, 32), (7, 256, 32),          # resolution switch
        (6, 256, 32), (6, 256, 32),
    ]
    frames = []
    for i, (c, w, h) in enumerate(specs):
        img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
        payload = E.encode_modern(img) if c == 7 else E.encode_legacy(img)
        writer.add_frame(100 + i, payload, example_frame_metadata(w, h, c))
        frames.append(img)
    d = Decoder(writer.finish(), backend="jax")

    outs, metas_all = [], []
    for imgs, metas in d.decode_batch_iter(chunk_frames=4):
        arr = np.asarray(imgs)
        assert arr.shape[0] == len(metas)
        outs.extend(arr[k] for k in range(arr.shape[0]))
        metas_all.extend(metas)
    assert len(outs) == len(frames)
    for got, want, meta in zip(outs, frames, metas_all):
        assert got.shape == want.shape
        assert np.array_equal(got, want)
    # one-launch decode_batch still (correctly) refuses the mixed set
    with pytest.raises((IOException, ValueError)):
        d.decode_batch()


def test_frame_decoder_persistent_program(rng):
    """FrameDecoder (the latency path): AOT-compiled persistent program,
    one executable reused across same-geometry frames, exact output.
    Donation warnings ("Some donated buffers were not usable") fail the
    test: the latency path must not churn the allocator (VERDICT r3 #5)."""
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*[Dd]onated buffers.*"
        )
        blob, frames = make_clip(rng, num_frames=3)
        d = Decoder(blob, backend="jax", kernel="pallas")
        fd = d.make_frame_decoder()
        for ts, img in zip(d.frames, frames):
            out, meta = fd(ts)
            assert np.array_equal(np.asarray(out), img)
            assert meta["width"] == 128
        assert fd.num_programs == 1  # one geometry -> one compiled program

        # legacy frames compile their own persistent program (VERDICT r2
        # #6): one geometry -> one executable, exact output
        blob6, frames6 = make_clip(rng, num_frames=3, codec=6)
        d6 = Decoder(blob6, backend="jax", kernel="pallas")
        fd6 = d6.make_frame_decoder()
        for ts, img in zip(d6.frames, frames6):
            out, _ = fd6(ts)
            assert np.array_equal(np.asarray(out), img)
        assert fd6.num_programs == 1


def test_single_legacy_frame_sharded_across_devices(rng, monkeypatch):
    """Legacy twin of the long-context analogue: ONE legacy frame's chunk
    axis split across mesh devices, output row-sharded (interpret on
    CPU). Chunk size is shrunk so a test-sized frame spans 4 chunks."""
    from jax.sharding import Mesh
    from mcraw.parallel import decode_frame_sharded_legacy
    from mcraw.kernels import unpack as U, pallas_legacy as PL

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    monkeypatch.setattr(PL, "ROWS_PER_CHUNK_LEG", 16)
    h, w = 64, 256  # segs=2 -> 128 kernel rows = 8 chunks of 16
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
    plan = U.prepare_legacy(payload, w, h)
    assert PL.prepare_chunked_legacy_v5(plan)[3] == 8
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    out = decode_frame_sharded_legacy(plan, mesh, interpret=True)
    assert np.array_equal(np.asarray(out), img)

    # Decoder-level surface routes legacy frames too now.
    from mcraw.metadata import example_container_metadata, example_frame_metadata

    writer = E.ContainerWriter(example_container_metadata())
    writer.add_frame(1, E.encode_legacy(img), example_frame_metadata(w, h, 6))
    d = Decoder(writer.finish(), backend="jax")
    out2, meta = d.load_frame_sharded(1, mesh)
    assert meta["compressionType"] == 6
    assert np.array_equal(np.asarray(out2), img)


def test_kernel_probe_degrades_when_platform_init_fails(monkeypatch, rng):
    """A registered accelerator plugin that cannot initialize (axon
    outside its expected cwd, TPU relay down) makes jax.devices() raise
    RuntimeError — that used to traceback `mcraw preview` instead of
    falling back to the CPU/XLA path. _use_pallas/_accel_available must
    degrade to False via _jax_devices_or_none, never raise."""
    import jax

    from mcraw import pipeline as P

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon'")

    # Helper retries with a CPU pin; if even that raises it returns None.
    monkeypatch.setattr(jax, "devices", boom)
    real_update = jax.config.update
    monkeypatch.setattr(
        jax.config, "update", lambda *a, **k: None
    )  # keep the test session's forced-CPU config intact
    try:
        assert P._jax_devices_or_none() is None
        blob = E.ContainerWriter(example_container_metadata()).finish()
        d = Decoder(blob, backend="numpy")
        assert d._use_pallas() is False
        assert Decoder._accel_available() is False
    finally:
        monkeypatch.setattr(jax.config, "update", real_update)
