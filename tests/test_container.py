"""Container reader/writer: index walk, frame access, audio demux, and the
format quirks catalogued in SURVEY.md §2.4 / §3.4."""

import numpy as np
import pytest

from mcraw import encode as E
from mcraw.container import ContainerReader
from mcraw.errors import IOException
from mcraw.metadata import (
    ContainerMetadata,
    FrameMetadata,
    example_container_metadata,
    example_frame_metadata,
)


def build_clip(rng, num_frames=3, h=8, w=64, channels=2, audio_ts=True):
    writer = E.ContainerWriter(example_container_metadata(channels=channels))
    frames = []
    for i in range(num_frames):
        img = rng.integers(0, 1024, size=(h, w), dtype=np.uint16)
        frames.append(img)
        writer.add_frame(
            timestamp=1000 + i * 33,
            payload=E.encode_modern(img),
            frame_metadata=example_frame_metadata(w, h),
        )
        samples = rng.integers(-3000, 3000, size=256 * channels).astype(np.int16)
        writer.add_audio(samples, timestamp_ns=(i * 10**6 if audio_ts else None))
    return writer.finish(), frames


def test_open_and_enumerate(rng):
    blob, frames = build_clip(rng)
    r = ContainerReader(blob)
    assert r.frames == [1000, 1033, 1066]
    assert r.num_audio_chunks == 3
    cm = ContainerMetadata(r.container_metadata)
    assert cm.audio_sample_rate == 48000
    assert cm.audio_channels == 2
    assert cm.sensor_arrangement == "rggb"
    assert cm.cfa_pattern == bytes((0, 1, 1, 2))


def test_open_from_file_object(rng, tmp_path):
    """FILE*-constructor analogue (Decoder.hpp:49-50): real file objects
    mmap; non-seekable streams are read fully."""
    import io

    blob, frames = build_clip(rng)
    p = tmp_path / "clip.mcraw"
    p.write_bytes(blob)
    with open(p, "rb") as f:
        r = ContainerReader(f)
        assert r.frames == [1000, 1033, 1066]
        payload, meta = r.frame_payload(1000)
        assert meta["width"] == 64
    r2 = ContainerReader(io.BytesIO(blob))  # no fileno -> read() path
    assert r2.frames == [1000, 1033, 1066]
    with pytest.raises(IOException):
        ContainerReader(12345)


def test_frame_payload_roundtrip(rng):
    from mcraw.kernels import numpy_ref as R

    blob, frames = build_clip(rng)
    r = ContainerReader(blob)
    for ts, img in zip(r.frames, frames):
        payload, meta = r.frame_payload(ts)
        fm = FrameMetadata(meta)
        assert (fm.width, fm.height, fm.compression_type) == (64, 8, 7)
        dec = R.decode_modern(np.asarray(payload), fm.width, fm.height)
        assert np.array_equal(dec, img)


def test_frames_sorted_by_timestamp(rng):
    writer = E.ContainerWriter(example_container_metadata())
    imgs = {}
    for ts in (500, 100, 300):
        img = rng.integers(0, 256, size=(4, 64), dtype=np.uint16)
        imgs[ts] = img
        writer.add_frame(ts, E.encode_modern(img), example_frame_metadata(64, 4))
    r = ContainerReader(writer.finish())
    assert r.frames == [100, 300, 500]  # reindexOffsets sorts (Decoder.cpp:266-279)


def test_missing_frame_raises(rng):
    blob, _ = build_clip(rng)
    r = ContainerReader(blob)
    with pytest.raises(IOException, match="Frame not found"):
        r.frame_payload(9999)


def test_audio_chunks_with_timestamps(rng):
    blob, _ = build_clip(rng, audio_ts=True)
    r = ContainerReader(blob)
    for i in range(r.num_audio_chunks):
        ts, samples = r.audio_chunk(i)
        assert ts == i * 10**6
        assert samples.dtype == np.int16
        assert len(samples) == 512


def test_audio_missing_metadata_gives_minus_one(rng):
    """Older files lack AUDIO_DATA_METADATA -> timestamp -1 (Decoder.cpp:63-70)."""
    blob, _ = build_clip(rng, audio_ts=False)
    r = ContainerReader(blob)
    ts, _ = r.audio_chunk(0)
    assert ts == -1


def test_bad_header_rejected(rng):
    blob, _ = build_clip(rng)
    bad = bytearray(blob)
    bad[7] = 99  # version
    with pytest.raises(IOException, match="Invalid container version"):
        ContainerReader(bytes(bad))
    bad = bytearray(blob)
    bad[0] = ord("X")
    with pytest.raises(IOException, match="Invalid header id"):
        ContainerReader(bytes(bad))


def test_corrupt_index_magic_rejected(rng):
    blob, _ = build_clip(rng)
    bad = bytearray(blob)
    bad[-16] ^= 0xFF  # BufferIndex.magicNumber lives in the last 16 bytes
    with pytest.raises(IOException, match="Corrupted file"):
        ContainerReader(bytes(bad))


def test_empty_clip():
    writer = E.ContainerWriter(example_container_metadata())
    r = ContainerReader(writer.finish())
    assert r.frames == []
    assert r.num_audio_chunks == 0


def test_file_path_open(tmp_path, rng):
    blob, frames = build_clip(rng, num_frames=1)
    p = tmp_path / "clip.mcraw"
    p.write_bytes(blob)
    with ContainerReader(str(p)) as r:
        assert len(r.frames) == 1
        payload, meta = r.frame_payload(r.frames[0])
        assert meta["width"] == 64
