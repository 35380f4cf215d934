"""Adversarial container dialects the synthetic encoder never emits,
pinned against the compiled C++ reference example where its behavior is
well-defined (VERDICT r1 task 8; lib/Decoder.cpp:266-315).

Covered dialects:
- duplicate frame timestamps (identical payloads: the reference's
  std::sort is unstable, so WHICH duplicate wins is unspecified there;
  our first-in-file-order choice is pinned in a separate unit test)
- out-of-order index entries (sort-by-timestamp)
- unknown item tag between the last frame and the audio index (readExtra
  stops: no audio)
- odd-sized AUDIO_DATA payloads ((size+1)/2 samples, high byte zero)
- audio chunk whose metadata item straddles EOF (read() throws in the
  reference -> example exits nonzero; batch-skip does NOT apply because
  only FSEEK failures return false, Decoder.cpp:42-75)
- negative audio offset (FSEEK fails -> chunk silently skipped in batch)
- zero-frame audio-only clip (readExtra early-returns: audio is never
  even indexed, Decoder.cpp:282-283)
"""

import json
import os
import subprocess

import numpy as np
import pytest

from mcraw import container as C
from mcraw import encode as E
from mcraw.cli import main as cli_main
from mcraw.container import ContainerReader
from mcraw.errors import IOException
from mcraw.metadata import example_container_metadata, example_frame_metadata


@pytest.fixture(scope="session")
def ref_example(ref_lib):
    from tools import ref_shim

    exe = ref_shim.build_example()
    if exe is None:
        pytest.skip("reference example binary unavailable")
    return exe


class DialectWriter:
    """Hand-rolled container builder: full control over items and the two
    index tables, for emitting dialects ContainerWriter never does."""

    def __init__(self, container_metadata=None):
        self.out = bytearray()
        self.out += C.HEADER_FMT.pack(C.CONTAINER_ID, C.CONTAINER_VERSION)
        meta = container_metadata or example_container_metadata()
        self.item(C.ItemType.METADATA, json.dumps(meta).encode())
        self.frame_entries: list[tuple[int, int]] = []  # (offset, ts)
        self.audio_entries: list[tuple[int, int]] = []

    def item(self, t, payload: bytes) -> int:
        off = len(self.out)
        self.out += C.ITEM_FMT.pack(int(t), len(payload))
        self.out += payload
        return off

    def add_frame(self, ts: int, img: np.ndarray) -> int:
        h, w = img.shape
        off = self.item(C.ItemType.BUFFER, E.encode_modern(img))
        fm = example_frame_metadata(w, h)
        fm["asShotNeutral"] = [0.5, 1.0, 0.66]
        self.item(C.ItemType.METADATA, json.dumps(fm).encode())
        self.frame_entries.append((off, ts))
        return off

    def add_audio(self, raw: bytes, ts_ns=None, entry_offset=None) -> int:
        off = self.item(C.ItemType.AUDIO_DATA, raw)
        if ts_ns is not None:
            self.item(
                C.ItemType.AUDIO_DATA_METADATA,
                C.AUDIO_METADATA_FMT.pack(ts_ns),
            )
        self.audio_entries.append(
            (off if entry_offset is None else entry_offset, ts_ns or 0)
        )
        return off

    def finish(self, audio_index=True) -> bytes:
        if audio_index:
            payload = C.AUDIO_INDEX_FMT.pack(len(self.audio_entries), 0)
            payload += b"".join(
                C.BUFFER_OFFSET_FMT.pack(o, ts) for o, ts in self.audio_entries
            )
            self.item(C.ItemType.AUDIO_INDEX, payload)
        index_payload = b"".join(
            C.BUFFER_OFFSET_FMT.pack(o, ts) for o, ts in self.frame_entries
        )
        index_data_offset = len(self.out) + C.ITEM_FMT.size
        self.item(C.ItemType.BUFFER_INDEX_DATA, index_payload)
        self.out += C.ITEM_FMT.pack(
            int(C.ItemType.BUFFER_INDEX), C.BUFFER_INDEX_FMT.size
        )
        self.out += C.BUFFER_INDEX_FMT.pack(
            C.INDEX_MAGIC_I32, len(self.frame_entries), index_data_offset
        )
        return bytes(self.out)


def _run_both(tmp_path, blob, ref_example, expect_fail=False):
    clip = tmp_path / "clip.mcraw"
    clip.write_bytes(blob)
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    ref = subprocess.run(
        [str(ref_example), str(clip)],
        cwd=ref_dir,
        capture_output=True,
    )
    mine = cli_main(
        ["decode", str(clip), "--output-dir", str(my_dir), "--backend", "numpy"]
    )
    if expect_fail:
        assert ref.returncode != 0, ref.stdout
        assert mine != 0
    else:
        assert ref.returncode == 0, (ref.stdout, ref.stderr)
        assert mine == 0
    return ref_dir, my_dir


def _assert_tree_equal(ref_dir, my_dir):
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(my_dir))
    for name in ref_files:
        a = (ref_dir / name).read_bytes()
        b = (my_dir / name).read_bytes()
        assert a == b, f"{name} differs ({len(a)} vs {len(b)} bytes)"


def _img(rng, h=32, w=128):
    return rng.integers(0, 1024, size=(h, w), dtype=np.uint16)


def test_duplicate_timestamps_parity(tmp_path, rng, ref_example):
    """Two index entries with the same timestamp: both appear in the frame
    list, the offset map keeps one. Payloads are identical so the pinned
    bytes are independent of which entry the reference's unstable sort
    keeps (ours: first in file order)."""
    w = DialectWriter()
    img = _img(rng)
    w.add_frame(1000, img)
    w.add_frame(1000, img)
    w.add_audio(np.zeros(64, dtype="<i2").tobytes(), ts_ns=5)
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    # both duplicate entries decode: frame_000000 + frame_000001
    assert "frame_000001.dng" in os.listdir(ref_dir)
    _assert_tree_equal(ref_dir, my_dir)


def test_duplicate_timestamps_first_wins(rng):
    """OUR pinned choice for conflicting duplicates: the first entry in
    file-index order wins (stable sort + setdefault); the reference leaves
    this unspecified (std::sort on equal keys)."""
    w = DialectWriter()
    img_a, img_b = _img(rng), _img(rng)
    w.add_frame(1000, img_a)
    w.add_frame(1000, img_b)
    r = ContainerReader(w.finish())
    assert r.frames == [1000, 1000]
    payload, _ = r.frame_payload(1000)
    from mcraw.kernels import numpy_ref as R

    assert np.array_equal(
        R.decode_modern(np.asarray(payload), 128, 32), img_a
    )


def test_out_of_order_index_parity(tmp_path, rng, ref_example):
    """Index entries written in reverse timestamp order: getFrames() must
    come back sorted, so the DNG sequence is in time order."""
    w = DialectWriter()
    imgs = [_img(rng) for _ in range(3)]
    for i, img in enumerate(imgs):
        w.add_frame(3000 - 1000 * i, img)  # 3000, 2000, 1000 in file order
    w.frame_entries = w.frame_entries[::1]  # keep file order in the index
    w.add_audio(np.zeros(64, dtype="<i2").tobytes(), ts_ns=1)
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    _assert_tree_equal(ref_dir, my_dir)
    # our reader agrees on the order
    r = ContainerReader(w.finish())
    assert r.frames == [1000, 2000, 3000]


def test_unknown_tag_stops_audio_walk_parity(tmp_path, rng, ref_example):
    """An unknown item tag between the last frame and AUDIO_INDEX makes
    readExtra stop early: audio exists in the file but is never indexed
    (Decoder.cpp:311-313)."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(np.full(128, 7, dtype="<i2").tobytes(), ts_ns=3)
    w.item(99, b"futuristic extension payload")  # unknown tag
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    _assert_tree_equal(ref_dir, my_dir)
    r = ContainerReader(w.finish())
    assert r.num_audio_chunks == 0


def test_odd_audio_sizes_parity_mono(tmp_path, rng, ref_example):
    """AUDIO_DATA with an odd byte count: (size+1)/2 samples, the final
    sample's high byte stays zero (Decoder.cpp:54-57). Pinned in MONO:
    the reference's stereo de-interleave reads x.second[i+1] out of
    bounds for odd sample counts (example.cpp:40-42, UB we deliberately
    do not inherit — see test_odd_samples_stereo_truncates)."""
    w = DialectWriter(example_container_metadata(channels=1))
    w.add_frame(1000, _img(rng))
    w.add_audio(bytes([1, 2, 3, 4, 5]), ts_ns=11)  # 5 bytes -> 3 samples
    w.add_audio(bytes([9]), ts_ns=12)  # 1 byte -> 1 sample
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    _assert_tree_equal(ref_dir, my_dir)
    r = ContainerReader(w.finish())
    ts, samples = r.audio_chunk(0)
    assert ts == 11 and list(samples) == [0x0201, 0x0403, 0x0005]


def test_odd_samples_stereo_truncates(tmp_path, rng):
    """OUR pinned stereo behavior for an odd sample count: the trailing
    unpaired sample is dropped (the reference reads past the vector end
    there — unspecified bytes land in the WAV)."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(bytes([1, 2, 3, 4, 5]), ts_ns=11)  # 3 samples, stereo
    clip = tmp_path / "clip.mcraw"
    clip.write_bytes(w.finish())
    out = tmp_path / "out"
    out.mkdir()
    assert cli_main(
        ["decode", str(clip), "--output-dir", str(out), "--backend", "numpy"]
    ) == 0
    wav = (out / "audio.wav").read_bytes()
    # one stereo frame: samples 0/1 only; 44-byte header + 4 data bytes
    assert len(wav) == 48 and wav[44:48] == bytes([1, 2, 3, 4])


def test_audio_metadata_straddles_eof_errors(tmp_path, rng, ref_example):
    """An audio offset whose item data runs past EOF: the reference's
    read() throws (NOT the FSEEK batch-skip path), so the example exits
    nonzero before writing anything. We match."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    blob = bytearray(w.finish())
    # splice an audio entry pointing 4 bytes before EOF into the audio
    # index (numOffsets was 0; rebuild with one bogus entry)
    w2 = DialectWriter()
    w2.add_frame(1000, _img(rng))
    w2.audio_entries.append((0, 0))  # placeholder, patched below
    blob = bytearray(w2.finish())
    bogus = len(blob) - 4
    # audio index payload sits right after the last frame's items; find the
    # AUDIO_INDEX item and patch its single BufferOffset entry
    idx = blob.find(
        C.ITEM_FMT.pack(int(C.ItemType.AUDIO_INDEX), C.AUDIO_INDEX_FMT.size + 16)
    )
    assert idx > 0
    entry_at = idx + C.ITEM_FMT.size + C.AUDIO_INDEX_FMT.size
    blob[entry_at : entry_at + 16] = C.BUFFER_OFFSET_FMT.pack(bogus, 0)
    ref_dir, my_dir = _run_both(
        tmp_path, bytes(blob), ref_example, expect_fail=True
    )
    assert os.listdir(ref_dir) == [] and os.listdir(my_dir) == []


def test_negative_audio_offset_batch_skipped(tmp_path, rng, ref_example):
    """A negative audio offset: FSEEK fails -> loadAudioChunk returns
    false -> the batch loader silently skips it (Decoder.cpp:43-44,
    173-174); the WAV contains only the valid chunks."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(np.full(256, 5, dtype="<i2").tobytes(), ts_ns=1)
    w.audio_entries.insert(0, (-128, 0))  # bogus entry first
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    _assert_tree_equal(ref_dir, my_dir)
    r = ContainerReader(w.finish())
    assert r.num_audio_chunks == 2 and r.audio_chunk(0) is None


def test_zero_frame_audio_only_clip_parity(tmp_path, rng, ref_example):
    """No frames at all: readExtra early-returns, so even present audio is
    unreachable; the example writes just a header-only WAV."""
    w = DialectWriter()
    w.add_audio(np.full(512, 3, dtype="<i2").tobytes(), ts_ns=1)
    ref_dir, my_dir = _run_both(tmp_path, w.finish(), ref_example)
    assert os.listdir(ref_dir) == ["audio.wav"]
    _assert_tree_equal(ref_dir, my_dir)
    r = ContainerReader(w.finish())
    assert r.frames == [] and r.num_audio_chunks == 0


def test_audio_index_walk_continues_past_index(rng):
    """readExtra does NOT stop at AUDIO_INDEX — it keeps walking (and our
    writer's BUFFER_INDEX_DATA item is what terminates it). Two
    AUDIO_INDEX items: the second overwrites the first, as in the
    reference's resize+read."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(np.full(64, 1, dtype="<i2").tobytes(), ts_ns=1)
    # first (stale) audio index listing nothing
    w.item(C.ItemType.AUDIO_INDEX, C.AUDIO_INDEX_FMT.pack(0, 0))
    r = ContainerReader(w.finish())
    assert r.num_audio_chunks == 1  # the real index won


def test_truncated_frame_payload_item_raises(rng):
    """A frame index entry pointing at an item whose payload runs past
    EOF must raise cleanly, not crash."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    blob = bytearray(w.finish())
    # point the frame entry near EOF
    r = ContainerReader(bytes(blob))
    entry_off = len(blob) - 6
    idx = blob.find(C.BUFFER_OFFSET_FMT.pack(*w.frame_entries[0][:2]))
    assert idx > 0
    blob[idx : idx + 16] = C.BUFFER_OFFSET_FMT.pack(entry_off, 1000)
    r2 = ContainerReader(bytes(blob))
    with pytest.raises(IOException):
        r2.frame_payload(1000)


def test_zero_size_audio_chunk_parity(tmp_path, rng, ref_example):
    """A ZERO-length AUDIO_DATA chunk aborts the reference entirely: its
    read() is fread(data, 0, 1), which returns 0 != 1 items and throws
    "Failed to read data" (Decoder.cpp:36-40, :57) — and the exception
    escapes loadAudio's skip, which only covers FSEEK failures
    (Decoder.cpp:173-174). Found by tools/soak_container.py; we mirror
    the abort exactly (container.py _read1)."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(np.full(64, 3, dtype="<i2").tobytes(), ts_ns=1)
    w.add_audio(b"", ts_ns=2)  # zero-size: reference throws here
    ref_dir, my_dir = _run_both(
        tmp_path, w.finish(), ref_example, expect_fail=True
    )
    # The example fails during writeAudio, before any DNG: no output files.
    _assert_tree_equal(ref_dir, my_dir)


def test_zero_size_audio_chunk_loader_semantics(rng):
    """Library surface: batch load_audio RAISES (the reference exception
    propagates; it does not skip), and the streaming loader raises at that
    chunk after yielding earlier ones."""
    from mcraw import Decoder

    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    w.add_audio(np.full(64, 3, dtype="<i2").tobytes(), ts_ns=1)
    w.add_audio(b"", ts_ns=2)
    d = Decoder(w.finish(), backend="numpy")
    with pytest.raises(IOException):
        d.load_audio()
    it = d.audio_chunks()
    ts, samples = next(it)
    assert ts == 1 and len(samples) == 64
    with pytest.raises(IOException):
        next(it)


def test_zero_size_frame_metadata_parity(tmp_path, rng, ref_example):
    """A frame whose METADATA item has size 0: the reference writes
    audio.wav, then loadFrame's json read throws (fread(_, 0, 1) != 1).
    Both CLIs fail; the partial trees (audio only) match."""
    w = DialectWriter()
    w.add_frame(1000, _img(rng))
    off = w.item(C.ItemType.BUFFER, E.encode_modern(_img(rng)))
    w.item(C.ItemType.METADATA, b"")  # zero-size frame JSON
    w.frame_entries.append((off, 2000))
    w.add_audio(np.full(32, 5, dtype="<i2").tobytes(), ts_ns=1)
    ref_dir, my_dir = _run_both(
        tmp_path, w.finish(), ref_example, expect_fail=True
    )
    _assert_tree_equal(ref_dir, my_dir)


def test_zero_size_buffer_payload_parity(tmp_path, rng, ref_example):
    """A frame whose BUFFER item has size 0 fails the same way (the
    reference's payload read throws before raw::Decode ever runs)."""
    w = DialectWriter()
    off = w.item(C.ItemType.BUFFER, b"")
    w.item(
        C.ItemType.METADATA,
        json.dumps(example_frame_metadata(128, 32)).encode(),
    )
    w.frame_entries.append((off, 1000))
    ref_dir, my_dir = _run_both(
        tmp_path, w.finish(), ref_example, expect_fail=True
    )
    _assert_tree_equal(ref_dir, my_dir)


def test_zero_size_container_metadata_parity(tmp_path, ref_example):
    """Container JSON item of size 0: Decoder construction fails in both
    (the reference throws at init's metadata read, Decoder.cpp:130-141)."""
    blob = bytearray()
    blob += C.HEADER_FMT.pack(C.CONTAINER_ID, C.CONTAINER_VERSION)
    blob += C.ITEM_FMT.pack(int(C.ItemType.METADATA), 0)
    # a structurally valid empty tail so only the metadata read can fail
    index_data_offset = len(blob) + C.ITEM_FMT.size
    blob += C.ITEM_FMT.pack(int(C.ItemType.BUFFER_INDEX_DATA), 0)
    blob += C.ITEM_FMT.pack(int(C.ItemType.BUFFER_INDEX), C.BUFFER_INDEX_FMT.size)
    blob += C.BUFFER_INDEX_FMT.pack(C.INDEX_MAGIC_I32, 0, index_data_offset)
    ref_dir, my_dir = _run_both(
        tmp_path, bytes(blob), ref_example, expect_fail=True
    )
    _assert_tree_equal(ref_dir, my_dir)
