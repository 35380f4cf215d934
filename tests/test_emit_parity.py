"""End-to-end byte parity: our CLI's DNG + WAV output must be identical to
the compiled C++ reference example on the same container (the gold test for
BASELINE configs 1-2, run on synthetic clips since the sample file needs
network access)."""

import os
import subprocess

import numpy as np
import pytest

from mcraw import encode as E
from mcraw.cli import main as cli_main
from mcraw.metadata import example_container_metadata, example_frame_metadata


@pytest.fixture(scope="session")
def ref_example(ref_lib):
    from tools import ref_shim

    exe = ref_shim.build_example()
    if exe is None:
        pytest.skip("reference example binary unavailable")
    return exe


def _container(rng, codec=7, frames=2, h=64, w=192, channels=2, white=1023.0):
    cm = example_container_metadata(
        sample_rate=44100,
        channels=channels,
        sensor="bggr",
        black_level=(64, 63, 62, 61),
        white_level=white,
    )
    cm["colorMatrix1"] = [0.9, -0.1, 0.05, -0.3, 1.2, 0.1, 0.0, -0.4, 1.3]
    cm["colorMatrix2"] = [0.8, -0.2, 0.04, -0.25, 1.1, 0.12, 0.01, -0.35, 1.25]
    cm["forwardMatrix1"] = [0.5, 0.3, 0.15, 0.25, 0.7, 0.05, 0.0, 0.1, 0.72]
    cm["forwardMatrix2"] = [0.55, 0.28, 0.14, 0.26, 0.69, 0.06, 0.01, 0.11, 0.7]
    writer = E.ContainerWriter(cm)
    for i in range(frames):
        img = rng.integers(0, int(white) + 1, size=(h, w), dtype=np.uint16)
        fm = example_frame_metadata(w, h, codec)
        fm["asShotNeutral"] = [0.4831, 1.0, 0.6517]
        payload = E.encode_modern(img) if codec == 7 else E.encode_legacy(img)
        writer.add_frame(1000 + 33 * i, payload, fm)
        writer.add_audio(
            rng.integers(-8000, 8000, size=2048).astype(np.int16), i * 10**6
        )
    return writer.finish()


def _run_both(tmp_path, blob, ref_example, n=None):
    clip = tmp_path / "clip.mcraw"
    clip.write_bytes(blob)
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    cmd = [str(ref_example), str(clip)] + (["-n", str(n)] if n is not None else [])
    subprocess.run(cmd, cwd=ref_dir, check=True, capture_output=True)
    args = ["decode", str(clip), "--output-dir", str(my_dir), "--backend", "numpy"]
    if n is not None:
        args += ["-n", str(n)]
    assert cli_main(args) == 0
    return ref_dir, my_dir


def _assert_tree_equal(ref_dir, my_dir):
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(my_dir))
    for name in ref_files:
        a = (ref_dir / name).read_bytes()
        b = (my_dir / name).read_bytes()
        assert a == b, f"{name} differs ({len(a)} vs {len(b)} bytes)"


def test_modern_clip_byte_parity(tmp_path, rng, ref_example):
    blob = _container(rng, codec=7)
    _assert_tree_equal(*_run_both(tmp_path, blob, ref_example))


def test_legacy_clip_byte_parity(tmp_path, rng, ref_example):
    blob = _container(rng, codec=6, h=48, w=160)
    _assert_tree_equal(*_run_both(tmp_path, blob, ref_example))


def test_frame_limit_flag(tmp_path, rng, ref_example):
    blob = _container(rng, frames=4)
    ref_dir, my_dir = _run_both(tmp_path, blob, ref_example, n=2)
    assert sorted(os.listdir(ref_dir)) == [
        "audio.wav",
        "frame_000000.dng",
        "frame_000001.dng",
    ]
    _assert_tree_equal(ref_dir, my_dir)


def test_mono_audio_parity(tmp_path, rng, ref_example):
    blob = _container(rng, channels=1)
    _assert_tree_equal(*_run_both(tmp_path, blob, ref_example))


@pytest.mark.parametrize("white", [1023.0, 4095.0, 16383.0, 65535.0])
def test_white_level_truncation_parity(tmp_path, rng, ref_example, white):
    """SetWhiteLevel takes a C short; example.cpp feeds it a double. 65535
    truncates to -1 (bytes FF FF) — must match exactly."""
    blob = _container(rng, frames=1, white=white)
    _assert_tree_equal(*_run_both(tmp_path, blob, ref_example))


def test_awkward_rational_values(tmp_path, rng, ref_example):
    """Color matrix floats whose dyadic expansions stress FloatToRational."""
    cm = example_container_metadata(sensor="grbg")
    cm["colorMatrix1"] = [0.3, -0.0001, 1e-7, 123456.78, -0.9999999, 2.0,
                          0.333333, -1.5, 0.0]
    cm["colorMatrix2"] = [1 / 3, 2 / 3, -1 / 7, 0.1, 0.2, 0.4, 0.8, 1.6, -3.2]
    writer = E.ContainerWriter(cm)
    img = rng.integers(0, 1024, size=(16, 64), dtype=np.uint16)
    fm = example_frame_metadata(64, 16)
    fm["asShotNeutral"] = [0.123456, 1.0, 0.987654]
    writer.add_frame(1, E.encode_modern(img), fm)
    _assert_tree_equal(*_run_both(tmp_path, writer.finish(), ref_example))


def test_three_channel_audio_header_only_wav(tmp_path, rng, ref_example):
    """Channel counts other than 1/2 produce a header-only WAV
    (example.cpp:37-50 writes no samples) — byte parity must hold."""
    blob = _container(rng, frames=1, channels=3)
    _assert_tree_equal(*_run_both(tmp_path, blob, ref_example))


def test_cli_stdout_parity(tmp_path, rng, ref_example, monkeypatch, capsys):
    """Under the reference-style invocation (cwd output, bare clip arg),
    stdout must be byte-identical too — the reference prints bare
    filenames (example.cpp:190), not "./frame_...". Caught live by the
    /verify CLI drive; pinned here."""
    blob = _container(rng, codec=7, frames=3)
    clip = tmp_path / "clip.mcraw"
    clip.write_bytes(blob)
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    ref = subprocess.run(
        [str(ref_example), str(clip)],
        cwd=ref_dir, check=True, capture_output=True, text=True,
    )
    monkeypatch.chdir(my_dir)
    capsys.readouterr()
    assert cli_main(["decode", str(clip), "--backend", "numpy"]) == 0
    assert capsys.readouterr().out == ref.stdout
    _assert_tree_equal(ref_dir, my_dir)
