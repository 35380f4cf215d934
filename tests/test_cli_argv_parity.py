"""CLI argv-edge parity vs the compiled reference example
(VERDICT r4 Missing #2; example.cpp:141-153).

Three edges, each probed against the live binary:
- no args: usage line on STDOUT (std::cout), exit -1.
- `<file> -n` with no value: the `argc > 3` guard makes the reference
  silently ignore the dangling -n and export every frame.
- `<file> -n <non-int>`: uncaught std::stoi invalid_argument ->
  terminate (SIGABRT). We reject cleanly via argparse (exit 2) — a
  documented tightening, same failure class.
"""

import subprocess
import sys

import numpy as np
import pytest

from mcraw import encode as E
from mcraw.cli import main as cli_main
from mcraw.metadata import example_container_metadata, example_frame_metadata


@pytest.fixture(scope="module")
def small_clip(tmp_path_factory):
    rng = np.random.default_rng(7)
    writer = E.ContainerWriter(example_container_metadata())
    for i in range(2):
        img = rng.integers(0, 4096, size=(16, 192), dtype=np.uint16)
        writer.add_frame(
            1000 + i, bytes(E.encode_modern(img)),
            example_frame_metadata(192, 16, 7),
        )
    writer.add_audio(np.zeros(256, np.int16), 0)
    p = tmp_path_factory.mktemp("argv") / "clip.mcraw"
    p.write_bytes(writer.finish())
    return p


def test_no_args_usage_byte_parity(ref_example, capsys):
    ref = subprocess.run(
        [str(ref_example)], capture_output=True, text=True, timeout=60
    )
    rc = cli_main([])
    out = capsys.readouterr()
    assert out.out == ref.stdout  # exact usage text, on stdout
    assert out.err == ref.stderr == ""
    assert (rc != 0) and (ref.returncode != 0)


def test_dangling_n_is_ignored_byte_parity(
    small_clip, ref_example, tmp_path, capsys, monkeypatch
):
    """`decoder <file> -n` exports ALL frames in both (argc>3 guard)."""
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    ref = subprocess.run(
        [str(ref_example), str(small_clip), "-n"],
        cwd=ref_dir, capture_output=True, text=True, timeout=120,
    )
    monkeypatch.chdir(my_dir)
    capsys.readouterr()
    rc = cli_main([str(small_clip), "-n"])
    out = capsys.readouterr()
    assert ref.returncode == 0 and rc == 0
    assert out.out == ref.stdout
    assert out.err == ref.stderr
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    my_files = sorted(p.name for p in my_dir.iterdir())
    assert ref_files == my_files  # both frames + audio.wav
    assert "frame_000001.dng" in ref_files
    for name in ref_files:
        assert (ref_dir / name).read_bytes() == (my_dir / name).read_bytes()


def test_non_int_n_both_fail(small_clip, ref_example, tmp_path):
    """`decoder <file> -n abc`: reference aborts via std::stoi; we exit 2
    with argparse's error on stderr (clean tightening, same class)."""
    ref = subprocess.run(
        [str(ref_example), str(small_clip), "-n", "abc"],
        cwd=tmp_path, capture_output=True, text=True, timeout=60,
    )
    assert ref.returncode == -6
    assert "terminate" in ref.stderr
    import os

    env = {**os.environ,
           "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))}
    mine = subprocess.run(
        [sys.executable, "-m", "mcraw", str(small_clip), "-n", "abc"],
        cwd=tmp_path, capture_output=True, text=True, timeout=120, env=env,
    )
    assert mine.returncode == 2
    assert "invalid int value" in mine.stderr
    assert "Traceback" not in mine.stderr
    # neither emitted any output file before failing
    assert sorted(p.name for p in tmp_path.iterdir()) == []


def _run_ref_vs_ours(small_clip, ref_example, tmp_path, capsys, monkeypatch,
                     extra_args):
    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()
    ref = subprocess.run(
        [str(ref_example), str(small_clip)] + extra_args,
        cwd=ref_dir, capture_output=True, text=True, timeout=120,
    )
    monkeypatch.chdir(my_dir)
    capsys.readouterr()
    rc = cli_main([str(small_clip)] + extra_args)
    out = capsys.readouterr()
    return ref, rc, out, ref_dir, my_dir


@pytest.mark.parametrize(
    "extra",
    [
        ["-n", "1x"],          # std::stoi prefix-parse -> 1
        ["--no-such-flag"],    # argc==3, argv[2] never compared -> ignored
        ["junk"],              # same shape, non-dash extra
        ["-n", "1", "junk"],   # extras beyond -n N ignored
        ["-n", "  1tail"],     # stoi skips leading whitespace too
    ],
)
def test_ref_ignored_argv_shapes_byte_parity(
    small_clip, ref_example, tmp_path, capsys, monkeypatch, extra
):
    """Argv shapes the reference SUCCEEDS on by ignoring what it doesn't
    read (example.cpp:150-153): byte parity of stdout/files (review r5 —
    the first argv-parity pass only handled the bare dangling -n)."""
    ref, rc, out, ref_dir, my_dir = _run_ref_vs_ours(
        small_clip, ref_example, tmp_path, capsys, monkeypatch, extra
    )
    assert ref.returncode == 0, ref.stderr
    assert rc == 0
    assert out.out == ref.stdout
    assert out.err == ref.stderr
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    my_files = sorted(p.name for p in my_dir.iterdir())
    assert ref_files == my_files
    for name in ref_files:
        assert (ref_dir / name).read_bytes() == (my_dir / name).read_bytes()


def test_extended_flags_still_work_in_ref_compat_shape(
    small_clip, tmp_path, capsys, monkeypatch
):
    """parse_known_args must not break RECOGNIZED extended flags in the
    reference-compatible invocation (deliberate superset)."""
    out_dir = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    rc = cli_main([str(small_clip), "--output-dir", str(out_dir), "-n", "1"])
    capsys.readouterr()
    assert rc == 0
    assert (out_dir / "frame_000000.dng").exists()
    assert not (out_dir / "frame_000001.dng").exists()
