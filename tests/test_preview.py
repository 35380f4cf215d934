"""Preview (decode -> demosaic -> tonemap) pipeline sanity tests."""

import numpy as np
import pytest

pytest.importorskip("jax")

from mcraw import encode as E  # noqa: E402
from mcraw.metadata import (  # noqa: E402
    example_container_metadata,
    example_frame_metadata,
)
from mcraw.pipeline import Decoder  # noqa: E402
from mcraw.preview import preview_frame  # noqa: E402


def _clip_with_flat_color(r, g, b, sensor="rggb", h=16, w=64):
    """A constant-color Bayer mosaic (values already white-balanced away)."""
    cm = example_container_metadata(
        sensor=sensor, black_level=(0, 0, 0, 0), white_level=1023.0
    )
    # A white-preserving forward matrix: camera (1,1,1) -> XYZ of D50 white.
    # (An identity matrix is not white-preserving — equal XYZ is not white.)
    cm["forwardMatrix1"] = [0.9642, 0, 0, 0, 1.0, 0, 0, 0, 0.8249]
    writer = E.ContainerWriter(cm)
    img = np.zeros((h, w), dtype=np.uint16)
    from mcraw.metadata import CFA_PATTERNS

    cfa = CFA_PATTERNS[sensor]
    vals = {0: r, 1: g, 2: b}
    for py in range(2):
        for px in range(2):
            img[py::2, px::2] = vals[cfa[2 * py + px]]
    fm = example_frame_metadata(w, h)
    fm["asShotNeutral"] = [1.0, 1.0, 1.0]
    writer.add_frame(1, E.encode_modern(img), fm)
    return writer.finish()


def test_flat_grey_is_grey():
    blob = _clip_with_flat_color(512, 512, 512)
    d = Decoder(blob, backend="jax")
    rgb = np.asarray(preview_frame(d, 1))
    assert rgb.shape == (16, 64, 3)
    assert rgb.dtype == np.uint8
    inner = rgb[2:-2, 2:-2]
    # identity forward matrix -> grey stays grey and channels stay equal
    assert np.all(np.abs(inner.astype(int) - inner[:, :, :1].astype(int)) <= 1)
    # ~sqrt-ish sRGB curve of 0.5 is ~188
    assert 170 <= int(inner.mean()) <= 200


def test_pure_red_scene():
    blob = _clip_with_flat_color(800, 0, 0)
    d = Decoder(blob, backend="jax")
    rgb = np.asarray(preview_frame(d, 1))
    inner = rgb[2:-2, 2:-2]
    assert inner[:, :, 0].mean() > 3 * max(1.0, inner[:, :, 2].mean())


def test_cfa_patterns_consistent():
    """The same physical scene must develop identically under every CFA."""
    outs = []
    for sensor in ["rggb", "bggr", "grbg", "gbrg"]:
        blob = _clip_with_flat_color(600, 300, 150, sensor=sensor)
        d = Decoder(blob, backend="jax")
        outs.append(np.asarray(preview_frame(d, 1))[4:-4, 4:-4].astype(int))
    for other in outs[1:]:
        assert np.max(np.abs(outs[0] - other)) <= 1
