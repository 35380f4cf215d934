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


def test_fused_rgba_matches_xla_develop():
    """Pallas fused develop (RGBA32) == XLA develop to <= 1 LSB."""
    import jax.numpy as jnp
    from mcraw import preview as P

    rng = np.random.default_rng(5)
    h, w = 24, 256
    raw = rng.integers(0, 1024, size=(h, w), dtype=np.uint16)
    black = np.array([16, 20, 24, 28], np.float32)
    white = np.float32(1023.0)
    neutral = np.array([0.55, 1.0, 0.71], np.float32)
    fwd = np.array(
        [0.6, 0.2, 0.16, 0.25, 0.7, 0.05, 0.02, 0.18, 0.62], np.float32
    ).reshape(3, 3)
    cfa = (0, 1, 1, 2)

    rgb = np.asarray(
        P.develop(
            jnp.asarray(raw), jnp.asarray(black), jnp.asarray(white),
            jnp.asarray(neutral), jnp.asarray(fwd),
            P._inv_dens_device(h, w, cfa),
            height=h, width=w, cfa=cfa,
        )
    )
    rgba = np.asarray(
        P.develop_rgba(
            jnp.asarray(raw), black, white, neutral, fwd,
            height=h, width=w, cfa=cfa, interpret=True,
        )
    )
    got = np.stack(
        [rgba & 0xFF, (rgba >> 8) & 0xFF, (rgba >> 16) & 0xFF], axis=-1
    ).astype(np.int64)
    assert np.all((rgba >> 24) == 0xFF)
    assert np.max(np.abs(got - rgb.astype(np.int64))) <= 1


@pytest.mark.parametrize("sensor", ["rggb", "bggr", "grbg", "gbrg"])
def test_fused_rgba_all_cfas(sensor):
    """Fused develop handles every CFA (interpret) == XLA develop."""
    import jax.numpy as jnp
    from mcraw import preview as P
    from mcraw.metadata import CFA_PATTERNS

    rng = np.random.default_rng(9)
    h, w = 30, 128  # odd-band height exercises the pad/crop path
    raw = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    black = np.array([8, 10, 12, 14], np.float32)
    white = np.float32(4095.0)
    neutral = np.array([0.8, 1.0, 0.9], np.float32)
    fwd = np.array(
        [0.7, 0.15, 0.11, 0.2, 0.75, 0.05, 0.03, 0.12, 0.67], np.float32
    ).reshape(3, 3)
    cfa = tuple(CFA_PATTERNS[sensor])

    rgb = np.asarray(
        P.develop(
            jnp.asarray(raw), jnp.asarray(black), jnp.asarray(white),
            jnp.asarray(neutral), jnp.asarray(fwd),
            P._inv_dens_device(h, w, cfa),
            height=h, width=w, cfa=cfa,
        )
    ).astype(np.int64)
    rgba = np.asarray(
        P.develop_rgba(
            jnp.asarray(raw), black, white, neutral, fwd,
            height=h, width=w, cfa=cfa, interpret=True,
        )
    )
    got = np.stack(
        [rgba & 0xFF, (rgba >> 8) & 0xFF, (rgba >> 16) & 0xFF], axis=-1
    ).astype(np.int64)
    assert np.max(np.abs(got - rgb)) <= 1, sensor


def test_preview_frame_rgba_end_to_end():
    """Decoder -> preview_frame_rgba pipeline (interpret on CPU)."""
    blob = _clip_with_flat_color(512, 512, 512)
    d = Decoder(blob, backend="jax")
    from mcraw.preview import preview_frame_rgba

    rgba = np.asarray(preview_frame_rgba(d, 1))
    assert rgba.shape == (16, 64)
    assert rgba.dtype == np.uint32
    assert np.all((rgba >> 24) == 0xFF)
    inner = rgba[2:-2, 2:-2]
    r, g, b = inner & 0xFF, (inner >> 8) & 0xFF, (inner >> 16) & 0xFF
    assert np.all(np.abs(r.astype(int) - g.astype(int)) <= 1)
    assert np.all(np.abs(g.astype(int) - b.astype(int)) <= 1)


def test_preview_clip_playback():
    """Batched decode + fused develop playback iterator."""
    from mcraw import encode as E2
    from mcraw.metadata import example_frame_metadata
    from mcraw.preview import preview_clip

    cm = example_container_metadata(
        black_level=(0, 0, 0, 0), white_level=1023.0
    )
    cm["forwardMatrix1"] = [0.9642, 0, 0, 0, 1.0, 0, 0, 0, 0.8249]
    writer = E2.ContainerWriter(cm)
    rng = np.random.default_rng(3)
    imgs = []
    for t in range(3):
        img = rng.integers(0, 1024, size=(16, 128), dtype=np.uint16)
        imgs.append(img)
        fm = example_frame_metadata(128, 16)
        fm["asShotNeutral"] = [1.0, 1.0, 1.0]
        writer.add_frame(t + 1, E2.encode_modern(img), fm)
    d = Decoder(writer.finish(), backend="jax")
    frames = list(preview_clip(d, batch_frames=2))
    assert [t for t, _ in frames] == [1, 2, 3]
    for _, rgba in frames:
        a = np.asarray(rgba)
        assert a.shape == (16, 128) and a.dtype == np.uint32
        assert np.all((a >> 24) == 0xFF)


@pytest.mark.parametrize("shape", [(24, 4032), (24, 200), (16, 132)])
def test_fused_rgba_unaligned_widths(shape):
    """Fused develop at non-128-multiple widths (4032 = the dominant
    phone full-res width) == XLA develop to <= 1 LSB: the kernel
    lane-pads internally; padded columns contribute zero exactly like
    the XLA zero-pad convention."""
    import jax.numpy as jnp
    from mcraw import preview as P

    h, w = shape
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 1024, size=(h, w), dtype=np.uint16)
    black = np.array([16, 20, 24, 28], np.float32)
    white = np.float32(1023.0)
    neutral = np.array([0.55, 1.0, 0.71], np.float32)
    fwd = np.array(
        [0.6, 0.2, 0.16, 0.25, 0.7, 0.05, 0.02, 0.18, 0.62], np.float32
    ).reshape(3, 3)
    cfa = (0, 1, 1, 2)

    rgb = np.asarray(
        P.develop(
            jnp.asarray(raw), jnp.asarray(black), jnp.asarray(white),
            jnp.asarray(neutral), jnp.asarray(fwd),
            P._inv_dens_device(h, w, cfa),
            height=h, width=w, cfa=cfa,
        )
    )
    rgba = np.asarray(
        P.develop_rgba(
            jnp.asarray(raw), black, white, neutral, fwd,
            height=h, width=w, cfa=cfa, interpret=True,
        )
    )
    assert rgba.shape == (h, w)
    got = np.stack(
        [rgba & 0xFF, (rgba >> 8) & 0xFF, (rgba >> 16) & 0xFF], axis=-1
    ).astype(np.int64)
    assert np.all((rgba >> 24) == 0xFF)
    assert np.max(np.abs(got - rgb.astype(np.int64))) <= 1
    assert P._fused_eligible(h, w)
