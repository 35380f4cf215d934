"""Fused on-TPU preview pipeline: packed payload -> display-ready RGB.

New capability beyond the reference (BASELINE config 5 — live RAW playback):
decode -> black/white normalize -> white balance -> mask-normalized bilinear
demosaic (convolutions, MXU-friendly) -> camera->sRGB color transform ->
gamma, all one jitted program so XLA fuses the epilogue into the decode and
the frame never round-trips to host between stages.

Color model (simplified vs full DNG rendering, documented deviations):
uses forwardMatrix1 (camera -> XYZ D50, example.cpp:71) followed by a
Bradford D50->D65 adaptation and the sRGB primaries matrix; single
illuminant, no hue-map / profile lookup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .metadata import ContainerMetadata, FrameMetadata

# XYZ (D50) -> linear sRGB (D65), Bradford-adapted.
_XYZ_D50_TO_SRGB = np.array(
    [
        [3.1338561, -1.6168667, -0.4906146],
        [-0.9787684, 1.9161415, 0.0334540],
        [0.0719453, -0.2289914, 1.4052427],
    ],
    dtype=np.float32,
)

# CFA channel index per 2x2 position, from the CFA pattern bytes
# (0=R, 1=G, 2=B; example.cpp:96-105).


def _phase_masks(height: int, width: int, cfa: tuple[int, ...]):
    """(3, H, W) one-hot masks for R/G/B sites of a 2x2 CFA."""
    yy = np.arange(height)[:, None] % 2
    xx = np.arange(width)[None, :] % 2
    chan = np.empty((height, width), dtype=np.int32)
    for py in range(2):
        for px in range(2):
            chan[(yy == py) & (xx == px)] = cfa[2 * py + px]
    return np.stack([(chan == c).astype(np.float32) for c in range(3)])


def _conv2same(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Single-channel 3x3 'same' convolution as shifted adds.

    A C=1 conv_general_dilated can't feed the MXU (no channel dim to
    contract) and measured ~40 ms per call at 4K on v5e; the unrolled
    pad+slice form is pure VPU work and effectively free.
    """
    h, w = x.shape
    p = jnp.pad(x, 1)
    acc = None
    for dy in range(3):
        for dx in range(3):
            wgt = float(k[dy, dx])
            if wgt == 0.0:
                continue
            t = p[dy : dy + h, dx : dx + w]
            t = t * wgt if wgt != 1.0 else t
            acc = t if acc is None else acc + t
    return acc


_K_CROSS = np.array([[0, 1, 0], [1, 4, 1], [0, 1, 0]], dtype=np.float32)
_K_FULL = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float32)


def bilinear_demosaic(raw: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Mask-normalized bilinear demosaic. raw: (H, W) float; masks (3, H, W).
    Returns (H, W, 3). Normalizing by the convolved mask handles borders."""
    out = []
    for c, k in ((0, _K_FULL), (1, _K_CROSS), (2, _K_FULL)):
        num = _conv2same(raw * masks[c], k)
        den = _conv2same(masks[c], k)
        out.append(num / den)
    return jnp.stack(out, axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "cfa"))
def develop(
    raw_u16: jnp.ndarray,
    black_level: jnp.ndarray,  # (4,) per CFA position
    white_level: jnp.ndarray,  # scalar
    as_shot_neutral: jnp.ndarray,  # (3,)
    forward_matrix: jnp.ndarray,  # (3, 3) camera -> XYZ D50
    *,
    height: int,
    width: int,
    cfa: tuple[int, ...],
) -> jnp.ndarray:
    """(H, W) uint16 Bayer -> (H, W, 3) uint8 sRGB preview."""
    masks = jnp.asarray(_phase_masks(height, width, cfa))

    # Per-site black level (blackLevel is 2x2, BlackLevelRepeatDim 2x2).
    # Selects, NOT bl2x2[yy, xx]: that 12M-element gather from a 4-element
    # table costs ~136 ms on TPU (XLA gather); two wheres are free.
    yy = jnp.arange(height)[:, None] % 2 == 0
    xx = jnp.arange(width)[None, :] % 2 == 0
    b = black_level.astype(jnp.float32)
    bl = jnp.where(
        yy,
        jnp.where(xx, b[0], b[1]),
        jnp.where(xx, b[2], b[3]),
    )

    x = (raw_u16.astype(jnp.float32) - bl) / (
        white_level.astype(jnp.float32) - bl
    )
    x = jnp.clip(x, 0.0, 1.0)

    rgb = bilinear_demosaic(x, masks)

    # White balance: divide by AsShotNeutral (neutral has G == 1).
    rgb = rgb / as_shot_neutral.astype(jnp.float32)[None, None, :]
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # Camera -> XYZ(D50) -> linear sRGB.
    m = jnp.asarray(_XYZ_D50_TO_SRGB) @ forward_matrix.astype(jnp.float32)
    rgb = jnp.einsum("hwc,rc->hwr", rgb, m, preferred_element_type=jnp.float32)
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # sRGB transfer curve.
    rgb = jnp.where(
        rgb <= 0.0031308,
        12.92 * rgb,
        1.055 * jnp.power(rgb, 1.0 / 2.4) - 0.055,
    )
    return jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def preview_frame(decoder, timestamp: int) -> jax.Array:
    """Decode + develop one frame fully on-device; returns (H, W, 3) uint8."""
    img, meta = decoder.load_frame_device(timestamp)
    cm = ContainerMetadata(decoder.container_metadata)
    fm = FrameMetadata(meta)
    cfa = tuple(cm.cfa_pattern)
    return develop(
        img,
        jnp.asarray(cm.black_level),
        jnp.asarray(np.float32(cm.white_level)),
        jnp.asarray(fm.as_shot_neutral),
        jnp.asarray(cm.forward_matrix(1).reshape(3, 3)),
        height=fm.height,
        width=fm.width,
        cfa=cfa,
    )
