"""Fused on-TPU preview pipeline: packed payload -> display-ready RGB.

New capability beyond the reference (BASELINE config 5 — live RAW playback):
decode -> black/white normalize -> white balance -> mask-normalized bilinear
demosaic (convolutions, MXU-friendly) -> camera->sRGB color transform ->
gamma, all one jitted program so XLA fuses the epilogue into the decode and
the frame never round-trips to host between stages.

Color model: full dual-illuminant DNG rendering math — the camera->XYZ(D50)
forward matrix is interpolated between forwardMatrix1 (D65) and
forwardMatrix2 (Standard A) at the as-shot white point's correlated color
temperature, with the DNG spec's self-consistent white-point iteration
(mcraw/color.py; the reference example only *copies* both matrix pairs
into DNG tags, example.cpp:69-72 + :117-124 — consumers do this math).
Then Bradford D50->D65 adaptation and the sRGB primaries matrix. The one
remaining simplification: no ProfileHueSatMap/LookTable handling — the
container format carries no such tags, so there is nothing to apply.
The fidelity bound vs an f64 scalar model of this exact pipeline is
pinned in tests/test_preview.py (<= 1/255 per channel).
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

# The normalizer conv(mask) is static per geometry: precompute its
# reciprocal so the per-frame work is one multiply, not a full conv + a
# divide (the three mask convs were ~45 full-frame passes per frame).
# Entries are ~150 MB each at 4K, so both caches are capped LRU-style to
# the most recent geometries instead of growing without bound.
_INV_DEN_CACHE: dict = {}
_INV_DEN_CACHE_MAX = 2


def _cache_put(cache: dict, key, value):
    """Insert + evict oldest beyond _INV_DEN_CACHE_MAX (dicts are
    insertion-ordered; re-inserting refreshes recency)."""
    cache.pop(key, None)
    cache[key] = value
    while len(cache) > _INV_DEN_CACHE_MAX:
        cache.pop(next(iter(cache)))


def _np_conv2same(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    h, w = x.shape
    p = np.pad(x, 1)
    acc = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx]:
                acc += k[dy, dx] * p[dy : dy + h, dx : dx + w]
    return acc


def _malvar_f64(x: np.ndarray, chan: np.ndarray, hc: np.ndarray):
    """Malvar-He-Cutler 5x5 gradient-corrected demosaic on a
    white-balanced mosaic (float64, zero-padded taps, per-pixel
    site-class select). Returns (R, G, B) planes (unclipped).

    x: normalized+WB mosaic; chan: per-site channel (0/1/2); hc: channel
    of the HORIZONTALLY adjacent site (disambiguates the two G phases).
    """
    h, w = x.shape
    p = np.pad(x, 2)

    def sh(dy, dx):
        return p[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]

    h1 = sh(0, 1) + sh(0, -1)
    v1 = sh(1, 0) + sh(-1, 0)
    h2 = sh(0, 2) + sh(0, -2)
    v2 = sh(2, 0) + sh(-2, 0)
    d1 = sh(1, 1) + sh(1, -1) + sh(-1, 1) + sh(-1, -1)
    # The four MHC estimators (x 1/8): G at a chroma site; chroma with
    # its same-color neighbors in-ROW; in-COLUMN; and diagonal.
    k1 = (4.0 * x + 2.0 * (h1 + v1) - (h2 + v2)) * 0.125
    k2 = (5.0 * x + 4.0 * h1 - d1 - h2 + 0.5 * v2) * 0.125
    k3 = (5.0 * x + 4.0 * v1 - d1 - v2 + 0.5 * h2) * 0.125
    k4 = (6.0 * x + 2.0 * d1 - 1.5 * (h2 + v2)) * 0.125

    g = np.where(chan == 1, x, k1)
    r = np.where(
        chan == 0, x,
        np.where(chan == 1, np.where(hc == 0, k2, k3), k4),
    )
    b = np.where(
        chan == 2, x,
        np.where(chan == 1, np.where(hc == 2, k2, k3), k4),
    )
    return r, g, b


def develop_f64(raw, black, white, neutral, fwd, cfa,
                demosaic: str = "bilinear") -> np.ndarray:
    """Scalar float64 model of the EXACT preview pipeline (normalize ->
    WB folded into the demosaic normalizer -> mask-normalized bilinear
    demosaic -> fwd matrix -> XYZ(D50)->sRGB -> gamma -> quantize).
    Returns (H, W, 3) int64 u8 channel values.

    demosaic="malvar": the Malvar-He-Cutler 5x5 gradient-corrected
    kernels instead of bilinear. WB is applied BEFORE the demosaic (the
    MHC correction terms mix channels, so the gains must be on-site);
    border taps are zero-padded (the 2px ring is clip-darkened — the
    kernel implements identical semantics). Bilinear keeps its original
    WB-after-normalized-conv form (channels never mix there).

    This is the ground truth the Pallas develop kernel is bounded against
    (<= 1 LSB): tests/test_preview.py pins the bound on small frames, and
    bench.py's preview leg re-checks one full 4K frame against it on
    hardware before certifying decode_develop_fps."""
    h, w = raw.shape
    yy = np.arange(h)[:, None] % 2
    xx = np.arange(w)[None, :] % 2
    b = np.asarray(black, np.float64)
    bl = np.where(yy == 0, np.where(xx == 0, b[0], b[1]),
                  np.where(xx == 0, b[2], b[3]))
    x = np.clip((raw.astype(np.float64) - bl) / (float(white) - bl), 0, 1)
    gains = 1.0 / np.asarray(neutral, np.float64)
    if demosaic == "malvar":
        cfa = tuple(cfa)
        pos = yy * 2 + xx
        chan = np.choose(pos, cfa)
        hc = np.choose(pos ^ 1, cfa)
        xm = x * gains[chan]
        r, g, gb = _malvar_f64(xm, chan, hc)
        rgb = np.clip(np.stack([r, g, gb], -1), 0, 1)
    else:
        masks = _phase_masks(h, w, tuple(cfa)).astype(np.float64)
        chans = []
        for c, k in ((0, _K_FULL), (1, _K_CROSS), (2, _K_FULL)):
            k = k.astype(np.float64)
            num = _np_conv2same(x * masks[c], k)
            den = _np_conv2same(masks[c], k)
            chans.append(num / den * gains[c])
        rgb = np.clip(np.stack(chans, -1), 0, 1)
    m = _XYZ_D50_TO_SRGB.astype(np.float64) @ np.asarray(fwd, np.float64)
    rgb = np.clip(rgb @ m.T, 0, 1)
    rgb = np.where(rgb <= 0.0031308, 12.92 * rgb,
                   1.055 * np.power(rgb, 1 / 2.4) - 0.055)
    return np.round(np.clip(rgb, 0, 1) * 255.0).astype(np.int64)


def _inv_dens(height: int, width: int, cfa: tuple[int, ...]) -> np.ndarray:
    key = (height, width, cfa)
    c = _INV_DEN_CACHE.get(key)
    if c is None:
        masks = _phase_masks(height, width, cfa)
        c = np.stack(
            [
                1.0 / _np_conv2same(masks[ch], k)
                for ch, k in ((0, _K_FULL), (1, _K_CROSS), (2, _K_FULL))
            ]
        ).astype(np.float32)
    _cache_put(_INV_DEN_CACHE, key, c)
    return c


_INV_DEN_DEV_CACHE: dict = {}


def _inv_dens_device(height: int, width: int, cfa: tuple[int, ...]):
    """Device-resident 1/conv(mask) normalizers, uploaded once per
    geometry (~150 MB at 4K — far too big to bake into the program)."""
    key = (height, width, cfa)
    c = _INV_DEN_DEV_CACHE.get(key)
    if c is None:
        c = jnp.asarray(_inv_dens(height, width, cfa))
    _cache_put(_INV_DEN_DEV_CACHE, key, c)
    return c


def bilinear_demosaic(
    raw: jnp.ndarray, masks, inv_dens: jnp.ndarray, gains=None
) -> jnp.ndarray:
    """Mask-normalized bilinear demosaic. raw: (H, W) float; masks: 3-list
    of (H, W) float; inv_dens (3, H, W) precomputed 1/conv(mask) (borders
    included); gains: optional (3,) per-channel scale folded into the
    normalizer (white balance commutes with the per-channel linear conv).
    Returns (H, W, 3)."""
    out = []
    for c, k in ((0, _K_FULL), (1, _K_CROSS), (2, _K_FULL)):
        num = _conv2same(raw * masks[c], k)
        inv = inv_dens[c] if gains is None else inv_dens[c] * gains[c]
        out.append(num * inv)
    return jnp.stack(out, axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "cfa"))
def develop(
    raw_u16: jnp.ndarray,
    black_level: jnp.ndarray,  # (4,) per CFA position
    white_level: jnp.ndarray,  # scalar
    as_shot_neutral: jnp.ndarray,  # (3,)
    forward_matrix: jnp.ndarray,  # (3, 3) camera -> XYZ D50
    inv_dens: jnp.ndarray,  # (3, H, W) 1/conv(mask), _inv_dens_device
    *,
    height: int,
    width: int,
    cfa: tuple[int, ...],
) -> jnp.ndarray:
    """(H, W) uint16 Bayer -> (H, W, 3) uint8 sRGB preview.

    inv_dens: (3, H, W) from _inv_dens_device (passed as a runtime arg —
    baking it as a program constant blows up the compile payload at 4K).
    Masks are built in-graph from parity iotas (no big constants).
    """
    yy2 = jnp.arange(height)[:, None] % 2 == 0
    xx2 = jnp.arange(width)[None, :] % 2 == 0
    chan = jnp.where(
        yy2,
        jnp.where(xx2, cfa[0], cfa[1]),
        jnp.where(xx2, cfa[2], cfa[3]),
    )
    masks = [(chan == c).astype(jnp.float32) for c in range(3)]

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

    # (raw - bl) * 1/(white - bl): the per-site reciprocal is 4 scalars
    # arranged by the same parity wheres (a full-frame divide is ~an order
    # slower than a multiply on the VPU).
    wf = white_level.astype(jnp.float32)
    inv_scale = jnp.where(
        yy,
        jnp.where(xx, 1.0 / (wf - b[0]), 1.0 / (wf - b[1])),
        jnp.where(xx, 1.0 / (wf - b[2]), 1.0 / (wf - b[3])),
    )
    x = (raw_u16.astype(jnp.float32) - bl) * inv_scale
    x = jnp.clip(x, 0.0, 1.0)

    # White balance (divide by AsShotNeutral, G == 1) folds into the
    # demosaic normalizer: per-channel scales commute with the conv.
    gains = 1.0 / as_shot_neutral.astype(jnp.float32)
    rgb = bilinear_demosaic(x, masks, inv_dens, gains)
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # Camera -> XYZ(D50) -> linear sRGB, as elementwise scalar muls (an
    # einsum here lowers to a bf16 MXU matmul on TPU, and HIGHEST is not
    # honored once it fuses into the larger program). NOTE: even in this
    # form, XLA-on-TPU loses ~bf16-level precision SOMEWHERE in this big
    # fusion (up to ~20/255 vs the f64 reference, found by the Pallas
    # kernel's ground-truth differential); the fused kernel
    # (kernels/pallas_develop.py) holds <= 1 LSB and is the primary
    # path — this XLA pipeline remains the fallback for odd widths/CPU.
    m = jnp.asarray(_XYZ_D50_TO_SRGB) @ forward_matrix.astype(jnp.float32)
    rgb = jnp.stack(
        [
            m[r, 0] * rgb[:, :, 0]
            + m[r, 1] * rgb[:, :, 1]
            + m[r, 2] * rgb[:, :, 2]
            for r in range(3)
        ],
        axis=-1,
    )
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # sRGB transfer curve.
    rgb = jnp.where(
        rgb <= 0.0031308,
        12.92 * rgb,
        1.055 * jnp.power(rgb, 1.0 / 2.4) - 0.055,
    )
    return jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def develop_rgba(
    raw_u16,
    black_level,
    white_level,
    as_shot_neutral,
    forward_matrix,
    *,
    height: int,
    width: int,
    cfa: tuple,
    use_table: bool = False,
    demosaic: str = "bilinear",
    interpret: bool = False,
) -> jax.Array:
    """(H, W) uint32 RGBA8888 via the fused Pallas develop kernel
    (kernels/pallas_develop.py) — one pass over row bands instead of the
    XLA pipeline's HBM-crossing fusions (~3.7 -> ~1 ms at 4K). Matches
    `develop` to <= 1 LSB (conv fp add order differs). Requires
    any width (lane-padded internally); only height <= 2 falls back.

    Default: the mask normalizer is computed in-kernel (bitwise-identical
    to the precomputed table — exact small-integer conv sums — while
    skipping the (3H, W) f32 HBM stream AND the ~150 MB host table build +
    upload per geometry). use_table=True keeps the streamed-table A/B
    baseline shared with the XLA pipeline.

    demosaic="malvar": Malvar-He-Cutler 5x5 gradient-corrected demosaic
    (the ISP-standard quality upgrade over bilinear: gradient terms from
    the co-sited channel suppress zipper artifacts). Compute mode only;
    <= 1 LSB vs the develop_f64 malvar model."""
    from .kernels import pallas_develop as PD


    params = jnp.asarray(
        PD.pack_develop_params(
            np.asarray(black_level),
            np.asarray(white_level),
            np.asarray(as_shot_neutral),
            np.asarray(forward_matrix),
        )
    )
    inv2d = (
        _inv_dens_device(height, width, tuple(cfa)).reshape(
            3 * height, width
        )
        if use_table
        else None
    )
    return PD.develop_rgba_pallas(
        raw_u16, params, inv2d,
        height=height, width=width, cfa=tuple(cfa), demosaic=demosaic,
        interpret=interpret,
    )


def _fused_eligible(height: int, width: int) -> bool:
    """The fused kernel handles any width (it lane-pads internally); only
    degenerate heights (no interior rows for the halo bands) fall back to
    the XLA pipeline."""
    return height > 2


def _frame_rgba(img, fm, cm, cfa, interpret: bool,
                demosaic: str = "bilinear") -> jax.Array:
    """Shared develop dispatch: fused Pallas kernel when eligible, else
    the XLA pipeline packed to RGBA. The single home of the eligibility
    rule (preview_frame / preview_frame_rgba / preview_clip all route
    here). demosaic="malvar" needs the fused kernel; the XLA fallback
    only implements bilinear, so degenerate geometries fall back to
    bilinear regardless."""
    from .color import interpolated_matrices

    fwd, _, _ = interpolated_matrices(cm, fm.as_shot_neutral)
    args = (
        jnp.asarray(cm.black_level),
        jnp.asarray(np.float32(cm.white_level)),
        jnp.asarray(fm.as_shot_neutral),
        jnp.asarray(fwd.astype(np.float32)),
    )
    if _fused_eligible(fm.height, fm.width):
        return develop_rgba(
            img, *args,
            height=fm.height, width=fm.width, cfa=cfa,
            demosaic=demosaic, interpret=interpret,
        )
    if demosaic != "bilinear":
        # The XLA fallback implements only bilinear; silently substituting
        # it would misrepresent the requested mode.
        raise ValueError(
            f"demosaic={demosaic!r} needs the fused kernel, which this "
            f"geometry ({fm.height}x{fm.width}) cannot use"
        )
    rgb = develop(
        img, *args, _inv_dens_device(fm.height, fm.width, cfa),
        height=fm.height, width=fm.width, cfa=cfa,
    )
    r = rgb.astype(jnp.uint32)
    return (
        r[:, :, 0] | (r[:, :, 1] << 8) | (r[:, :, 2] << 16)
        | jnp.uint32(0xFF000000)
    )


def _on_cpu() -> bool:
    import jax as _jax

    return _jax.devices()[0].platform == "cpu"


def preview_frame_rgba(decoder, timestamp: int,
                       demosaic: str = "bilinear") -> jax.Array:
    """Decode + fused develop on-device; returns (H, W) uint32 RGBA8888.

    Uses the Pallas develop kernel when the geometry allows (width a
    lane multiple) and the platform compiles Mosaic; otherwise packs the
    XLA `develop` output."""
    img, meta = decoder.load_frame_device(timestamp)
    cm = ContainerMetadata(decoder.container_metadata)
    fm = FrameMetadata(meta)
    return _frame_rgba(
        img, fm, cm, tuple(cm.cfa_pattern), _on_cpu(), demosaic=demosaic
    )


def preview_frame(decoder, timestamp: int,
                  demosaic: str = "bilinear") -> jax.Array:
    """Decode + develop one frame fully on-device; returns (H, W, 3) uint8.

    Routes through the fused Pallas kernel when the geometry allows: on
    TPU it is both ~3.5x faster AND closer to the f64 reference than the
    XLA pipeline (XLA-on-TPU silently loses ~bf16-level precision inside
    this large fusion — up to 20/255 — however the ops are expressed; the
    Pallas kernel holds <= 1 LSB). Prefer preview_frame_rgba for playback
    (it skips the (H, W, 3) unpack, a layout XLA handles poorly)."""
    rgba = preview_frame_rgba(decoder, timestamp, demosaic=demosaic)
    return jnp.stack(
        [
            (rgba & 0xFF).astype(jnp.uint8),
            ((rgba >> 8) & 0xFF).astype(jnp.uint8),
            ((rgba >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )


def preview_clip(decoder, timestamps=None, batch_frames: int = 8,
                 demosaic: str = "bilinear"):
    """Playback pipeline: yields (timestamp, (H, W) uint32 RGBA8888 device
    array) for each frame, decoding in batched launches (the v6 batch
    path) and developing with the fused kernel (XLA fallback for
    non-lane-aligned widths). The whole chain stays on device; a display
    loop reads back or blits each RGBA plane."""
    if timestamps is None:
        timestamps = decoder.frames
    cm = ContainerMetadata(decoder.container_metadata)
    cfa = tuple(cm.cfa_pattern)
    interp = _on_cpu()
    i = 0
    for imgs, metas in decoder.decode_batch_iter(
        timestamps, chunk_frames=batch_frames
    ):
        for k in range(imgs.shape[0]):
            fm = FrameMetadata(metas[k])
            yield timestamps[i], _frame_rgba(
                imgs[k], fm, cm, cfa, interp, demosaic=demosaic
            )
            i += 1
