"""Fused Pallas TPU develop kernel: Bayer uint16 -> packed RGBA8888.

The XLA develop pipeline (preview.py) is correct but crosses HBM between
fusions and pays ~3.7 ms/4K frame. This kernel runs the whole develop —
black/white normalize, mask demosaic, white balance, color matrix, sRGB
gamma — in one pass over row bands held in VMEM:

  - grid step = band of BR image rows; the raw band is DMA'd with a
    one-row halo on each side (clamped at the image edges; out-of-image
    halo rows are zeroed so they contribute nothing, matching the XLA
    path's zero padding);
  - demosaic convs: K_FULL = [1,2,1] x [1,2,1] runs separably (vertical
    pass over the halo band, horizontal pass via pltpu.roll lane rotates
    with the wrapped border lane zeroed); K_CROSS is vertical + horizontal
    + center;
  - the mask normalizers 1/conv(mask) are computed IN-KERNEL in CLOSED
    FORM (the default; see the kernel comment — K_FULL factorizes over
    the single-phase masks, K_CROSS reduces to an arms count): every
    value is the correctly rounded f32 of 1/{1,2,3,4}, bitwise-identical
    to the precomputed numpy table — and it removes the (3H, W) f32
    table stream that was 151 MB of the kernel's ~226 MB per-frame HBM
    traffic at 4K (plus the one-time ~150 MB host build + upload per
    geometry). Running literal convs over the 0/1 masks instead measured
    0.34 ms/4K frame — the kernel is VPU-bound, not bandwidth-bound.
    inv2d != None keeps the streamed-table path as the A/B baseline
    (shared with the XLA pipeline);
  - white balance folds into the normalizer multiply; the sRGB curve uses
    exp(log(x)/2.4) (Mosaic-supported);
  - output is ONE uint32 plane per pixel: R | G<<8 | B<<16 | 0xFF<<24
    (RGBA8888) — channel-interleaved u8 and (H, W, 3) layouts are both
    hostile to 128-lane vregs; a display consumer gets the standard
    packed format directly.

Output matches preview.develop to <= 1 LSB (fp add order differs in the
conv; differential-tested in tests/test_preview.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_ROWS = 32  # table mode: 64 exceeds the 16MB VMEM budget at W=4096
BAND_ROWS_COMPUTE = 64  # compute mode drops the (2,3,BR,W) f32 scratch

# gamma_mode="poly": x^(1/2.4) = t^(5/3) with t = x^0.25 (two fast VPU
# sqrts), minimax-fit degree-6 polynomial on t in [0.0031308^0.25, 1].
# Max |error| is 1.0e-3 of a u8 step (f32-evaluated, measured over 400k
# points) — far inside the pipeline's pinned <= 1 LSB fidelity bound vs
# the f64 model; a pixel can differ from the exact-curve kernel only if
# the true value sits within ~1e-3 of a rounding boundary. A/B variant
# for the exp/log transfer curve (the exact form stays the default
# pending hardware numbers).
_GAMMA_POLY = (
    -0.00452800970223699, 0.1348017327767641, 1.28363868398077,
    -0.7833762934145094, 0.5923303576762906, -0.28274288031890504,
    0.05987875888285418,
)


def _develop_kernel(
    *refs,
    H: int = None,  # padded height (grid rows)
    W: int = None,  # padded (lane-multiple) width
    real_h: int = None,  # true image rows (mask border predicate)
    real_w: int = None,  # true image cols (mask border predicate)
    cfa: tuple = None,
    use_table: bool = True,
    gamma_mode: str = "exact",
    demosaic: str = "bilinear",  # "malvar": MHC 5x5 gradient-corrected
    ablate: str = "",
    nb_per: int = 0,  # batched mode: bands PER FRAME (0 = single frame,
    # the certified default — the batched arithmetic is compiled out)
    fstride: int = 0,  # batched mode: rows per frame block in raw_ref
):
    if use_table:
        params_ref, raw_ref, inv_ref, out_ref, rscr, iscr, sems = refs
    else:
        params_ref, raw_ref, out_ref, rscr, sems = refs
        inv_ref = iscr = None
    # params_ref: (1, 128) f32 [b0..b3, wf, g0..g2, m00..m22]
    # raw_ref:    HBM (H, W) uint16
    # inv_ref:    HBM (3*H, W) f32 1/conv(mask) (table mode only)
    # out_ref:    (BR, W) uint32 RGBA band
    # rscr:       VMEM (2, BR+16, W) uint16 (u16 DMA slices need 16-sublane
    #             alignment; only the first BR+2 rows are used)
    # iscr:       VMEM (2, 3, BR, W) f32 (table mode only)
    # sems:       DMA sems (2, 4)
    i = pl.program_id(0)
    n = pl.num_programs(0)
    BR = out_ref.shape[0]
    slot = jax.lax.rem(i, 2)
    if nb_per:
        # Batched frames: i is a LINEAR band id over frames (frame-major,
        # band-minor). Each frame occupies an fstride-row, BR-aligned
        # block in raw_ref (wrapper invariant: fstride = hp + BR >=
        # band window end hp + 16), so a band's DMA start is computed
        # per-frame; jax.vmap can't lift this kernel (ANY-space operands
        # need whole-array trivial block specs), hence the native path.
        ib = jax.lax.rem(i, nb_per)

        def _r0(l):
            return (
                jax.lax.div(l, nb_per) * fstride
                + jax.lax.rem(l, nb_per) * BR
            )
    else:
        ib = i

        def _r0(l):
            return l * BR

    def start_band(l, dst):
        # raw_ref is padded with hN top + >=16 bottom zero rows per
        # frame, so every band's halo window starts at _r0(l) with no
        # edge clipping.
        cp = [
            pltpu.make_async_copy(
                raw_ref.at[pl.ds(_r0(l), BR + 16), :], rscr.at[dst],
                sems.at[dst, 0],
            )
        ]
        if use_table:  # table mode is single-frame only (wrapper raises)
            for c in range(3):
                cp.append(
                    pltpu.make_async_copy(
                        inv_ref.at[pl.ds(c * H + l * BR, BR), :],
                        iscr.at[dst, c],
                        sems.at[dst, 1 + c],
                    )
                )
        return cp

    @pl.when(i == 0)
    def _():
        for cp in start_band(0, 0):
            cp.start()

    @pl.when(i + 1 < n)
    def _():
        for cp in start_band(i + 1, jax.lax.rem(i + 1, 2)):
            cp.start()

    # Wait this band's slot copies.
    sl = slot
    pltpu.make_async_copy(
        raw_ref.at[pl.ds(_r0(i), BR + 16), :], rscr.at[sl], sems.at[sl, 0]
    ).wait()
    if use_table:
        for c in range(3):
            pltpu.make_async_copy(
                inv_ref.at[pl.ds(c * H + i * BR, BR), :],
                iscr.at[sl, c],
                sems.at[sl, 1 + c],
            ).wait()

    p = params_ref[0]
    b0, b1, b2, b3 = p[0], p[1], p[2], p[3]
    wf = p[4]
    g = [p[5], p[6], p[7]]
    m = [[p[8 + 3 * r + c] for c in range(3)] for r in range(3)]

    # Compute halo: +-1 rows for the bilinear 3x3 convs, +-2 for MHC 5x5
    # (the DMA band already carries BR+16 rows; only the top-pad depth in
    # the wrapper changes).
    hN = 2 if demosaic == "malvar" else 1
    raw = rscr[sl][0 : BR + 2 * hN].astype(jnp.int32).astype(jnp.float32)

    # Global image row of local band row lr is i*BR + lr - hN (the pad
    # rows are zeros; their x comes out 0 after the clip, matching
    # zero-pad).
    rr = jax.lax.broadcasted_iota(jnp.int32, (BR + 2 * hN, 1), 0) + (
        ib * BR - hN
    )
    yy = (rr & 1) == 0
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    xx = (cc & 1) == 0

    bl = jnp.where(yy, jnp.where(xx, b0, b1), jnp.where(xx, b2, b3))
    inv_sc = jnp.where(
        yy,
        jnp.where(xx, 1.0 / (wf - b0), 1.0 / (wf - b1)),
        jnp.where(xx, 1.0 / (wf - b2), 1.0 / (wf - b3)),
    )
    x = jnp.clip((raw - bl) * inv_sc, 0.0, 1.0)

    if "dma" in ablate:  # (timing ablation) DMA + normalize only
        out_ref[:] = jax.lax.bitcast_convert_type(
            x[hN : BR + hN], jnp.uint32
        )
        return

    # CFA channel of each site -> masked planes.
    chan = jnp.where(
        yy,
        jnp.where(xx, cfa[0], cfa[1]),
        jnp.where(xx, cfa[2], cfa[3]),
    )

    def hshift(v, d):
        # v shifted so lane l reads column l+d; wrapped border lane zeroed.
        if d == 1:
            r = pltpu.roll(v, W - 1, 1)
            return jnp.where(cc == W - 1, 0.0, r)
        r = pltpu.roll(v, 1, 1)
        return jnp.where(cc == 0, 0.0, r)

    if demosaic == "malvar":
        # Malvar-He-Cutler 5x5 gradient-corrected demosaic
        # (preview._malvar_f64 is the f64 model; <= 1 LSB differential).
        # WB is applied BEFORE the demosaic — the MHC correction terms
        # mix channels, so gains must be on-site. Border taps are
        # zero-padded (identical to the model's np.pad semantics).
        def hshift2(v, d):
            if d == 2:
                r = pltpu.roll(v, W - 2, 1)
                return jnp.where(cc >= W - 2, 0.0, r)
            r = pltpu.roll(v, 2, 1)
            return jnp.where(cc < 2, 0.0, r)

        gs = jnp.where(
            chan == 0, g[0], jnp.where(chan == 1, g[1], g[2])
        )
        xm = x * gs
        mid = xm[2 : BR + 2]
        up1, dn1 = xm[1 : BR + 1], xm[3 : BR + 3]
        up2, dn2 = xm[0:BR], xm[4 : BR + 4]
        h1 = hshift(mid, 1) + hshift(mid, -1)
        h2 = hshift2(mid, 2) + hshift2(mid, -2)
        v1 = up1 + dn1
        v2 = up2 + dn2
        d1 = (
            hshift(up1, 1) + hshift(up1, -1)
            + hshift(dn1, 1) + hshift(dn1, -1)
        )
        k1 = (4.0 * mid + 2.0 * (h1 + v1) - (h2 + v2)) * 0.125
        k2 = (5.0 * mid + 4.0 * h1 - d1 - h2 + 0.5 * v2) * 0.125
        k3 = (5.0 * mid + 4.0 * v1 - d1 - v2 + 0.5 * h2) * 0.125
        k4 = (6.0 * mid + 2.0 * d1 - 1.5 * (h2 + v2)) * 0.125
        cm = chan[2 : BR + 2]
        # Channel of the HORIZONTALLY adjacent site (flips the xx branch
        # of the chan select) — disambiguates the two G phases.
        hcm = jnp.where(
            yy,
            jnp.where(xx, cfa[1], cfa[0]),
            jnp.where(xx, cfa[3], cfa[2]),
        )[2 : BR + 2]
        gg = jnp.where(cm == 1, mid, k1)
        rr_c = jnp.where(
            cm == 0, mid,
            jnp.where(cm == 1, jnp.where(hcm == 0, k2, k3), k4),
        )
        bb = jnp.where(
            cm == 2, mid,
            jnp.where(cm == 1, jnp.where(hcm == 2, k2, k3), k4),
        )
        rgb = [
            jnp.clip(rr_c, 0.0, 1.0),
            jnp.clip(gg, 0.0, 1.0),
            jnp.clip(bb, 0.0, 1.0),
        ]
        return _develop_emit(rgb, m, out_ref, gamma_mode, ablate)

    if not use_table:
        # CLOSED-FORM normalizer (exact, a few wide VPU ops — running the
        # convs over the 0/1 masks instead measured 0.34 ms/4K frame, 6x
        # the whole table multiply; this form measured at table parity
        # with zero HBM table traffic):
        #  - R/B (K_FULL = [1,2,1]^T x [1,2,1], single-phase mask): kernel
        #    and mask both factorize, so conv2(K, a(y)b(x)) = rf(y)*cf(x)
        #    with rf(y) = 2*[y%2==py] + [y>0][(y-1)%2==py] +
        #    [y<h-1][(y+1)%2==py] (and cf alike) ∈ {1,2} on real pixels —
        #    so 1/(rf*cf) = (1/rf)*(1/cf) EXACTLY (powers of two), built
        #    from NARROW row/col vectors and one broadcast multiply.
        #  - G (K_CROSS): a G site's cross arms are never G (the two G
        #    phases differ in both coordinates in every 2x2 Bayer CFA),
        #    so den = 4 at G sites; a non-G site's four arms are ALL G,
        #    so den = 4 - (clipped arms), arms = [y==0]+[y==h-1]+
        #    [x==0]+[x==w-1]. All resulting inverses are the correctly
        #    rounded f32 of 1/{1,2,3,4} — bitwise equal to the numpy
        #    table (pinned by tests + the hw checksum gate).
        rm = rr[1 : BR + 1]  # (BR, 1) global rows of the output band
        pos = {ch: i for i, ch in enumerate(cfa)}  # channel -> 2x2 index

        def fac(idx, par, last):
            b0 = (idx & 1) == par
            bm = (idx > 0) & (((idx - 1) & 1) == par)
            bp = (idx < last) & (((idx + 1) & 1) == par)
            f = (
                jnp.where(b0, 2.0, 0.0)
                + jnp.where(bm, 1.0, 0.0)
                + jnp.where(bp, 1.0, 0.0)
            )
            return jnp.where(f > 0, 1.0 / f, 0.0)  # {1, 1/2} real pixels

        inv_rb = {}
        for c in (0, 2):
            p = pos[c]
            inv_rb[c] = fac(rm, p // 2, real_h - 1) * fac(
                cc, p % 2, real_w - 1
            )
        arms = (
            jnp.where(rm == 0, 1, 0)
            + jnp.where(rm == real_h - 1, 1, 0)
            + jnp.where(cc == 0, 1, 0)
            + jnp.where(cc == real_w - 1, 1, 0)
        )
        inv_non_g = jnp.where(
            arms == 0,
            0.25,
            jnp.where(arms == 1, 1.0 / 3.0, jnp.where(arms == 2, 0.5, 1.0)),
        )
        inv_g = jnp.where(chan[1 : BR + 1] == 1, 0.25, inv_non_g)

    rgb = []
    for c in range(3):
        xc = jnp.where(chan == c, x, 0.0)
        up, mid, dn = xc[0:BR], xc[1 : BR + 1], xc[2 : BR + 2]
        if c == 1:  # K_CROSS: 4*mid + vertical + horizontal neighbors
            num = 4.0 * mid + up + dn + hshift(mid, 1) + hshift(mid, -1)
        else:  # K_FULL separable: [1,2,1]^T x [1,2,1]
            v = up + 2.0 * mid + dn
            num = 2.0 * v + hshift(v, 1) + hshift(v, -1)
        if use_table:
            inv = iscr[sl, c]
        else:
            inv = inv_g if c == 1 else inv_rb[c]
        rgb.append(jnp.clip(num * inv * g[c], 0.0, 1.0))

    return _develop_emit(rgb, m, out_ref, gamma_mode, ablate)


def _develop_emit(rgb, m, out_ref, gamma_mode, ablate):
    """Shared tail of the develop kernel: color matrix -> sRGB curve ->
    quantize -> packed RGBA8888 store (both demosaic paths)."""
    if "demosaic" in ablate:  # (timing ablation) through the demosaic
        out_ref[:] = jax.lax.bitcast_convert_type(
            rgb[0] + rgb[1] + rgb[2], jnp.uint32
        )
        return

    out = []
    for r in range(3):
        lin = m[r][0] * rgb[0] + m[r][1] * rgb[1] + m[r][2] * rgb[2]
        lin = jnp.clip(lin, 0.0, 1.0)
        if "nogamma" in ablate:  # (timing ablation) skip the sRGB curve
            srgb = lin
        elif gamma_mode == "poly":
            t = jnp.sqrt(jnp.sqrt(lin))
            acc = jnp.float32(_GAMMA_POLY[-1])
            for coef in _GAMMA_POLY[-2::-1]:
                acc = acc * t + jnp.float32(coef)
            srgb = jnp.where(
                lin <= 0.0031308, 12.92 * lin, 1.055 * acc - 0.055
            )
        else:
            srgb = jnp.where(
                lin <= 0.0031308,
                12.92 * lin,
                1.055 * jnp.exp(jnp.log(jnp.maximum(lin, 1e-12)) / 2.4)
                - 0.055,
            )
        out.append(
            jnp.round(jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.int32)
        )

    packed = out[0] | (out[1] << 8) | (out[2] << 16) | jnp.int32(-16777216)
    out_ref[:] = jax.lax.bitcast_convert_type(packed, jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "cfa", "band_rows", "gamma_mode", "demosaic",
        "ablate", "interpret",
    ),
)
def develop_rgba_pallas(
    raw_u16: jnp.ndarray,  # (H, W) uint16
    params: jnp.ndarray,  # (1, 128) f32, see _develop_kernel
    inv2d: jnp.ndarray | None = None,  # (3*H, W) f32 table, or None to
    # compute the normalizer in-kernel (bitwise-identical, no HBM stream)
    *,
    height: int,
    width: int,
    cfa: tuple,
    band_rows: int | None = None,  # grid band height (None = mode default)
    gamma_mode: str = "exact",  # "poly": minimax transfer curve (see
    # _GAMMA_POLY; <= 1e-3 u8 of exact, inside the fidelity contract)
    demosaic: str = "bilinear",  # "malvar": MHC 5x5 gradient-corrected
    # demosaic (WB-first, zero-padded borders; compute mode only — the
    # streamed table is the bilinear mask normalizer)
    ablate: str = "",  # timing ablations (wrong results): dma|demosaic|
    # nogamma — benchmarks/ablate_develop.py
    interpret: bool = False,
):
    """(H, W) uint32 RGBA8888 preview, fully fused in one kernel.

    raw_u16 may also be a BATCH (B, H, W) — compute mode only — decoded
    in ONE kernel launch with a frame-major linear band grid; returns
    (B, H, W) uint32. Bit-identical per frame to B single calls (pinned
    in tests/test_preview.py; re-gated per pair on hw by the bench).

    Any width: non-128-multiples (e.g. the dominant phone full-res
    4032x3024) are zero-padded on the right to the next lane multiple.
    The padded columns behave exactly like the XLA path's zero padding —
    they contribute 0 to their real neighbors' convs, and the true right
    border's mask normalizer (column width-1) already encodes the missing
    neighbor. Padded output columns are cropped."""
    use_table = inv2d is not None
    if demosaic == "malvar" and use_table:
        raise ValueError(
            "demosaic='malvar' needs compute mode (the streamed table is "
            "the bilinear mask normalizer); pass inv2d=None"
        )
    # malvar at the compute-mode default BR=64 reproducibly crashes the
    # axon remote-compile helper at 4K (HTTP 500, subprocess exit 1 —
    # same failure family as the >=4-inline-develop-calls crash); BR=32
    # compiles and runs correctly (probed 2026-08-21), so malvar uses
    # the table-mode band height.
    BR = band_rows or (
        BAND_ROWS if use_table or demosaic == "malvar"
        else BAND_ROWS_COMPUTE
    )
    nb = -(-height // BR)
    hp = nb * BR
    wp = width + (-width) % 128
    # hN top halo rows (1 bilinear, 2 malvar) + bottom zero rows to
    # hp+16: every band's aligned (BR+16)-row DMA window is in range, and
    # the (BR+2*hN)-row compute halo is zero-padded exactly like the
    # model.
    hN = 2 if demosaic == "malvar" else 1
    batched = raw_u16.ndim == 3
    B = raw_u16.shape[0] if batched else 1
    if batched and use_table:
        raise ValueError(
            "batched develop requires compute mode (pass inv2d=None)"
        )
    if batched:
        # B frames in ONE kernel launch (linear frame-major band grid):
        # each frame gets a BR-aligned fstride-row block so the kernel
        # can compute DMA starts per frame (jax.vmap can't lift the
        # ANY-space operands). fstride = hp + BR covers the last band's
        # (BR+16)-row window (BR >= 32 > 16). Used by the bench preview
        # pairs to cut per-dispatch submission share without adding
        # develop custom-calls (the remote-compile helper crashes at
        # >= 4 inline develop calls per program).
        fstride = hp + BR
        raw_u16 = jnp.pad(
            raw_u16,
            ((0, 0), (hN, fstride - hN - height), (0, wp - width)),
        ).reshape(B * fstride, wp)
    else:
        fstride = 0
        raw_u16 = jnp.pad(
            raw_u16, ((hN, hp + 16 - hN - height), (0, wp - width))
        )
    inputs = [params, raw_u16]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # params
        pl.BlockSpec(memory_space=pl.ANY),  # raw
    ]
    scratch = [pltpu.VMEM((2, BR + 16, wp), jnp.uint16)]
    if use_table:
        if hp != height or wp != width:
            inv2d = jnp.pad(
                inv2d.reshape(3, height, width),
                ((0, 0), (0, hp - height), (0, wp - width)),
                constant_values=1.0,
            ).reshape(3 * hp, wp)
        inputs.append(inv2d)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # inv
        scratch.append(pltpu.VMEM((2, 3, BR, wp), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B * nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BR, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _develop_kernel, H=hp, W=wp, real_h=height, real_w=width,
            cfa=tuple(cfa), use_table=use_table, gamma_mode=gamma_mode,
            demosaic=demosaic, ablate=ablate,
            nb_per=(nb if batched else 0), fstride=fstride,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * nb * BR, wp), jnp.uint32),
        interpret=interpret,
    )(*inputs)
    if batched:
        return out.reshape(B, hp, wp)[:, :height, :width]
    return out[:height, :width]


def pack_develop_params(
    black_level, white_level, as_shot_neutral, forward_matrix
) -> np.ndarray:
    """(1, 128) f32 parameter row for develop_rgba_pallas."""
    from ..preview import _XYZ_D50_TO_SRGB

    p = np.zeros((1, 128), dtype=np.float32)
    p[0, 0:4] = np.asarray(black_level, dtype=np.float32)
    p[0, 4] = np.float32(white_level)
    p[0, 5:8] = 1.0 / np.asarray(as_shot_neutral, dtype=np.float32)
    m = _XYZ_D50_TO_SRGB @ np.asarray(
        forward_matrix, dtype=np.float32
    ).reshape(3, 3)
    p[0, 8:17] = m.reshape(-1)
    return p
