"""Fused Pallas TPU kernel for the legacy-codec block unpack.

Same chunked-DMA + one-hot-MXU-row-fetch skeleton as the modern kernel
(pallas_unpack.py), but the unpack itself is *table-driven*: every legacy
output value is at most two byte fields at static per-class positions
(kernels/tables.py), so instead of per-class unpack code the kernel

  1. class-selects per-block field tables (pos/rshift/mask/lshift),
  2. turns them into absolute byte addresses (legacy offsets are NOT
     aligned — blocks start anywhere after their 2-byte inline headers),
  3. does one per-lane dynamic gather for both fields at once
     (field 0 in lanes 0..15, field 1 in lanes 16..31),
  4. combines with shifts/masks — no class branching at all.

The host-side serial header walk (native C++ mcraw_legacy_scan) feeds the
per-block (offset, bits, reference) arrays, exactly as for the XLA path.

The interleave epilogue needs no transpose: the even/odd block pair packs
into one int32 and bitcasts to two uint16 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables as T
from . import unpack as U

BLOCKS_PER_CHUNK = 512
_MAX_BYTES_PER_BLOCK = 32  # payload only; the 2-byte header is behind offset


def _span_rows(blocks_per_chunk: int) -> int:
    # worst case: every block 2+32 bytes -> span <= B*34 bytes of 512B rows
    rows = (blocks_per_chunk * 34) // 512 + 2
    return rows + (-rows) % 8


def _field_tables():
    """(n_classes, 128) int32 lane tables: field0 in lanes 0..15, field1 in
    lanes 16..31, zeros elsewhere."""
    n = len(T.LEGACY_CLASSES)
    pos = np.zeros((n, 128), dtype=np.int32)
    rsh = np.zeros((n, 128), dtype=np.int32)
    msk = np.zeros((n, 128), dtype=np.int32)
    lsh = np.zeros((n, 128), dtype=np.int32)
    for ci in range(n):
        for f in range(2):
            pos[ci, 16 * f : 16 * f + 16] = T.LEGACY_POS[ci, :, f]
            rsh[ci, 16 * f : 16 * f + 16] = T.LEGACY_RSH[ci, :, f]
            msk[ci, 16 * f : 16 * f + 16] = T.LEGACY_MSK[ci, :, f]
            lsh[ci, 16 * f : 16 * f + 16] = T.LEGACY_LSH[ci, :, f]
    return pos, rsh, msk, lsh


_POS, _RSH, _MSK, _LSH = _field_tables()
# Stacked (4*n_classes, 128): row t*n + ci is table t for class ci. Passed as
# a kernel input — Pallas cannot capture closure constants.
_TABLES = np.concatenate([_POS, _RSH, _MSK, _LSH], axis=0)


def _legacy_kernel(
    base_ref,  # scalar prefetch: (num_chunks,) int32 chunk base row (512B rows)
    meta_ref,  # (1, 8, B) int32: row 0 = byte offsets, 1 = class, 2 = refs
    tables_ref,  # (48, 128) int32 field tables
    payload_ref,  # HBM (P/512, 128) int32 words
    out_ref,  # (B, 16) uint16
    scratch_ref,  # VMEM (2, rows, 128) int32
    sems,  # DMA semaphores (2,)
    rows: int = None,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def span_dma(chunk, dst_slot):
        return pltpu.make_async_copy(
            payload_ref.at[pl.ds(base_ref[chunk], rows), :],
            scratch_ref.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(i == 0)
    def _():
        span_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        span_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    base_row = base_ref[i]
    b = meta_ref.shape[2]
    meta = meta_ref[0]
    offs_col = jnp.transpose(meta[0:1, :], (1, 0))  # (B, 1) byte offsets
    cls_col = jnp.transpose(meta[1:2, :], (1, 0))
    refs_col = jnp.transpose(meta[2:3, :], (1, 0))
    rel = offs_col - base_row * 512  # byte offset within scratch span

    # Per-block field tables via class select (12 classes, constant rows).
    ncls = len(T.LEGACY_CLASSES)

    def table_select(t):
        out = None
        for ci in range(ncls):
            row = tables_ref[t * ncls + ci : t * ncls + ci + 1, :]  # (1, 128)
            contrib = jnp.where(cls_col == ci, row, 0)
            out = contrib if out is None else out | contrib
        return out  # (B, 128)

    pos = table_select(0)
    rsh = table_select(1)
    msk = table_select(2)
    lsh = table_select(3)

    # One-hot row fetch (same exact-bf16 byte-plane trick as the modern
    # kernel): rows q and q+1 of the span, 512 bytes each.
    q = rel >> 9
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
    oh0 = (row_ids == q).astype(jnp.bfloat16)
    oh1 = (row_ids == q + 1).astype(jnp.bfloat16)

    span_dma(i, slot).wait()
    span = scratch_ref[slot]
    planes = jnp.concatenate(
        [
            (jax.lax.shift_right_logical(span, 8 * k) & 0xFF).astype(jnp.bfloat16)
            for k in range(4)
        ],
        axis=1,
    )  # (rows, 512)

    def pick(oh):
        p = jnp.dot(oh, planes, preferred_element_type=jnp.float32).astype(jnp.int32)
        return (
            p[:, 0:128]
            | (p[:, 128:256] << 8)
            | (p[:, 256:384] << 16)
            | (p[:, 384:512] << 24)
        )

    row0 = pick(oh0)  # (B, 128) words of row q
    row1 = pick(oh1)

    # Absolute byte address of every field -> word-in-row-pair + byte shift.
    addr = rel + pos  # (B, 128); lanes >= 32 are don't-care
    widx = (addr >> 2) - (q << 7)  # word index within the two fetched rows
    in0 = widx < 128
    w0 = jnp.take_along_axis(row0, jnp.where(in0, widx, 0), axis=1)
    w1 = jnp.take_along_axis(row1, jnp.where(in0, 0, widx - 128), axis=1)
    words = jnp.where(in0, w0, w1)
    byts = jax.lax.shift_right_logical(words, 8 * (addr & 3)) & 0xFF

    fields = ((byts >> rsh) & msk) << lsh  # (B, 128)
    vals = fields[:, 0:16] | fields[:, 16:32]
    out_ref[:] = ((vals + refs_col) & 0xFFFF).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("num_chunks", "interpret"))
def _unpack_legacy_pallas(
    payload2d: jnp.ndarray,  # (rows, 128) int32
    base_rows: jnp.ndarray,  # (num_chunks,) int32 (512-byte row units)
    meta: jnp.ndarray,  # (num_chunks, 8, B) int32
    *,
    num_chunks: int,
    interpret: bool = False,
):
    b = meta.shape[2]
    rows = _span_rows(b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, b), lambda i, base: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # field tables, whole
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, 16), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_legacy_kernel, rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * b, 16), jnp.uint16),
        interpret=interpret,
    )(base_rows, meta, jnp.asarray(_TABLES), payload2d)


# -----------------------------------------------------------------------------
# v5: fused even/odd interleave — the kernel writes finished pixel rows.
#
# Each kernel row processes 8 consecutive blocks (4 even/odd pairs) with the
# 128 lanes laid out as lane l = 32*(l>>5) + 2k + c: 128 CONSECUTIVE output
# pixels of one image row (RawData_Legacy.cpp:483-486 interleave is just the
# lane order). Output is (rows, 128) row-major pixel segments whose reshape
# to (H, segs*128) is free; the old _interleave_packed epilogue vanishes.
# Lane utilization is 4x the one-block-per-row kernel (128/128 vs 32/128).
# -----------------------------------------------------------------------------

ROWS_PER_CHUNK_LEG = 512  # kernel rows (of 8 blocks) per grid step


def _merged_pair_row(span, q, rel0, row_ids, plane_mode):
    """Byteswap the chunk span to big-endian word order, fetch pair rows
    q/q+1 via one-hot MXU picks, and select per lane position into ONE
    128-word row per block row (merged-row trick: the row's window starts
    at word t0 = (rel0>>2)&127 and spans < 128 words, so row q's used
    lanes are [t0, 128) and row q+1's [0, t0) — disjoint).

    plane_mode: "halves" = two f32 16-bit half planes under 6-pass
    HIGHEST dots (exact < 2^24); "bytes" = four bf16 byte planes under
    1-pass DEFAULT dots (bf16 exact <= 255), selected in byte-plane
    space so the int32 convert + 4-byte reassembly happens once;
    "packed" = byte planes with BOTH pair rows fetched in ONE dot (the
    one-hot carries {1, 256}: c = p_q + (p_{q+1} << 8) is exact under a
    DEFAULT bf16 dot — 256*byte is a pure exponent shift of <= 8
    significand bits, and the two-term f32 sum <= 65535 < 2^24; the
    pair-row select becomes a variable right-shift of the int32 c)."""
    if plane_mode not in (
        "halves", "bytes", "packed", "packed2", "packed-noswap"
    ):
        raise ValueError(f"unknown plane_mode {plane_mode!r}")
    if plane_mode == "packed-noswap":  # benchmark-only byteswap drop
        span_be, plane_mode = span, "packed"
    else:
        span_be = (
            ((span & 0xFF) << 24)
            | ((span & 0xFF00) << 8)
            | (jax.lax.shift_right_logical(span, 8) & 0xFF00)
            | jax.lax.shift_right_logical(span, 24)
        )
    t0 = (rel0 >> 2) & 127
    if plane_mode in ("bytes", "packed"):
        planes = jnp.concatenate(
            [
                (span_be & 0xFF).astype(jnp.bfloat16),
                (jax.lax.shift_right_logical(span_be, 8) & 0xFF).astype(
                    jnp.bfloat16
                ),
                (jax.lax.shift_right_logical(span_be, 16) & 0xFF).astype(
                    jnp.bfloat16
                ),
                jax.lax.shift_right_logical(span_be, 24).astype(
                    jnp.bfloat16
                ),
            ],
            axis=1,
        )  # (rows, 512)

        def pick(oh):
            return jnp.dot(
                oh.astype(jnp.bfloat16),
                planes,
                preferred_element_type=jnp.float32,
            )

        lanep = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1) & 127
        if plane_mode in ("packed", "packed2"):
            oh = (row_ids == q).astype(jnp.int32) + (
                (row_ids == q + 1).astype(jnp.int32) << 8
            )
            c = pick(oh).astype(jnp.int32)
            if plane_mode == "packed2":
                # Constant-shift extraction + plain select (A/B vs the
                # variable-shift form; both exact, c = p_q + (p_{q+1}<<8)).
                # MEASURED (r3, probe_legacy_sharp_null_lv5packed_
                # lv5packed2_lv6packed_lv6packed2.json): REJECTED — 2.4x
                # slower than the variable shift (lv5 1.030 vs 0.426,
                # lv6 1.281 vs 0.673 ms net 4K): materializing BOTH
                # extracted rows + a select costs more vector work than
                # one lane-variable shift.
                pm = jnp.where(
                    lanep >= t0,
                    c & 0xFF,
                    jax.lax.shift_right_logical(c, 8),
                )
            else:
                pm = (
                    jax.lax.shift_right_logical(
                        c, jnp.where(lanep >= t0, 0, 8)
                    )
                    & 0xFF
                )
        else:
            p0 = pick(row_ids == q)
            p1 = pick(row_ids == q + 1)
            pm = jnp.where(lanep >= t0, p0, p1).astype(jnp.int32)
        return (
            pm[:, 0:128]
            | (pm[:, 128:256] << 8)
            | (pm[:, 256:384] << 16)
            | (pm[:, 384:512] << 24)
        )
    hi = jax.lax.Precision.HIGHEST
    planes = jnp.concatenate(
        [
            (span_be & 0xFFFF).astype(jnp.float32),
            jax.lax.shift_right_logical(span_be, 16).astype(jnp.float32),
        ],
        axis=1,
    )  # (rows, 256)

    def pick(oh):
        p = jnp.dot(
            oh, planes, precision=hi, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        return p[:, 0:128] | (p[:, 128:256] << 16)

    row0 = pick((row_ids == q).astype(jnp.float32))
    row1 = pick((row_ids == q + 1).astype(jnp.float32))
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.where(lane128 >= t0, row0, row1)


def _legacy_kernel_v5(
    base_ref,  # scalar prefetch: (num_chunks,) int32 chunk base row (512B)
    meta_ref,  # (1, B, 24) int32: cols 0-7 CHUNK-RELATIVE offsets (past
    # headers, < 2^18), 8-15 class, 16-23 refs — sublane-major so each
    # param block feeds the one-hot lane-expansion dot directly
    lane_sel_ref,  # (8, 128) f32 _LANE_SEL
    payload_ref,  # HBM (P/512, 128) int32
    out_ref,  # (B, 128) uint16 — finished pixel segments
    scratch_ref,  # VMEM (2, rows, 128) int32
    sems,
    rows: int = None,
    plane_mode: str = "packed",
    meta_layout: str = "rows",  # meta_ref orientation: "rows" = (1, B, 24)
    # sublane-major (host-built; 24 of 128 lanes used -> 5.3x padded HBM
    # reads), "lanes" = (1, 24, B) lane-major (DENSE in TPU tiling — B is
    # a lane multiple — transposed once in-kernel, the modern kernel's
    # chunk_mt trick). Lane-major is what makes the v6 device prologue
    # cheap: reshaping the (nblk,) scan outputs to minor-dim-8/24 blocks
    # physically materializes 16x/5.3x padded arrays on TPU.
    meta_mode: str = "bytedot",  # lane-expansion dot structure:
    # "bytedot" (DEFAULT) = byte-split the int32 meta into three bf16 byte
    #   planes (b,72) and expand ALL params in ONE DEFAULT bf16 dot against
    #   the (72,384) {1,256,65536}-weighted selector — exact (each product
    #   is a byte exponent-shifted by 2^(8k) <= 2^24, the 3-term sum is the
    #   value itself < 2^24), and ONE MXU pass where the f32 HIGHEST forms
    #   cost 6 passes per dot (lv5 meta block: 0.299 ms of the 0.660 ms 4K
    #   chunk body under dot3 — probe_legacy_sharp lv5nometa leg)
    # "dot3" = three (b,8)x(8,128) f32 HIGHEST dots (r3 original)
    # "onedot" = ONE fused (b,24)x(24,384) f32 HIGHEST dot (measured
    #   0.672 vs dot3's 0.660 net — pass count, not dot count, rules)
    ablate: str | None = None,  # benchmark-only stage drops (wrong output)
):
    """Bitstream form: every legacy class is a plain MSB-first c-bit
    bitstream over its block payload (verified against tables.py /
    RawData_Legacy.cpp:38-370; the 16-bit class is big-endian uint16 = the
    same stream at c=16). So instead of descriptor tables the kernel
    byteswaps the span once and extracts value k of a c-bit block as the
    top c bits of a two-word big-endian funnel at bit offset 8*off + k*c —
    no class tables, no field loop, one funnel per lane.

    plane_mode mirrors the modern kernel (pallas_unpack.py): "halves" =
    two f32 16-bit half planes, picks as 6-pass HIGHEST dots (f32-exact
    < 2^24); "bytes" = four bf16 byte planes, picks as 1-pass DEFAULT
    dots (bf16-exact <= 255); "packed" = byte planes with BOTH pair rows
    in ONE dot ({1,256} one-hot, exact <= 65535 < 2^24). Same VMEM bytes;
    the pick reduction depth here is the chunk span (~192 rows at 4K), so
    cutting MXU passes matters more than in the modern kernel — and
    unlike modern (where the variable-shift select costs more than the
    dot it saves, see pallas_unpack.py), legacy's deeper picks make
    packed the measured WINNER: 4K sharp A/B, null-netted, v5
    2.09 (halves) -> 1.57 (bytes) -> 1.50 (packed), v6 1.69 -> 1.18 ->
    1.09 ms/frame
    (benchmarks/probe_legacy_sharp_null_lv5bytes_lv5packed_lv6bytes_lv6packed.json);
    "packed" is the default. With the meta lane-expansion dot (round 3)
    the same A/B frame runs 0.60-0.66 ms on this v5 kernel and 0.77-0.83
    on the 3-block v6 path
    (probe_legacy_sharp_null_lv6packed_lv6blocks_lv5packed.json)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def span_dma(chunk, dst_slot):
        return pltpu.make_async_copy(
            payload_ref.at[pl.ds(base_ref[chunk], rows), :],
            scratch_ref.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(i == 0)
    def _():
        span_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        span_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    if meta_layout == "lanes":
        b = meta_ref.shape[2]
        meta = jnp.transpose(meta_ref[0], (1, 0))  # one (24,B)->(B,24)
    else:
        b = meta_ref.shape[1]
        meta = meta_ref[0]  # (b, 24)
    sel = lane_sel_ref[...]
    hi = jax.lax.Precision.HIGHEST

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    if ablate == "nometa":
        # Constant per-lane meta: keeps merged production + funnel gathers,
        # drops the meta lane expansion (mirrors the v6 kernel's leg).
        rel_lane = jnp.broadcast_to(meta[:, 0:1], (b, 128))
        cls_lane = jnp.full((b, 128), 4, jnp.int32)
        refs_lane = lane
    elif meta_mode == "bytedot":
        # Byte-split + ONE DEFAULT bf16 dot (see the meta_mode docstring).
        # All meta values are nonnegative < 2^24 (rel chunk-relative < 2^18,
        # cls <= 11, refs <= 0xFFFF), so v = b0 + (b1<<8) + (b2<<16) with
        # each byte bf16-exact and each selector weight a power of two.
        mb = meta[:, 0:24]
        op = jnp.concatenate(
            [
                (mb & 0xFF).astype(jnp.bfloat16),
                (jax.lax.shift_right_logical(mb, 8) & 0xFF).astype(
                    jnp.bfloat16
                ),
                jax.lax.shift_right_logical(mb, 16).astype(jnp.bfloat16),
            ],
            axis=1,
        )  # (b, 72)
        d = jnp.dot(
            op, sel, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        rel_lane = d[:, 0:128]
        cls_lane = d[:, 128:256]
        refs_lane = d[:, 256:384]
    elif meta_mode == "onedot":
        # ONE (b, 24) x (24, 384) block-diagonal one-hot dot expands all
        # three params at once (exactness identical to the 3-dot form:
        # each output lane contracts the same single one-hot row).
        d = jnp.dot(
            meta[:, 0:24].astype(jnp.float32), sel,
            precision=hi, preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        rel_lane = d[:, 0:128]
        cls_lane = d[:, 128:256]
        refs_lane = d[:, 256:384]
    else:
        # (b, 8) -> (b, 128) lane expansion as ONE tiny one-hot MXU dot per
        # param (f32 HIGHEST exact: rel < 2^18 chunk-relative, cls <= 11,
        # refs <= 0xFFFF — all < 2^24). Same meta-dot structure as the v6
        # kernel; the widen8-broadcast + gather alternative measured 0.59 ms
        # of the 1.09 ms v6 chunk body (probe_legacy_sharp lv6widen leg).
        def expand(col0):
            return jnp.dot(
                meta[:, col0 : col0 + 8].astype(jnp.float32), sel,
                precision=hi, preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        rel_lane = expand(0)
        cls_lane = expand(8)
        refs_lane = expand(16)
    # Class index -> bit width (LEGACY_CLASSES: indices 0..10 are the bits
    # value itself, index 11 is 16).
    cb = jnp.where(cls_lane >= 11, 16, cls_lane)

    rel0 = meta[:, 0:1]  # (B, 1) chunk-relative
    q = rel0 >> 9
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)

    span_dma(i, slot).wait()
    # 8 blocks span <= 272 bytes: rows q, q+1 always cover the windows.
    merged = _merged_pair_row(
        scratch_ref[slot], q, rel0, row_ids,
        plane_mode if ablate != "noswap" else "packed-noswap",
    )
    if ablate == "merged":
        # Stop after merged production: no meta, no funnel (wrong output).
        out_ref[:] = (merged & 0xFFFF).astype(jnp.uint16)
        return

    # Value k of a c-bit block at payload byte `off` = top c bits of the
    # 64-bit big-endian window at bit 8*off + k*c.
    k = (lane & 31) >> 1
    bitp = ((rel_lane - (q << 9)) << 3) + k * cb  # bit addr in the row pair
    wd = jax.lax.shift_right_logical(bitp, 5)
    sh = bitp & 31
    g0 = jnp.take_along_axis(merged, wd & 127, axis=1)
    if ablate == "oneg":
        comb = g0 << sh  # (wrong output: drops the second funnel word)
    else:
        g1 = jnp.take_along_axis(merged, (wd + 1) & 127, axis=1)
        comb = (g0 << sh) | jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(g1, 31 - sh), 1
        )
    vals = jax.lax.shift_right_logical(comb, 32 - jnp.maximum(cb, 1))
    vals = jnp.where(cb == 0, 0, vals)

    out_ref[:] = ((vals + refs_lane) & 0xFFFF).astype(jnp.uint16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_chunks", "rows", "plane_mode", "meta_layout", "meta_mode",
        "ablate", "interpret",
    ),
)
def _unpack_legacy_pallas_v5(
    payload2d: jnp.ndarray,
    base_rows: jnp.ndarray,
    meta: jnp.ndarray,  # (num_chunks, B, 24), or (num_chunks, 24, B) when
    # meta_layout == "lanes" — see _legacy_kernel_v5
    *,
    num_chunks: int,
    rows: int | None = None,  # content-aware chunk span (None = worst)
    plane_mode: str = "packed",
    meta_layout: str = "rows",
    meta_mode: str = "bytedot",
    ablate: str | None = None,
    interpret: bool = False,
):
    b = meta.shape[2] if meta_layout == "lanes" else meta.shape[1]
    rows_worst = (b * 8 * 34) // 512 + 2
    rows_worst += (-rows_worst) % 8
    rows = rows_worst if rows is None else min(rows_worst, rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 24, b) if meta_layout == "lanes" else (1, b, 24),
                lambda i, base: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lane-sel table, whole
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, 128), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    sel = {
        "bytedot": _LANE_SEL72, "onedot": _LANE_SEL24, "dot3": _LANE_SEL
    }[meta_mode]
    sel = jnp.asarray(sel, jnp.bfloat16 if meta_mode == "bytedot" else None)
    return pl.pallas_call(
        functools.partial(
            _legacy_kernel_v5, rows=rows, plane_mode=plane_mode,
            meta_layout=meta_layout, meta_mode=meta_mode, ablate=ablate,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * b, 128), jnp.uint16),
        interpret=interpret,
    )(base_rows, meta, sel, payload2d)


# -----------------------------------------------------------------------------
# v6 = the v5 kernel fed by DEVICE-side meta layout: the host contributes
# only the serial header scan (bits/refs/offs — the format's irreducible
# chain) and a bucketed payload upload; the (nc, ., b) kernel metadata is
# built inside the jit. The trick that makes this free: instead of the v5
# meta's (24, b) lane-major layout (which costs host transposes or device
# minor-dim matmuls), the v6 kernel takes offs/cls/refs as THREE (b, 8)
# sublane-major blocks — reshape(nblk,) -> (nc, b, 8) is layout-free, tail
# padding is a broadcast concat, and the kernel reads param p as a lane
# slice [:, p:p+1]. Ragged widths (padded_width % 128 != 0, e.g. 4032)
# additionally pad each image row's block run to segs*8 lanes with
# zero-class dummies before the reshape (see _v6_legacy_build).
# -----------------------------------------------------------------------------


def _lane_sel_table() -> np.ndarray:
    """(8, 128) f32 one-hot lane-expansion matrix: lane l of the kernel's
    128-lane layout carries block param p = ((l>>5)<<1) | (l&1) (4 pair
    groups x even/odd, 16 value lanes each — see _legacy_kernel_v5's lane
    map). meta_lane = meta8 @ S replaces the widen8 broadcast + per-lane
    gather complex with ONE tiny MXU pass per param (f32 HIGHEST one-hot
    contract: all operands < 2^24 — rel < 2^18, cls_enc < 2^10,
    refs <= 0xFFFF). Measured: the widen8+gather meta path was 0.59 ms of
    the 1.09 ms legacy v6 chunk body at 4K (probe_legacy_sharp
    lv6nometa leg) — the (b, 8)-minor broadcasts are exactly the minor-dim
    layout pathology the perf ledger flags."""
    s = np.zeros((8, 128), dtype=np.float32)
    l = np.arange(128)
    p = ((l >> 5) << 1) | (l & 1)
    s[p, l] = 1.0
    return s


_LANE_SEL = _lane_sel_table()


def _lane_sel24_table() -> np.ndarray:
    """(24, 384) block-diagonal stack of three _LANE_SEL blocks: one fused
    (b,24) x (24,384) dot expands offsets/cls/refs in a single MXU
    invocation (same one-hot rows per output lane -> same exactness)."""
    s = np.zeros((24, 384), dtype=np.float32)
    for blk in range(3):
        s[blk * 8 : (blk + 1) * 8, blk * 128 : (blk + 1) * 128] = _LANE_SEL
    return s


_LANE_SEL24 = _lane_sel24_table()


def _lane_sel72_table() -> np.ndarray:
    """(72, 384) bf16 byte-plane selector for the bytedot meta expansion:
    operand column 24*k + c carries byte k of meta column c, so selector
    row 24*k + c is the _LANE_SEL24 row c scaled by 256^k. Weights are
    powers of two (bf16-exact); each output lane contracts exactly three
    products b_k * 2^(8k) whose sum is the original value < 2^24."""
    s24 = _lane_sel24_table()
    s = np.zeros((72, 384), dtype=np.float32)
    for k in range(3):
        s[24 * k : 24 * (k + 1)] = s24 * float(1 << (8 * k))
    return s


_LANE_SEL72 = _lane_sel72_table()


def _leg_sub_rows(sgr: int) -> int:
    """Worst-case subgroup window rows for the subgrouped pick: the
    subgroup's first-block offsets span <= sgr*8*34 bytes (every block is
    <= 2+32 bytes), the window base rounds down up to 7 rows for the
    8-aligned plane slice, and rows q, q+1 of the LAST row must fit."""
    w = (sgr * 8 * 34) // 512 + 1 + 7 + 2
    return w + (-w) % 8


def _legacy_kernel_v6(
    base_ref,  # scalar prefetch: (num_chunks,) int32 chunk base row (512B);
    # in subgrouped mode (num_chunks * G,) 8-aligned subgroup window rows
    # with entry g=0 = the chunk base (exactly like the modern kernel's
    # per-subgroup base_ref, pallas_unpack.py:456)
    offs_ref,  # (1, b, 8) int32 CHUNK-RELATIVE payload byte offsets (past
    # headers; relativized by _v6_legacy_build so the vector path never
    # reads the base scalar and the lane-expansion dot stays < 2^24 exact)
    cls_ref,  # (1, b, 8) int32 class indices; in subgrouped mode column 0
    # additionally carries the row's window-relative pick row in bits 4+
    # (cls = enc & 15, qrel = enc >> 4 — packed by _v6_legacy_build so the
    # kernel's vector path never reads a scalar)
    refs_ref,  # (1, b, 8) int32 references
    *rest,  # [lane_sel_ref ((8,128) f32, meta_dot)], payload_ref (HBM),
    # out_ref ((b,128) uint16), scratch_ref ((2,rows,128) int32 VMEM),
    # [planes_ref (sub mode)], sems
    rows: int = None,
    plane_mode: str = "packed",
    sub: int | None = None,  # rows per subgroup (None = chunk-wide pick)
    meta_dot: bool = True,  # (b,8)->(b,128) meta via one-hot MXU expansion
    meta_mode: str = "bytedot",  # expansion dot structure when meta_dot:
    # "bytedot" = ONE DEFAULT bf16 byte-plane dot (see _legacy_kernel_v5),
    # "dot3" = three f32 HIGHEST dots (r3 original, kept for A/B)
    ablate: str | None = None,  # benchmark-only stage drops (wrong output)
):
    rest = list(rest)
    lane_sel_ref = rest.pop(0) if meta_dot else None
    payload_ref = rest.pop(0)
    out_ref = rest.pop(0)
    scratch_ref = rest.pop(0)
    planes_ref = rest.pop(0) if sub else None
    sems = rest.pop(0)
    G = (offs_ref.shape[1] // sub) if sub else 1
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def span_dma(chunk, dst_slot):
        return pltpu.make_async_copy(
            payload_ref.at[pl.ds(base_ref[chunk * G], rows), :],
            scratch_ref.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(i == 0)
    def _():
        span_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        span_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    base_row = base_ref[i * G]
    b = offs_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    rel0 = offs_ref[0][:, 0:1]  # (b, 1) chunk-relative
    q = rel0 >> 9
    hi = jax.lax.Precision.HIGHEST

    if ablate == "nometa":
        # Constant per-lane meta: keeps merged production + funnel gathers,
        # drops the meta lane expansion.
        rel_lane = jnp.broadcast_to(rel0, (b, 128))
        cls_lane = jnp.full((b, 128), 4, jnp.int32)
        refs_lane = lane
    elif meta_dot and meta_mode == "bytedot":
        # Byte-split + ONE DEFAULT bf16 dot over all three params: operand
        # column 24k + 8P + j carries byte k of param P block-lane j, the
        # (72, 384) selector weights it by 2^(8k) (_LANE_SEL72). Exact —
        # bytes are bf16-exact, weights are powers of two, and the 3-term
        # sums rebuild values < 2^24 (rel chunk-relative < 2^18,
        # cls_enc < 2^10, refs <= 0xFFFF). ONE MXU pass where the f32
        # HIGHEST 3-dot form costs 18 (6-pass bf16 decomposition each) —
        # that form measured 0.299 ms of the 0.660 ms v5 4K chunk body
        # (probe_legacy_sharp lv5nometa leg).
        sel = lane_sel_ref[...]
        m24 = jnp.concatenate(
            [offs_ref[0], cls_ref[0], refs_ref[0]], axis=1
        )  # (b, 24)
        op = jnp.concatenate(
            [
                (m24 & 0xFF).astype(jnp.bfloat16),
                (jax.lax.shift_right_logical(m24, 8) & 0xFF).astype(
                    jnp.bfloat16
                ),
                jax.lax.shift_right_logical(m24, 16).astype(jnp.bfloat16),
            ],
            axis=1,
        )  # (b, 72)
        d = jnp.dot(
            op, sel, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        rel_lane = d[:, 0:128]
        cls_lane = d[:, 128:256]
        refs_lane = d[:, 256:384]
        if sub:
            cls_lane = cls_lane & 15  # column 0 carries qrel in bits 4+
    elif meta_dot:
        # (b, 8) -> (b, 128) lane expansion as ONE tiny one-hot MXU dot per
        # param (exact: f32 HIGHEST, operands < 2^24 — rel < 2^18 by the
        # chunk-relative prologue, cls_enc < 2^10, refs <= 0xFFFF). The
        # widen8-broadcast + lane-gather alternative below measured 0.59 ms
        # of the 1.09 ms 4K chunk body (minor-dim-8 layout pathology).
        sel = lane_sel_ref[...]

        def expand(ref):
            return jnp.dot(
                ref[0].astype(jnp.float32), sel,
                precision=hi, preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        rel_lane = expand(offs_ref)
        cls_lane = expand(cls_ref)
        refs_lane = expand(refs_ref)
        if sub:
            cls_lane = cls_lane & 15  # column 0 carries qrel in bits 4+
    else:
        def widen8(ref):
            m = ref[0]  # (b, 8)
            cols = [
                jnp.broadcast_to(m[:, p : p + 1], (b, 16)) for p in range(8)
            ]
            return jnp.concatenate(cols, axis=1)  # (b, 128)

        offs8 = widen8(offs_ref)
        cls8 = widen8(cls_ref)
        refs8 = widen8(refs_ref)
        pidx = (((lane >> 5) << 1) | (lane & 1)) * 16
        rel_lane = jnp.take_along_axis(offs8, pidx, axis=1)
        cls_lane = jnp.take_along_axis(cls8, pidx, axis=1)
        refs_lane = jnp.take_along_axis(refs8, pidx, axis=1)
        if sub:
            cls_lane = cls_lane & 15  # column 0 carries qrel in bits 4+
    cb = jnp.where(cls_lane >= 11, 16, cls_lane)

    def funnel(merged, rel_l, q_l, cb_l, lane_l):
        """Value k of a c-bit block at payload byte `off` = top c bits of
        the 64-bit big-endian window at bit 8*off + k*c (merged carries
        the row's q/q+1 pair window; see _merged_pair_row)."""
        k = (lane_l & 31) >> 1
        bitp = ((rel_l - (q_l << 9)) << 3) + k * cb_l
        wd = jax.lax.shift_right_logical(bitp, 5)
        sh = bitp & 31
        g0 = jnp.take_along_axis(merged, wd & 127, axis=1)
        if ablate == "oneg":
            comb = g0 << sh
        else:
            g1 = jnp.take_along_axis(merged, (wd + 1) & 127, axis=1)
            comb = (g0 << sh) | jax.lax.shift_right_logical(
                jax.lax.shift_right_logical(g1, 31 - sh), 1
            )
        vals = jax.lax.shift_right_logical(comb, 32 - jnp.maximum(cb_l, 1))
        return jnp.where(cb_l == 0, 0, vals)

    span_dma(i, slot).wait()

    if not sub:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
        merged = _merged_pair_row(
            scratch_ref[slot], q, rel0, row_ids,
            plane_mode if ablate != "noswap" else "packed-noswap",
        )
        if ablate == "merged":
            # Stop after merged production: no meta, no funnel.
            out_ref[:] = (merged & 0xFFFF).astype(jnp.uint16)
            return
        vals = funnel(merged, rel_lane, q, cb, lane)
        out_ref[:] = ((vals + refs_lane) & 0xFFFF).astype(jnp.uint16)
        return

    # ---- Subgrouped pick (the modern kernel's structure): chunk-wide
    # byte/half planes built ONCE into a persistent VMEM scratch, then a
    # small 8-aligned window dot per subgroup instead of one chunk-span
    # dot per kernel row — the pick reduction depth drops from the chunk
    # span (~200+ rows at 4K) to the subgroup window (~32-48 rows). ----
    if plane_mode not in ("halves", "bytes", "packed", "packed2"):
        raise ValueError(f"unknown plane_mode {plane_mode!r}")
    sgr = sub
    wrows = planes_ref.shape[0] - rows  # static window rows (_leg_sub_rows)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(i == 0)
    def _():
        # Zero the window tail past the DMA span once so 8-aligned window
        # slices never contract garbage (one-hot zeros kill finite values,
        # but uninitialized bf16 could be NaN).
        planes_ref[pl.ds(rows, wrows), :] = jnp.zeros(
            (wrows, planes_ref.shape[1]), planes_ref.dtype
        )

    local_all = scratch_ref[slot]
    if ablate == "noswap":
        span_be = local_all
    else:
        span_be = (
            ((local_all & 0xFF) << 24)
            | ((local_all & 0xFF00) << 8)
            | (jax.lax.shift_right_logical(local_all, 8) & 0xFF00)
            | jax.lax.shift_right_logical(local_all, 24)
        )
    if plane_mode != "halves":
        planes_ref[pl.ds(0, rows), 0:128] = (span_be & 0xFF).astype(
            jnp.bfloat16
        )
        planes_ref[pl.ds(0, rows), 128:256] = (
            jax.lax.shift_right_logical(span_be, 8) & 0xFF
        ).astype(jnp.bfloat16)
        planes_ref[pl.ds(0, rows), 256:384] = (
            jax.lax.shift_right_logical(span_be, 16) & 0xFF
        ).astype(jnp.bfloat16)
        planes_ref[pl.ds(0, rows), 384:512] = jax.lax.shift_right_logical(
            span_be, 24
        ).astype(jnp.bfloat16)
    else:
        planes_ref[pl.ds(0, rows), 0:128] = (span_be & 0xFFFF).astype(
            jnp.float32
        )
        planes_ref[pl.ds(0, rows), 128:256] = jax.lax.shift_right_logical(
            span_be, 16
        ).astype(jnp.float32)

    qrel_col = jax.lax.shift_right_logical(cls_ref[0][:, 0:1], 4)  # (b, 1)
    lanep = jax.lax.broadcasted_iota(jnp.int32, (1, planes_ref.shape[1]), 1) & 127
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (sgr, wrows), 1)

    for g in range(G):
        off = base_ref[i * G + g] - base_row
        off8 = pl.multiple_of(off, 8)  # prep emits 8-aligned window bases
        planes = planes_ref[pl.ds(off8, wrows), :]
        sl = slice(g * sgr, (g + 1) * sgr)
        qrel = qrel_col[sl]  # (sgr, 1) window-relative pick row
        t0 = (rel0[sl] >> 2) & 127
        if plane_mode in ("packed", "packed2"):
            oh = (row_ids == qrel).astype(jnp.int32) + (
                (row_ids == qrel + 1).astype(jnp.int32) << 8
            )
            c = jnp.dot(
                oh.astype(jnp.bfloat16),
                planes,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            if plane_mode == "packed2":
                pm = jnp.where(
                    lanep >= t0,
                    c & 0xFF,
                    jax.lax.shift_right_logical(c, 8),
                )
            else:
                pm = (
                    jax.lax.shift_right_logical(
                        c, jnp.where(lanep >= t0, 0, 8)
                    )
                    & 0xFF
                )
        elif plane_mode == "bytes":
            p0 = jnp.dot(
                (row_ids == qrel).astype(jnp.bfloat16),
                planes,
                preferred_element_type=jnp.float32,
            )
            p1 = jnp.dot(
                (row_ids == qrel + 1).astype(jnp.bfloat16),
                planes,
                preferred_element_type=jnp.float32,
            )
            pm = jnp.where(lanep >= t0, p0, p1).astype(jnp.int32)
        else:  # halves
            p0 = jnp.dot(
                (row_ids == qrel).astype(jnp.float32),
                planes,
                precision=hi,
                preferred_element_type=jnp.float32,
            )
            p1 = jnp.dot(
                (row_ids == qrel + 1).astype(jnp.float32),
                planes,
                precision=hi,
                preferred_element_type=jnp.float32,
            )
            pm = jnp.where(lanep >= t0, p0, p1).astype(jnp.int32)
        if plane_mode != "halves":
            merged = (
                pm[:, 0:128]
                | (pm[:, 128:256] << 8)
                | (pm[:, 256:384] << 16)
                | (pm[:, 384:512] << 24)
            )
        else:
            merged = pm[:, 0:128] | (pm[:, 128:256] << 16)
        if ablate == "merged":
            out_ref[pl.ds(g * sgr, sgr)] = (merged & 0xFFFF).astype(
                jnp.uint16
            )
            continue
        vals = funnel(merged, rel_lane[sl], q[sl], cb[sl], lane[sl])
        out_ref[pl.ds(g * sgr, sgr)] = (
            (vals + refs_lane[sl]) & 0xFFFF
        ).astype(jnp.uint16)


def _unpack_legacy_pallas_v6_raw(
    payload2d: jnp.ndarray,  # (R, 128) int32
    base_rows: jnp.ndarray,  # (num_chunks,) int32; (num_chunks * G,) if sub
    offs: jnp.ndarray,  # (num_chunks, b, 8) int32
    cls: jnp.ndarray,  # (num_chunks, b, 8) int32 (qrel-packed col 0 if sub)
    refs: jnp.ndarray,  # (num_chunks, b, 8) int32
    *,
    num_chunks: int,
    rows: int,
    plane_mode: str = "packed",
    sub: int | None = None,
    meta_dot: bool = True,
    meta_mode: str = "bytedot",
    ablate: str | None = None,
    interpret: bool = False,
):
    if sub and not interpret:
        # Quarantine (VERDICT r3 #8): the subgrouped-window pick is
        # interpret-exact but SIGABRTs Mosaic on TPU hardware for every
        # full variant (r3 ledger; tools/hw_parity.py flags sweep
        # re-checks each round). Keep it out of the default namespace.
        import os

        if not os.environ.get("MCRAW_UNSAFE_VARIANTS"):
            raise ValueError(
                "sub=N is interpret-only: it crashes Mosaic on TPU "
                "hardware. Set MCRAW_UNSAFE_VARIANTS=1 to bypass for "
                "compiler-regression probes."
            )
    b = offs.shape[1]
    spec = pl.BlockSpec(
        (1, b, 8), lambda i, base: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.VMEM((2, rows, 128), jnp.int32)]
    if sub:
        pw_planes = 256 if plane_mode == "halves" else 512
        pdt = jnp.float32 if plane_mode == "halves" else jnp.bfloat16
        scratch.append(
            pltpu.VMEM((rows + _leg_sub_rows(sub), pw_planes), pdt)
        )
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    in_specs = [spec, spec, spec]
    args = [base_rows, offs, cls, refs]
    if meta_dot:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(
            jnp.asarray(_LANE_SEL72, jnp.bfloat16)
            if meta_mode == "bytedot"
            else jnp.asarray(_LANE_SEL)
        )
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(payload2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (b, 128), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(
            _legacy_kernel_v6, rows=rows, plane_mode=plane_mode, sub=sub,
            meta_dot=meta_dot, meta_mode=meta_mode, ablate=ablate,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * b, 128), jnp.uint16),
        interpret=interpret,
    )(*args)


def _v6_legacy_build(offs, bits, refs, *, pw: int, h: int, sub: int | None = None):
    """Device-side legacy meta: (nblk,) scan outputs -> kernel blocks.

    Pure reshapes + broadcast pads (no gathers, no matmuls, no minor-dim
    transposes). When pw % 128 == 0 each kernel row is exactly 8
    consecutive blocks and the layout is one reshape; ragged widths
    (pw % 128 != 0, e.g. the common 4032) pad each image row's block run
    out to segs*8 kernel lanes first — dummy lanes decode to zero (class
    0, ref 0) and are cropped by the caller, and their offsets broadcast
    the row's last real block so per-chunk offsets stay monotone (lane 0
    of every kernel row is always a real block, so rel0/base_rows are
    unaffected). Returns (base_rows, offs3, cls3, refs3)."""
    idx = _legacy_indices(pw, h)
    nc, segs = idx["num_chunks"], idx["segs"]
    b = ROWS_PER_CHUNK_LEG
    offs = offs.astype(jnp.int32)
    cls = jnp.minimum(bits.astype(jnp.int32), 11)
    refs = refs.astype(jnp.int32)
    row_blocks = 2 * (pw // 32)  # real blocks per image row
    lane_cols = segs * 8  # kernel-layout lanes per image row
    if lane_cols != row_blocks:
        pad_cols = lane_cols - row_blocks
        o2 = offs.reshape(h, row_blocks)
        offs = jnp.concatenate(
            [o2, jnp.broadcast_to(o2[:, -1:], (h, pad_cols))], axis=1
        ).reshape(-1)
        cls = jnp.concatenate(
            [cls.reshape(h, row_blocks), jnp.zeros((h, pad_cols), jnp.int32)],
            axis=1,
        ).reshape(-1)
        refs = jnp.concatenate(
            [refs.reshape(h, row_blocks), jnp.zeros((h, pad_cols), jnp.int32)],
            axis=1,
        ).reshape(-1)
    pad = nc * b * 8 - h * lane_cols
    if pad:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[-1:], (pad,))]
        )
        cls = jnp.concatenate([cls, jnp.zeros(pad, jnp.int32)])
        refs = jnp.concatenate([refs, jnp.zeros(pad, jnp.int32)])
    offs3 = offs.reshape(nc, b, 8)
    cls3 = cls.reshape(nc, b, 8)
    refs3 = refs.reshape(nc, b, 8)
    base_rows = jax.lax.shift_right_logical(offs3[:, 0, 0], 9)
    # Kernel offsets are CHUNK-RELATIVE (offs - chunk_base*512 < 2^18): the
    # kernel's vector path then never touches the base scalar, and the
    # one-hot f32 lane-expansion dot (_LANE_SEL) stays < 2^24 exact. Also
    # makes batch stacking rebase-free (relative offsets are shift-invariant).
    offs3 = offs3 - (base_rows << 9)[:, None, None]
    if sub:
        # Subgrouped pick: per-subgroup 8-aligned window base rows (entry
        # g=0 == the chunk base, since row 0 defines base_rows) and the
        # per-row window-relative pick row packed into cls column 0's
        # bits 4+ (the kernel's vector path never reads a scalar — same
        # rationale as the modern kernel's meta rows).
        row_q = jax.lax.shift_right_logical(
            offs3[:, :, 0], 9
        )  # (nc, b) chunk-relative pick rows (monotone)
        crel8 = row_q[:, ::sub] & ~7  # (nc, G)
        qrel = row_q - jnp.repeat(crel8, sub, axis=1)
        cls3 = cls3 + jnp.pad(
            (qrel << 4)[:, :, None], ((0, 0), (0, 0), (0, 7))
        )
        base_rows = (base_rows[:, None] + crel8).reshape(-1)
    return base_rows, offs3, cls3, refs3


@functools.partial(
    jax.jit,
    static_argnames=(
        "pw", "h", "width", "rows", "plane_mode", "sub", "meta_dot", "meta_mode",
        "m24", "ablate", "interpret",
    ),
)
def decode_legacy_device_v6(
    p32: jnp.ndarray,  # (R*128,) int32 bucketed payload words
    offs: jnp.ndarray,  # (nblk,) int32/int64 from the host scan
    bits: jnp.ndarray,  # (nblk,) int32
    refs: jnp.ndarray,  # (nblk,) uint16/int32
    *,
    pw: int,
    h: int,
    width: int,
    rows: int,
    plane_mode: str = "packed",
    sub: int | None = None,
    meta_dot: bool = True,
    meta_mode: str = "bytedot",
    m24: bool | str = False,  # True = (b,24) block-major; "lanes" = (24,b) lane-major
    ablate: str | None = None,
    interpret: bool = False,
):
    """Full legacy decode with on-device meta layout (host = scan only).

    m24=True concats the three (nc, b, 8) meta blocks into ONE
    (nc, b, 24) array on device and runs the v5 kernel — REJECTED as
    default: the minor-dim-8 device concat costs more than the 3-block
    input pipeline it removes (sharp A/B at 4K, same run: m24 0.930 vs
    3-block 0.767 ms net; v5 with HOST-built (b,24) meta is 0.60-0.66 —
    probe_legacy_sharp_null_lv6packed_lv6blocks_lv5packed.json). Kept as
    a pinned interpret-tested variant.

    m24="lanes" builds ONE (nc, 24, b) LANE-MAJOR meta instead — dense
    in TPU tiling (b is a lane multiple), where every minor-dim-8/24
    block layout physically materializes 16x/5.3x padded HBM arrays.
    The v5 kernel transposes it once per chunk in VMEM (chunk_mt
    trick)."""
    idx = _legacy_indices(pw, h)
    nc, segs = idx["num_chunks"], idx["segs"]
    base_rows, offs3, cls3, refs3 = _v6_legacy_build(
        offs, bits, refs, pw=pw, h=h, sub=sub
    )
    if m24 == "lanes" and not sub and ablate is None:
        meta_lm = jnp.concatenate(
            [
                jnp.swapaxes(offs3, 1, 2),
                jnp.swapaxes(cls3, 1, 2),
                jnp.swapaxes(refs3, 1, 2),
            ],
            axis=1,
        )  # (nc, 24, b) — fuses with the build into one dense copy
        out = _unpack_legacy_pallas_v5.__wrapped__(
            p32.reshape(-1, 128), base_rows, meta_lm,
            num_chunks=nc, rows=rows, plane_mode=plane_mode,
            meta_layout="lanes", meta_mode=meta_mode,
            interpret=interpret,
        )
    elif m24 and not sub and ablate is None:
        meta24 = jnp.concatenate([offs3, cls3, refs3], axis=2)
        out = _unpack_legacy_pallas_v5.__wrapped__(
            p32.reshape(-1, 128), base_rows, meta24,
            num_chunks=nc, rows=rows, plane_mode=plane_mode,
            interpret=interpret,
        )
    else:
        out = _unpack_legacy_pallas_v6_raw(
            p32.reshape(-1, 128), base_rows, offs3, cls3, refs3,
            num_chunks=nc, rows=rows, plane_mode=plane_mode, sub=sub,
            meta_dot=meta_dot, meta_mode=meta_mode, ablate=ablate,
            interpret=interpret,
        )
    img = out[: h * segs].reshape(h, segs * 128)
    return img[:, :width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "pw", "h", "width", "rows", "plane_mode", "sub", "meta_dot", "meta_mode",
        "m24", "interpret",
    ),
)
def decode_legacy_device_v6_batch(
    p32s: jnp.ndarray,  # (F, R*128) int32 per-frame bucketed words
    offs: jnp.ndarray,  # (F, nblk)
    bits: jnp.ndarray,  # (F, nblk)
    refs: jnp.ndarray,  # (F, nblk)
    *,
    pw: int,
    h: int,
    width: int,
    rows: int,
    plane_mode: str = "packed",
    sub: int | None = None,
    meta_dot: bool = True,
    meta_mode: str = "bytedot",
    m24: bool | str = False,  # True = (b,24) block-major; "lanes" = (24,b) lane-major
    interpret: bool = False,
):
    """(F, H, W) legacy decode, device-side prep, ONE kernel launch."""
    idx = _legacy_indices(pw, h)
    nc, segs = idx["num_chunks"], idx["segs"]
    f = p32s.shape[0]
    frame_rows = p32s.shape[1] // 128
    base, o3, c3, r3 = jax.vmap(
        functools.partial(_v6_legacy_build, pw=pw, h=h, sub=sub)
    )(offs, bits, refs)
    shift = jnp.arange(f, dtype=jnp.int32) * frame_rows
    base = (base + shift[:, None]).reshape(-1)
    # offsets are chunk-relative (see _v6_legacy_build) — no per-frame rebase
    if m24 == "lanes" and not sub:
        meta_lm = jnp.concatenate(
            [
                jnp.swapaxes(o3, 2, 3),
                jnp.swapaxes(c3, 2, 3),
                jnp.swapaxes(r3, 2, 3),
            ],
            axis=2,
        )  # (f, nc, 24, b)
        out = _unpack_legacy_pallas_v5.__wrapped__(
            p32s.reshape(-1, 128), base,
            meta_lm.reshape(f * nc, 24, -1),
            num_chunks=f * nc, rows=rows, plane_mode=plane_mode,
            meta_layout="lanes", meta_mode=meta_mode,
            interpret=interpret,
        )
    elif m24 and not sub:
        meta24 = jnp.concatenate(
            [o3, c3, r3], axis=3
        ).reshape(f * nc, -1, 24)
        out = _unpack_legacy_pallas_v5.__wrapped__(
            p32s.reshape(-1, 128), base, meta24,
            num_chunks=f * nc, rows=rows, plane_mode=plane_mode,
            interpret=interpret,
        )
    else:
        out = _unpack_legacy_pallas_v6_raw(
            p32s.reshape(-1, 128), base,
            o3.reshape(f * nc, -1, 8), c3.reshape(f * nc, -1, 8),
            r3.reshape(f * nc, -1, 8),
            num_chunks=f * nc, rows=rows, plane_mode=plane_mode, sub=sub,
            meta_dot=meta_dot, meta_mode=meta_mode, interpret=interpret,
        )
    rows_frame = out.shape[0] // f
    out = out.reshape(f, rows_frame, 128)[:, : h * segs]
    return out.reshape(f, h, segs * 128)[:, :, :width]


LEGACY_PAYLOAD_BUCKET_ROWS = 4096  # 2 MB H2D buckets bound jit recompiles


def prepare_legacy_light(
    payload: np.ndarray,
    width: int,
    height: int,
    window: np.ndarray | None = None,
):
    """Minimal host prep for the legacy v6 device-prep path.

    Runs only the serial header scan (chunk-parallel over the trailing
    offset table when present) + payload bucketing. Returns
    (p32, offs, bits, refs, pw, rows). Any legacy geometry is accepted
    (padded_width is a multiple of 32 by construction,
    RawData_Legacy.cpp:34-36); ragged widths (pw % 128 != 0) get dummy
    kernel lanes from _v6_legacy_build."""
    from . import numpy_ref as R
    from . import unpack as UU
    from . import native as _native

    payload = np.asarray(payload, dtype=np.uint8)
    pw = R.legacy_padded_width(width)
    num_blocks = height * (pw // 32) * 2

    # Table-backed chunk-parallel scan, speculative parallel scan for
    # table-less clips, serial fallback (same ladder as prepare_legacy).
    scanned = None
    if num_blocks >= UU.LEGACY_PARALLEL_MIN_BLOCKS:
        chunks = R.legacy_chunk_offsets(payload)
        if chunks:
            scanned = _native.legacy_scan_parallel(
                payload, num_blocks, chunks
            )
        if scanned is None:
            scanned = _native.legacy_scan_speculative(payload, num_blocks)
    bits, refs, offs = scanned or _native.legacy_scan(payload, num_blocks)

    # Static content span for the kernel scratch (offsets are monotone, so
    # each chunk's end is its last block's offset + <= 32 payload bytes).
    # Chunk c covers kernel rows [c*b, min((c+1)*b, h*segs)); kernel row k
    # = image row k//segs, segment k%segs, whose real blocks are pairs
    # y*ppr + [4s, min(4s+3, ppr-1)] — for pw % 128 == 0 this reduces to
    # consecutive blocks [8k, 8k+8), for ragged widths it skips the dummy
    # lanes (which consume no payload bytes).
    idx = _legacy_indices(pw, height)
    nc = idx["num_chunks"]
    segs = idx["segs"]
    ppr = pw // 32
    b = ROWS_PER_CHUNK_LEG
    k0 = np.arange(nc, dtype=np.int64) * b
    k1 = np.minimum(k0 + b, height * segs) - 1
    firsts = offs[(k0 // segs * ppr + k0 % segs * 4) * 2]
    last_pair = k1 // segs * ppr + np.minimum(k1 % segs * 4 + 3, ppr - 1)
    need = (
        (offs[last_pair * 2 + 1] + 32 - (firsts >> 9 << 9)) + 511
    ) // 512 + 2
    rows_need = int(need.max()) if nc else 2
    rows_worst = (b * 8 * 34) // 512 + 2
    rows_worst += (-rows_worst) % 8
    rows = min(
        rows_worst, int(rows_need + (-rows_need) % LEGACY_ROWS_STEP)
    )

    n = len(payload)
    bucket = LEGACY_PAYLOAD_BUCKET_ROWS * 512
    span = (rows + 8) * 512
    total = n + span
    total += (-total) % bucket
    p32 = UU.pad_or_window(payload, total, window).view("<i4")
    return p32, offs.astype(np.int32), bits, refs, pw, rows


# Host-prep cache: kernel-row block indices depend only on geometry.
_LEG_IDX_CACHE: dict = {}


def _legacy_indices(pw: int, h: int) -> dict:
    key = (pw, h, ROWS_PER_CHUNK_LEG)
    c = _LEG_IDX_CACHE.get(key)
    if c is not None:
        return c
    ppr = pw // 32
    segs = -(-pw // 128)
    rows_total = h * segs
    b = ROWS_PER_CHUNK_LEG
    num_chunks = max(1, -(-rows_total // b))
    rows_pad = num_chunks * b
    nblk = h * ppr * 2

    # (rows_pad, 8) block indices in kernel-row order. OFFSET indices for
    # dummies reuse the row's first block (in-span DMA windows); META
    # (cls/refs) indices route dummies AND padding rows to a zeroed
    # sentinel appended past the block arrays.
    y = np.arange(rows_total) // segs
    s = np.arange(rows_total) % segs
    g = np.arange(4)[None, :]
    pairs = y[:, None] * ppr + s[:, None] * 4 + g  # (rows_total, 4)
    real = (s[:, None] * 4 + g) < ppr
    pairs_off = np.where(real, pairs, y[:, None] * ppr)
    blk_off = np.stack(
        [2 * pairs_off, 2 * pairs_off + 1], axis=2
    ).reshape(-1, 8)
    blk_meta = np.stack([2 * pairs, 2 * pairs + 1], axis=2).reshape(-1, 8)
    blk_meta = np.where(np.repeat(real, 2, axis=1).reshape(-1, 8), blk_meta, nblk)

    def pad(a, fill):
        out = np.empty((rows_pad, 8), dtype=np.intp)
        out[:rows_total] = a
        out[rows_total:] = fill
        return out.reshape(-1)

    c = {
        "segs": segs,
        "num_chunks": num_chunks,
        "nblk": nblk,
        "blk_off": pad(blk_off, blk_off[-1] if rows_total else 0),
        "blk_meta": pad(blk_meta, nblk),
        "chunk_first": (np.arange(num_chunks, dtype=np.intp) * b * 8),
    }
    _LEG_IDX_CACHE[key] = c
    return c


# Payload bytes per block by CLASS INDEX (LEGACY_CLASSES row), for the
# content-span computation (sentinel/dummy entries are class 0 = 0 bytes).
_LEN_BY_CLASS_IDX = np.array(
    [T.LEGACY_BLOCK_LENGTH[c] for c in T.LEGACY_CLASSES], dtype=np.int64
)

LEGACY_ROWS_STEP = 64  # content-span bucket (bounds recompiles)


def prepare_chunked_legacy_v5(plan: U.LegacyPlan):
    """Segment layout for the v5 legacy kernel.

    Returns (payload2d, base_rows, meta, num_chunks, segs, rows). Kernel row
    (y, s) covers image pixels [s*128, s*128+128) of row y via blocks
    (y*ppr + s*4 + g)*2 + c; segments beyond ppr get zero-class dummies
    (columns cropped after the reshape).
    """
    pw, h = plan.padded_width, plan.height
    idx = _legacy_indices(pw, h)
    segs, num_chunks, nblk = idx["segs"], idx["num_chunks"], idx["nblk"]
    b = ROWS_PER_CHUNK_LEG

    # Block arrays + zeroed sentinel entry for dummy/padding lanes.
    offs = np.empty(nblk + 1, dtype=np.int32)
    offs[:nblk] = plan.offsets
    offs[nblk] = offs[nblk - 1] if nblk else 0
    cls = np.zeros(nblk + 1, dtype=np.int32)
    cls[:nblk] = plan.cls
    refs = np.zeros(nblk + 1, dtype=np.int32)
    refs[:nblk] = plan.refs

    m_off = offs.take(idx["blk_off"]).reshape(num_chunks, b, 8)
    m_cls = cls.take(idx["blk_meta"]).reshape(num_chunks, b, 8)
    m_ref = refs.take(idx["blk_meta"]).reshape(num_chunks, b, 8)

    base_rows = (offs.take(idx["blk_off"][idx["chunk_first"]]) // 512).astype(
        np.int32
    )

    # Sublane-major meta, offsets CHUNK-RELATIVE (< 2^18): feeds the
    # kernel's one-hot lane-expansion dot directly (no host transposes,
    # and frame stacking needs no offset rebase — relative offsets are
    # shift-invariant).
    meta = np.empty((num_chunks, b, 24), dtype=np.int32)
    meta[:, :, 0:8] = m_off - (base_rows.astype(np.int64)[:, None, None] * 512)
    meta[:, :, 8:16] = m_cls
    meta[:, :, 16:24] = m_ref

    # Content-aware chunk span: the picks fetch rows q, q+1 of each chunk's
    # window, so rows must cover the chunk's last block end + one row.
    ends = m_off.astype(np.int64) + _LEN_BY_CLASS_IDX[m_cls]
    cend = ends.reshape(num_chunks, -1).max(axis=1)
    need = ((cend - base_rows.astype(np.int64) * 512 + 511) >> 9) + 2
    rows_need = int(need.max()) if num_chunks else 2
    rows_worst = (b * 8 * 34) // 512 + 2
    rows_worst += (-rows_worst) % 8
    rows_c = min(
        rows_worst, int(rows_need + (-rows_need) % LEGACY_ROWS_STEP)
    )

    rows_span = (b * 8 * 34) // 512 + 2
    rows_span += (-rows_span) % 8
    pay = plan.payload
    rows_needed = int(base_rows[-1]) + rows_span
    total = max(rows_needed * 512, len(pay))
    total += (-total) % 512
    if len(pay) >= total:
        padded = pay[: len(pay) - (len(pay) % 512)]  # zero-copy view
    else:
        padded = np.zeros(total, dtype=np.uint8)
        padded[: len(pay)] = pay
    payload2d = np.ascontiguousarray(padded).view("<i4").reshape(-1, 128)
    return payload2d, base_rows, meta, num_chunks, segs, rows_c


def decode_legacy_pallas_v5(
    payload: np.ndarray, width: int, height: int,
    plane_mode: str = "packed", interpret: bool = False, **kw,
):
    """Full legacy decode with fused interleave (no epilogue).

    Extra keyword arguments forward to :func:`_unpack_legacy_pallas_v5`
    (variant flags — tools/hw_parity.py sweeps the shipping set on
    hardware each round, VERDICT r3 #8)."""
    plan = U.prepare_legacy(payload, width, height)
    payload2d, base_rows, meta, num_chunks, segs, rows = (
        prepare_chunked_legacy_v5(plan)
    )
    out = _unpack_legacy_pallas_v5(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        rows=rows,
        plane_mode=plane_mode,
        interpret=interpret,
        **kw,
    )
    img = out[: plan.height * segs].reshape(plan.height, segs * 128)
    return img[:, : plan.width]


def stack_chunked_legacy_v5(plans: list) -> tuple:
    """Concatenate same-geometry frames into one v5 legacy launch."""
    chunked = [prepare_chunked_legacy_v5(p) for p in plans]
    nc, segs = chunked[0][3], chunked[0][4]
    if any(c[3:5] != (nc, segs) for c in chunked):
        raise ValueError("frames in a batch must share geometry")
    rows = max(c[5] for c in chunked)
    row_starts, total = [], 0
    for p2d, *_ in chunked:
        row_starts.append(total)
        total += p2d.shape[0]
    payload2d = np.concatenate([c[0] for c in chunked], axis=0)
    base_rows = np.concatenate(
        [c[1] + rs for c, rs in zip(chunked, row_starts)]
    ).astype(np.int32)
    # meta offsets are chunk-relative: no per-frame rebase needed.
    meta = np.concatenate([c[2] for c in chunked], axis=0)
    return payload2d, base_rows, meta, nc * len(plans), segs, rows


def decode_legacy_pallas_batch_v5(plans: list, interpret: bool = False):
    """(F, H, W) uint16 from same-geometry LegacyPlans in ONE launch."""
    payload2d, base_rows, meta, num_chunks, segs, rows = (
        stack_chunked_legacy_v5(plans)
    )
    p = plans[0]
    out = _unpack_legacy_pallas_v5(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        rows=rows,
        interpret=interpret,
    )
    rows_frame = out.shape[0] // len(plans)
    out = out.reshape(len(plans), rows_frame, 128)[:, : p.height * segs]
    img = out.reshape(len(plans), p.height, segs * 128)
    return img[:, :, : p.width]


def prepare_device_legacy_v5(plan: U.LegacyPlan):
    """Device-array tuple for callers that jit around the kernel."""
    payload2d, base_rows, meta, num_chunks, segs, rows = (
        prepare_chunked_legacy_v5(plan)
    )
    return (
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks,
        segs,
        rows,
    )


def prepare_chunked_legacy(plan: U.LegacyPlan):
    n = len(plan.offsets)
    b = BLOCKS_PER_CHUNK
    num_chunks = max(1, -(-n // b))
    pad_n = num_chunks * b

    offs = np.zeros(pad_n, dtype=np.int32)
    offs[:n] = plan.offsets
    offs[n:] = offs[n - 1] if n else 0
    cls = np.zeros(pad_n, dtype=np.int32)
    cls[:n] = plan.cls
    refs = np.zeros(pad_n, dtype=np.int32)
    refs[:n] = plan.refs

    base_rows = (offs.reshape(num_chunks, b)[:, 0] // 512).astype(np.int32)

    meta = np.zeros((num_chunks, 8, b), dtype=np.int32)
    meta[:, 0] = offs.reshape(num_chunks, b)
    meta[:, 1] = cls.reshape(num_chunks, b)
    meta[:, 2] = refs.reshape(num_chunks, b)

    pay = plan.payload
    rows_needed = int(base_rows[-1]) + _span_rows(b)
    total = max(rows_needed * 512, len(pay))
    total += (-total) % 512
    padded = np.zeros(total, dtype=np.uint8)
    padded[: len(pay)] = pay
    payload2d = padded.view("<i4").reshape(-1, 128)

    return payload2d, base_rows, meta, num_chunks, n


@functools.partial(jax.jit, static_argnames=("height", "padded_width"))
def _interleave_packed(vals: jnp.ndarray, height: int, padded_width: int):
    """Even/odd block interleave via int32 pack + bitcast (transpose-free)."""
    pairs = padded_width // 32
    v = vals.astype(jnp.int32).reshape(height, pairs, 2, 16)
    packed = v[:, :, 0, :] | (v[:, :, 1, :] << 16)  # (H, pairs, 16)
    u16 = jax.lax.bitcast_convert_type(packed, jnp.uint16)  # (H, pairs, 16, 2)
    return u16.reshape(height, padded_width)


def decode_legacy_pallas(
    payload: np.ndarray, width: int, height: int, interpret: bool = False
):
    plan = U.prepare_legacy(payload, width, height)
    payload2d, base_rows, meta, num_chunks, n = prepare_chunked_legacy(plan)
    vals = _unpack_legacy_pallas(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        interpret=interpret,
    )[:n]
    img = _interleave_packed(vals, plan.height, plan.padded_width)
    return img[:, : plan.width]
