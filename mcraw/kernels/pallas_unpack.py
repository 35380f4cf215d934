"""Fused Pallas TPU kernel for the modern-codec block unpack.

This is the framework's hot kernel (SURVEY.md §2 C3): packed variable-length
blocks in HBM -> per-block uint16 values, at HBM bandwidth.

Why not XLA: forming per-block 128-byte windows is a gather, and XLA's TPU
gather runs ~1.7 GB/s (measured). The kernel replaces it with a two-stage
in-VMEM realignment that maps onto the hardware:

  1. one sequential DMA per chunk of 256 blocks (blocks are contiguous in the
     payload; a chunk spans <= 32 KB),
  2. coarse row fetch: a one-hot fp32 matmul on the MXU picks each block's
     two 512-byte rows out of the chunk (exact: operands are 16-bit halves,
     one nonzero per one-hot row),
  3. fine alignment: per-lane dynamic shuffles (tpu.dynamic_gather via
     take_along_axis along lanes, a single-vreg shuffle) rotate each block's
     window into place and spread words into a byte matrix,
  4. the shared structured per-class unpack + one-hot class select (pure
     VPU), + 12-bit reference add.

Block offsets are always 8-byte aligned (all modern block lengths are
multiples of 8, RawData.cpp:27-45), so rotations are word-granular and the
byte spread folds into the same shuffle.
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

BLOCKS_PER_CHUNK = 512  # one chunk = one DMA + one MXU/VPU pass
_MAX_WORDS_PER_BLOCK = 32  # 128 bytes


def _packed_field_tables() -> np.ndarray:
    """(2, n_classes, 128) int32: per class, packed field descriptors.

    Every modern output value is an OR of <= 3 byte fields (tables.py).
    Lane layout: array 0 lanes 0..63 = field 0 of outputs 0..63, lanes
    64..127 = field 1; array 1 lanes 0..63 = field 2 (rest zero).
    Packing: pos(7b) | rshift<<7(3b) | mask_bits<<10(5b) | lshift<<15(4b),
    where mask = (1 << mask_bits) - 1. One packed int per (class, lane)
    keeps the in-kernel class select to 2x10 lane-row selects.
    """
    ncls = len(T.MODERN_CLASSES)
    out = np.zeros((2, ncls, 128), dtype=np.int32)
    mask_bits = np.zeros_like(T.MODERN_MSK)
    nz = T.MODERN_MSK > 0
    mask_bits[nz] = np.log2(T.MODERN_MSK[nz] + 1).astype(np.int32)
    assert np.all((1 << mask_bits) - 1 == T.MODERN_MSK)
    packed = (
        T.MODERN_POS
        | (T.MODERN_RSH << 7)
        | (mask_bits << 10)
        | (T.MODERN_LSH << 15)
    )  # (ncls, 64, 3)
    out[0, :, 0:64] = packed[:, :, 0]
    out[0, :, 64:128] = packed[:, :, 1]
    out[1, :, 0:64] = packed[:, :, 2]
    return out


_MODERN_TABLES = _packed_field_tables()


def _span_rows(blocks_per_chunk: int) -> int:
    """Worst-case 512B scratch rows a chunk's payload span can cover."""
    rows = (blocks_per_chunk * _MAX_WORDS_PER_BLOCK) // 128 + 2
    return rows + (-rows) % 8


# Kernel-safe structured unpack: Mosaic cannot lower >2D reshapes, so these
# variants use only 2D lane slices + concatenates. Semantics are pinned to
# structured.py (and thus to the tables / C++ reference) by tests.


def _k_m1(w):
    return jnp.concatenate([(w[:, :8] >> m) & 1 for m in range(8)], axis=1)


def _k_m2(w):
    return jnp.concatenate(
        [(w[:, 8 * h : 8 * h + 8] >> (2 * m)) & 3 for h in range(2) for m in range(4)],
        axis=1,
    )


def _k_m4(w):
    return jnp.concatenate(
        [(w[:, 8 * c : 8 * c + 8] >> (4 * m)) & 15 for c in range(4) for m in range(2)],
        axis=1,
    )


def _k_m8(w):
    return w[:, :64]


def _k_m10(w):
    parts = [
        w[:, 8 * k : 8 * k + 8] | (((w[:, 32:40] >> (2 * k)) & 3) << 8)
        for k in range(4)
    ]
    parts += [
        w[:, 40 + 8 * k : 48 + 8 * k] | (((w[:, 72:80] >> (2 * k)) & 3) << 8)
        for k in range(4)
    ]
    return jnp.concatenate(parts, axis=1)


def _unpack_select_2d(
    bytes_: jnp.ndarray, half16: jnp.ndarray, cls_col: jnp.ndarray
) -> jnp.ndarray:
    """unpack_select with a (B, 1) class column (kernel-friendly select)."""
    from . import structured as S

    fns = {
        1: _k_m1,
        2: _k_m2,
        3: S.MODERN_STRUCTURED[3],  # already 2D-only
        4: _k_m4,
        5: S.MODERN_STRUCTURED[5],
        6: S.MODERN_STRUCTURED[6],
        8: _k_m8,
        10: _k_m10,
    }
    out = None
    for row, c in enumerate(T.MODERN_CLASSES):
        if c == 0:
            continue
        vals = half16 if c == 16 else fns[c](bytes_)
        contrib = jnp.where(cls_col == row, vals, 0)
        out = contrib if out is None else out | contrib
    return out


SUBGROUPS = 4  # statically unrolled sub-groups per grid step


def _unpack_kernel_v4(
    base_ref,  # scalar prefetch: (num_chunks * SUBGROUPS,) int32 subgroup rows
    meta_ref,  # (1, 8, B) int32
    tables_ref,  # (2*ncls, 128) int32
    payload_ref,  # HBM (P32/128, 128) int32
    out_ref,  # (B, 64) uint16
    scratch_ref,  # VMEM (2, rows, 128) int32
    sems,
    rows: int = None,  # rows DMA'd per chunk
    sub_rows: int = None,  # rows visible to one sub-group's matmul
):
    """v4: per-grid-step overhead amortized over SUBGROUPS sub-groups.

    The span DMA covers the whole chunk; each sub-group's one-hot row fetch
    only spans its local `sub_rows` window (dynamic row slice of scratch), so
    MXU work stays linear in blocks instead of quadratic in chunk size."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def span_dma(chunk, dst_slot):
        return pltpu.make_async_copy(
            payload_ref.at[pl.ds(base_ref[chunk * SUBGROUPS], rows), :],
            scratch_ref.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(i == 0)
    def _():
        span_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        span_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    b = meta_ref.shape[2]
    sg = b // SUBGROUPS
    chunk_row0 = base_ref[i * SUBGROUPS]
    meta = meta_ref[0]
    ncls = len(T.MODERN_CLASSES)

    span_dma(i, slot).wait()

    sub_vals = []
    for j in range(SUBGROUPS):
        sub_row0 = base_ref[i * SUBGROUPS + j]
        local = scratch_ref[slot, pl.ds(sub_row0 - chunk_row0, sub_rows), :]
        offs_col = jnp.transpose(meta[0:1, j * sg : (j + 1) * sg], (1, 0))
        cls_col = jnp.transpose(meta[1:2, j * sg : (j + 1) * sg], (1, 0))
        refs_col = jnp.transpose(meta[2:3, j * sg : (j + 1) * sg], (1, 0))
        rel = offs_col - sub_row0 * 128
        q = rel >> 7

        cls_ids = jax.lax.broadcasted_iota(jnp.int32, (sg, ncls), 1)
        oh_cls = (cls_ids == cls_col).astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        t0f = jnp.dot(
            oh_cls, tables_ref[0:ncls, :].astype(jnp.float32),
            precision=hi, preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        t1f = jnp.dot(
            oh_cls, tables_ref[ncls : 2 * ncls, :].astype(jnp.float32),
            precision=hi, preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

        planes = jnp.concatenate(
            [
                (jax.lax.shift_right_logical(local, 8 * k) & 0xFF).astype(
                    jnp.bfloat16
                )
                for k in range(4)
            ],
            axis=1,
        )  # (sub_rows, 512)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (sg, sub_rows), 1)

        def pick(oh):
            p = jnp.dot(oh, planes, preferred_element_type=jnp.float32).astype(
                jnp.int32
            )
            return (
                p[:, 0:128]
                | (p[:, 128:256] << 8)
                | (p[:, 256:384] << 16)
                | (p[:, 384:512] << 24)
            )

        row0 = pick((row_ids == q).astype(jnp.bfloat16))
        row1 = pick((row_ids == q + 1).astype(jnp.bfloat16))

        def fields(desc):
            pos = desc & 127
            rsh = (desc >> 7) & 7
            mask = (1 << ((desc >> 10) & 31)) - 1
            lsh = (desc >> 15) & 15
            widx = rel + (pos >> 2) - (q << 7)
            in0 = widx < 128
            w0 = jnp.take_along_axis(row0, jnp.where(in0, widx, 0), axis=1)
            w1 = jnp.take_along_axis(row1, jnp.where(in0, 0, widx - 128), axis=1)
            word = jnp.where(in0, w0, w1)
            byt = jax.lax.shift_right_logical(word, 8 * (pos & 3)) & 0xFF
            return ((byt >> rsh) & mask) << lsh

        fa = fields(t0f)
        fb = fields(t1f)
        vals = fa[:, 0:64] | fa[:, 64:128] | fb[:, 0:64]
        sub_vals.append(((vals + refs_col) & 0xFFFF).astype(jnp.uint16))

    out_ref[:] = jnp.concatenate(sub_vals, axis=0)


@functools.partial(jax.jit, static_argnames=("num_chunks", "interpret"))
def _unpack_blocks_pallas_v4(
    payload2d: jnp.ndarray,
    base_rows: jnp.ndarray,  # (num_chunks * SUBGROUPS,) subgroup base rows
    meta: jnp.ndarray,  # (num_chunks, 8, B)
    *,
    num_chunks: int,
    interpret: bool = False,
):
    b = meta.shape[2]
    sg = b // SUBGROUPS
    sub_rows = _span_rows(sg)
    rows = (b * _MAX_WORDS_PER_BLOCK) // 128 + 2
    rows += (-rows) % 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, b), lambda i, base: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, 64), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tables = jnp.asarray(_MODERN_TABLES.reshape(-1, 128))
    return pl.pallas_call(
        functools.partial(_unpack_kernel_v4, rows=rows, sub_rows=sub_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * b, 64), jnp.uint16),
        interpret=interpret,
    )(base_rows, meta, tables, payload2d)


def prepare_chunked_v4(plan: U.ModernPlan, blocks_per_chunk: int = 2048):
    """Chunk layout for the v4 kernel: per-SUBGROUP base rows."""
    n = len(plan.offsets)
    b = blocks_per_chunk
    num_chunks = max(1, -(-n // b))
    pad_n = num_chunks * b

    offs_w = np.zeros(pad_n, dtype=np.int32)
    offs_w[:n] = plan.offsets // 4
    offs_w[n:] = offs_w[n - 1] if n else 0
    cls = np.zeros(pad_n, dtype=np.int32)
    cls[:n] = plan.cls
    refs = np.zeros(pad_n, dtype=np.int32)
    refs[:n] = plan.refs

    sg = b // SUBGROUPS
    base_rows = (
        offs_w.reshape(num_chunks * SUBGROUPS, sg)[:, 0] // 128
    ).astype(np.int32)

    meta = np.zeros((num_chunks, 8, b), dtype=np.int32)
    meta[:, 0] = offs_w.reshape(num_chunks, b)
    meta[:, 1] = cls.reshape(num_chunks, b)
    meta[:, 2] = refs.reshape(num_chunks, b)

    rows_per_chunk = (b * _MAX_WORDS_PER_BLOCK) // 128 + 2
    rows_per_chunk += (-rows_per_chunk) % 8
    pay = plan.payload
    rows_needed = int(base_rows[-SUBGROUPS]) + rows_per_chunk
    total = max(rows_needed * 512, len(pay))
    total += (-total) % 512
    if len(pay) >= total:
        padded = pay[: len(pay) - (len(pay) % 512)]
    else:
        padded = np.zeros(total, dtype=np.uint8)
        padded[: len(pay)] = pay
    payload2d = np.ascontiguousarray(padded).view("<i4").reshape(-1, 128)
    return payload2d, base_rows, meta, num_chunks, n


# -----------------------------------------------------------------------------
# v5: fused Bayer de-interleave — the kernel writes image rows directly.
#
# Key idea: the Bayer phase interleave (RawData.cpp:581-593) pairs block
# 2p (even output columns) with block 2p+1 (odd columns); value j = h*32+k of
# pair (tile, q) lands at image[4*ty + 2h + q, 64*tx + 2k + c]. So:
#   - each kernel row processes one block PAIR with 128 lanes laid out as
#     lane l = h*64 + 2k + c  ->  value h*32+k of block parity c. Lanes
#     [0:64] are then 64 finished image pixels of row 4ty+q, lanes [64:128]
#     of row 4ty+q+2 — the interleave costs nothing, it's the lane layout
#     of the descriptor tables;
#   - the host emits pair rows in (tile_row, q, tx) order, so each output
#     image row is a CONTIGUOUS band of tiles_x kernel rows: the epilogue is
#     a static sublane slice + store, no transpose, no XLA pass;
#   - output is (rows, txp, 64) whose reshape to (rows, encodedWidth) is a
#     free minor-dim collapse.
# MXU row-fetch work also halves vs v4: one 2-row one-hot fetch now serves
# 256 payload bytes (a pair) instead of 128 (a block).
# -----------------------------------------------------------------------------

SUBGROUPS_V5 = 24  # swept on v5e (funnel kernel): 24 beats 8/16/32 (846-855 fps)
TARGET_SG_V5 = 128  # blocks per subgroup: tr_sub=1 wins at 4K AND 1080p
# (1080p sweep: sub24_tr1 1723 fps vs sub24_tr2 1478); only narrow frames
# (< ~22 tiles across) pack multiple tile-rows per subgroup.


def _packed_field_tables_v5() -> np.ndarray:
    """(2*ncls, 384) int32 packed WORD-field descriptors in v5 lane layout.

    Array rows [0:ncls] describe even-parity lanes (c=0), rows [ncls:2*ncls]
    odd-parity lanes; lane f*128 + l holds field f of value j(l) = 32*(l>>6)
    + ((l&63)>>1) when (l&1) == parity.

    Funnel encoding: field = ((word << lsh1) >>> rsh2) << lsh with
    lsh1 = 32-rsh32-nb (clears bits above the field), rsh2 = 32-nb (drops
    the field to [0, nb), clearing bits below), then << lsh places it — no
    mask build. Every field slot 0 has lsh == 0 (the low part comes first
    in tables.py), so the kernel skips the third shift for slot 0. Packing:
    widx(5b) | lsh1<<5(5b) | rsh2<<10(5b) | lsh<<15(4b) < 2^19 (one-hot
    matmul fp32-exact). Empty field slots duplicate slot 0 (OR-idempotent);
    class 0 has no fields at all — its rows stay 0 (descriptors that pass
    `word` through) and the kernel zeroes class-0 lanes.
    """
    ncls = len(T.MODERN_CLASSES)
    widx, rsh, nb, lsh = (
        T.MODERN_WIDX,
        T.MODERN_WRSH,
        T.MODERN_WNB,
        T.MODERN_WLSH,
    )
    assert not lsh[:, :, 0].any(), "slot-0 fields must have lsh == 0"
    lsh1 = np.where(nb > 0, 32 - rsh - nb, 0)
    rsh2 = np.where(nb > 0, 32 - nb, 0)
    assert lsh1.min() >= 0 and lsh1.max() < 32
    assert lsh.max() < 16
    packed = (widx | (lsh1 << 5) | (rsh2 << 10) | (lsh << 15)).astype(
        np.int32
    )
    assert packed.max() < (1 << 19)
    for ci in range(ncls):
        for j in range(T.MODERN_BLOCK):
            for f in range(1, 3):
                if nb[ci, j, f] == 0:
                    packed[ci, j, f] = packed[ci, j, 0]
    out = np.zeros((2, ncls, 3 * 128), dtype=np.int32)
    for l in range(128):
        h, m = l >> 6, l & 63
        j, c = 32 * h + (m >> 1), m & 1
        for f in range(3):
            out[c, :, f * 128 + l] = packed[:, j, f]
    return out.reshape(2 * ncls, 3 * 128)


_MODERN_TABLES_V5 = _packed_field_tables_v5()

# Byte-plane stack of the v5 descriptor table for the DEFAULT-precision
# desc dot (desc_mode="bytedot"): rows [0:2n] = low bytes, [2n:4n] = mid,
# [4n:6n] = high (descriptors < 2^19, so 3 bytes suffice). The kernel's
# one-hot operand carries {1,256,65536} instead of {1}: each product is a
# byte exponent-shifted by 2^(8k) (bf16-exact), the per-lane sum rebuilds
# the descriptor < 2^19 — exact under ONE DEFAULT bf16 MXU pass where the
# f32 HIGHEST form costs 6 (the same structure as the legacy kernels'
# bytedot meta expansion, pallas_legacy.py).
_MODERN_TABLES_V5_BYTES = np.concatenate(
    [
        _MODERN_TABLES_V5 & 0xFF,
        (_MODERN_TABLES_V5 >> 8) & 0xFF,
        _MODERN_TABLES_V5 >> 16,
    ],
    axis=0,
).astype(np.int32)

# Word-level field passes needed per MODERN_CLASSES index: only classes 5
# and 6 need all 3 funnel passes; classes 3 and 10 need 2; the rest 1
# (class 0 has none — its lanes are zeroed regardless). The kernel's field
# loop is static on the max over classes PRESENT in a frame, so typical
# content (blocks at 8-16 bits -> classes 8/10/16) runs 2 passes and
# incompressible 16-bit content just 1.
_NF_OF_CLASS = (
    (np.asarray(T.MODERN_WNB) > 0).sum(axis=2).max(axis=1).astype(np.int32)
)
_NF_OF_BITS = _NF_OF_CLASS.take(np.asarray(T.MODERN_CLASS_INDEX))

# Sentinel nfields value: "every block in the frame is class 16" (bits
# 11..16, 128-byte raw-copy blocks, RawData.cpp:377-408 Decode16). Chosen
# negative so every existing max()-over-frames aggregation composes: a batch
# is uniform iff ALL its frames are (max(-1, -1) == -1; any mixed frame's
# 1..3 wins and the batch falls back to the general kernel). The kernel
# wrapper translates it into the uniform16 fast path when the caller also
# supplies tx, else clamps to the (correct) 1-field general path.
UNIFORM16 = -1
_CLS16_INDEX = int(np.asarray(T.MODERN_CLASS_INDEX)[16])


def v5_required_fields(bits: np.ndarray) -> int:
    """Static field-pass count for a frame from its raw bits stream
    (values clipped at 16 like the codec dispatch, RawData.cpp:424-458).
    Returns UNIFORM16 when every block is class 16 (uniform fast path)."""
    if len(bits) == 0:
        return 1
    b = np.minimum(np.asarray(bits), 16)
    if int(b.min()) >= 11:
        return UNIFORM16
    return max(1, int(_NF_OF_BITS.take(b).max()))


def v5_required_fields_cls(cls: np.ndarray) -> int:
    """Same as v5_required_fields but from MODERN_CLASSES indices
    (ModernPlan.cls)."""
    if len(cls) == 0:
        return 1
    c = np.asarray(cls)
    if (c == _CLS16_INDEX).all():
        return UNIFORM16
    return max(1, int(_NF_OF_CLASS.take(c).max()))


def v5_required_fields_mask(mask: int) -> int:
    """v5_required_fields from a clamped-bits presence mask (bit b set <=>
    some block encodes at b bits), as produced by the native
    length_segments2 walk — no pass over the bits stream needed."""
    if mask != 0 and (mask & 0x7FF) == 0:
        return UNIFORM16
    nf = 1
    for b in range(17):
        if mask & (1 << b):
            nf = max(nf, int(_NF_OF_BITS[b]))
    return nf


def _unpack_kernel_v5(
    base_ref,  # scalar prefetch: (num_chunks * SUBGROUPS_V5,) int32 subgroup rows
    meta_ref,  # (1, 8, BP) int32 pair metadata (kernel-row order)
    tables_ref,  # (2*ncls, 384) int32 v5 descriptors
    payload_ref,  # HBM (P32/128, 128) int32
    out_ref,  # (rows_chunk, txp, 64) uint16 — image rows
    scratch_ref,  # VMEM (2, rows, 128) int32
    planes_ref,  # VMEM (rows + 8, 256) f32 — per-chunk 16-bit half planes
    sems,
    rows: int = None,
    sub_rows: int = None,
    txp: int = None,
    tr_sub: int = None,
    tx: int = None,  # real tile columns (uniform16 row addressing only)
    uniform16: bool = False,  # all blocks class 16: static-slice fast path
    nfields: int = 3,  # static word-field passes (max over classes PRESENT)
    flat_out: bool = True,  # 2D out block: 2 full-sublane stores per subgroup
    chunk_mt: bool = False,  # one chunk-wide meta transpose vs 24 per-subgroup
    chunk_desc: bool = False,  # one chunk-wide desc matmul vs 24 per-subgroup
    wide_store: int = 0,  # 128-lane out block: (2*txp,64)->(txp,128) reshape
    # per store so every vreg row is fully used (flat_out's 64-lane stores
    # write half-masked vregs); 1 = two (txp,128) stores per tile-row,
    # 2 = one concatenated (2*txp,128) store. Row-major-identical layout.
    plane_mode: str = "bytes",  # pick-operand layout: "bytes" = bf16
    # byte planes (512 wide, DEFAULT 1-pass dot — bf16 exact for <= 255;
    # ~3x fewer MXU tile-passes, +2 converts +2 shift/or per pick-merge),
    # "packed" = byte planes with BOTH pair rows fetched in ONE dot (the
    # one-hot carries {1, 256}: c = p0 + (p1 << 8) <= 65535 stays exact,
    # the pair-row select becomes a variable right-shift), "halves" = f32
    # 16-bit half planes (256 wide, HIGHEST 6-pass dot), "s8" = int8 byte
    # planes biased -128 (s8 x s8 -> s32 dots at 2x the bf16 MXU rate,
    # 32-aligned windows; MEASURED r3 and REJECTED: 0.876 vs bytes 0.669
    # ms net 4K — the int8 plane-build converts + (32,128)-tile relayouts
    # eat the rate win; ablate_sharp_null_s8_full_fields0.json).
    # Same VMEM bytes either way. The v5.1 byte-plane rejection predated
    # chunk-wide planes (per-subgroup build cost dominated); re-measured
    # sharp with chunk-wide planes, bytes wins 0.652 vs 0.720 ms net
    # (ablate_sharp_null_full_bytes_mergedout_nopick.json) and is the
    # default.
    chunk_oh: bool = False,  # build the two pick one-hots chunk-wide
    # ((BP, sub_rows+8) once, bf16/f32 per plane_mode) instead of inside
    # each subgroup iteration — only the dots stay in the per-subgroup
    # chain. Valid because q8 is window-relative per PAIR ROW (prep folds
    # each subgroup's off-off8 remainder into its rows' q8), so the
    # one-hot depends only on the meta row, not the subgroup. A/B flag:
    # the r3 pick-split (noselect/nomerge) showed the 0.42 ms pick
    # complex is all dots + one-hot builds. MEASURED r3 and REJECTED:
    # 0.731 vs 0.660 ms net 4K (ablate_sharp_null_chunkoh_full_fields0
    # .json) — same total one-hot elements, but the chunk-wide (BP, 56)
    # builds + per-subgroup sublane slices lose to in-loop iota compares.
    desc_mode: str = "dot3",  # descriptor-dot structure: "dot3" = plain
    # one-hot x int32 table under f32 HIGHEST (6 bf16 passes; tables_ref
    # is _MODERN_TABLES_V5) — the DEFAULT; "bytedot" = {1,256,65536}-
    # weighted one-hot x byte-plane table, ONE DEFAULT bf16 pass
    # (tables_ref is _MODERN_TABLES_V5_BYTES). bytedot is a huge win on
    # the legacy kernels (chunk-wide meta outputs, pallas_legacy.py) but
    # LOSES here: the 6-block weighted one-hot build x24 subgroups costs
    # 0.20 ms where the desc dot itself is ~free (sharp A/B 4K net: full/
    # bytedot 0.867 vs descdot3 0.666 vs mergedout-no-desc-at-all 0.663,
    # ablate_sharp_null_full_descdot3_fields0_mergedout.json). chunk_desc
    # always uses the HIGHEST form.
    pick_stack: bool = False,  # stack the two pick one-hots along M so
    # each subgroup issues ONE pick dot instead of two (same MACs and
    # tile-passes, half the MXU dispatches) — probes whether the 0.42 ms
    # pick complex is dot ISSUE count rather than pass count.
    ablate: str = "",  # stage-skip flags for on-chip cost attribution ONLY
):
    if plane_mode not in ("halves", "bytes", "packed", "packed2", "s8"):
        raise ValueError(f"unknown plane_mode {plane_mode!r}")
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def span_dma(chunk, dst_slot):
        return pltpu.make_async_copy(
            payload_ref.at[pl.ds(base_ref[chunk * SUBGROUPS_V5], rows), :],
            scratch_ref.at[dst_slot],
            sems.at[dst_slot],
        )

    if "nodma" not in ablate:
        @pl.when(i == 0)
        def _():
            span_dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            span_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    bp = meta_ref.shape[2]
    sgp = bp // SUBGROUPS_V5
    chunk_row0 = base_ref[i * SUBGROUPS_V5]
    meta = meta_ref[0]
    ncls = len(T.MODERN_CLASSES)
    rows_per_sub = tr_sub * 4
    hi = jax.lax.Precision.HIGHEST

    if "nodma" not in ablate:
        span_dma(i, slot).wait()

    c_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) & 1

    if uniform16:
        # Uniform class-16 fast path (VERDICT r3 #1): every block is a
        # 128-byte raw copy (RawData.cpp:377-408 Decode16), so block b sits
        # at byte 16 + 128*b EXACTLY (offsets are the prefix sum of uniform
        # lengths) and the whole pick/desc/field machinery collapses into
        # static addressing:
        #   - pair (t, txi, q) occupies words [4 + 128*(t*tx + txi) + 64*q,
        #     +64): payload row g = t*tx + txi - chunk_base, which is
        #     CHUNK-LOCALLY STATIC — g0(t) = (j*tr_sub + t_local)*tx, since
        #     chunk_base == i*tr_chunk*tx for every chunk (and batch/stack
        #     shifts cancel). Each (j, t_local) band is one static row
        #     slice scratch[g0 : g0+txp]; q selects lane half [64q, 64q+64).
        #   - value lane l = h*64 + 2k' + c needs word m(l) = 32c + 16h +
        #     (k'>>1), half k'&1 — a CONSTANT lane permutation (iota
        #     arithmetic, no closure constants). q=0 lanes [4, 68) never
        #     cross a row; q=1 lanes [68, 132) wrap into the next row for
        #     m >= 60, handled by a second gather + constant select.
        # No byte planes, no one-hot dots, no funnel passes — per band:
        # two row loads, three constant lane-gathers, one half-select, one
        # ref add. Exact by construction (pure integer moves).
        li = jax.lax.broadcasted_iota(jnp.int32, (txp, 128), 1)
        kp = (li >> 1) & 31
        m_idx = 32 * (li & 1) + 16 * (li >> 6) + (kp >> 1)
        half_hi = (kp & 1) == 1
        idx0 = m_idx + 4
        idx1 = m_idx + 68
        wrap = idx1 >= 128
        idx1m = idx1 & 127
        for j in range(SUBGROUPS_V5):
            sl = slice(j * sgp, (j + 1) * sgp)
            mt = jnp.transpose(meta[:, sl], (1, 0))  # (sgp, 8): refs only
            bands = []
            for t_local in range(tr_sub):
                g0 = (j * tr_sub + t_local) * tx
                sb = scratch_ref[slot, pl.ds(g0, txp), :]
                sb1 = scratch_ref[slot, pl.ds(g0 + 1, txp), :]
                w0 = jnp.take_along_axis(sb, idx0, axis=1)
                wa = jnp.take_along_axis(sb, idx1m, axis=1)
                wb = jnp.take_along_axis(sb1, idx1m, axis=1)
                w1 = jnp.where(wrap, wb, wa)
                for q, wq in ((0, w0), (1, w1)):
                    band_lo = (t_local * 2 + q) * txp
                    refs_e = mt[band_lo : band_lo + txp, 4:5]
                    refs_o = mt[band_lo : band_lo + txp, 5:6]
                    refs_lane = jnp.where(c_lane == 1, refs_o, refs_e)
                    hw = jnp.where(
                        half_hi,
                        jax.lax.shift_right_logical(wq, 16),
                        wq & 0xFFFF,
                    )
                    bands.append(hw + refs_lane)
            u16 = jnp.concatenate(bands, axis=0).astype(jnp.uint16)
            for t_local in range(tr_sub):
                band = t_local * 2 * txp
                r0 = (j * rows_per_sub + t_local * 4) * txp
                out_ref[pl.ds(r0, 2 * txp)] = u16[band : band + 2 * txp, 0:64]
                out_ref[pl.ds(r0 + 2 * txp, 2 * txp)] = u16[
                    band : band + 2 * txp, 64:128
                ]
        return

    if "empty" in ablate:
        # (timing ablation: wrong results) Pure grid + block-pipeline cost:
        # no DMA, no subgroup loop, one tiny store per step so the program
        # is not elided. Separates launch/step overhead from the loop body.
        out_ref[0] = jnp.full(
            (out_ref.shape[1], out_ref.shape[2]), i, jnp.uint16
        ) if len(out_ref.shape) == 3 else jnp.full(
            (out_ref.shape[1],), i, jnp.uint16
        )
        return

    if "skeleton" in ablate:
        # (timing ablation: wrong results) True structural floor: the DMA
        # pipeline + per-subgroup scalar reads + output stores with ALL
        # vector compute removed — separates loop/DMA/store overhead from
        # the subgroup math that the other flags peel off one at a time.
        # Sub-flags: "nodma" removes the scratch dependency (measures the
        # store side alone), "tinyout" stores only one row per subgroup
        # (measures the DMA-in side alone).
        for j in range(SUBGROUPS_V5):
            sub_row0 = base_ref[i * SUBGROUPS_V5 + j]
            if "noscalar" in ablate:
                # No scalar->vector crossing at all: tests whether the
                # per-subgroup scalar broadcast latency IS the floor.
                v = jax.lax.broadcasted_iota(jnp.int32, (sgp, 128), 1) + j
            else:
                src = 1 if "nodma" in ablate else scratch_ref[slot, 0, 0]
                v = jnp.full((sgp, 128), 1, jnp.int32) * (src ^ sub_row0)
            if "smallout" in ablate:
                # out block is (8, 128) per chunk: same loop + DMA-in,
                # ~400x less VMEM->HBM out-copy traffic. The loop is
                # statically unrolled, so plain Python j == 0 works.
                if j == 0:
                    out_ref[...] = v[0:8].astype(jnp.uint16)
                continue
            if "tinyout" in ablate:
                if flat_out:
                    out_ref[pl.ds(j, 1)] = v[0:1, 0:64].astype(jnp.uint16)
                else:
                    out_ref[pl.ds(j, 1)] = v[0:1].astype(jnp.uint16)
            elif "rawout" in ablate:
                out_ref[pl.ds(j * sgp, sgp)] = v.astype(jnp.uint16)
            elif flat_out:
                rows_per_sub = tr_sub * 4
                vu = v.astype(jnp.uint16)
                for t_local in range(tr_sub):
                    band = t_local * 2 * txp
                    r0 = (j * rows_per_sub + t_local * 4) * txp
                    out_ref[pl.ds(r0, 2 * txp)] = vu[
                        band : band + 2 * txp, 0:64
                    ]
                    out_ref[pl.ds(r0 + 2 * txp, 2 * txp)] = vu[
                        band : band + 2 * txp, 64:128
                    ]
            else:
                rows_per_sub = tr_sub * 4
                for r in range(rows_per_sub):
                    t_local, h, qr = r >> 2, (r >> 1) & 1, r & 1
                    band = (t_local * 2 + qr) * txp
                    out_ref[j * rows_per_sub + r] = v[
                        band : band + txp, h * 64 : (h + 1) * 64
                    ].astype(jnp.uint16)
        return

    # Chunk-wide 16-bit half planes, built ONCE per chunk (subgroup scratch
    # windows overlap ~2x, so per-subgroup plane builds did ~2x redundant
    # convert work and 24x the instruction issue). The 8 tail rows past the
    # DMA span are zeroed once so the 8-aligned subgroup slices below never
    # contract garbage.
    plane_pad = 32 if plane_mode == "s8" else 8
    @pl.when(i == 0)
    def _():
        planes_ref[pl.ds(rows, plane_pad), :] = jnp.zeros(
            (plane_pad, planes_ref.shape[1]), planes_ref.dtype
        )

    local_all = scratch_ref[slot]  # (rows, 128)
    if plane_mode == "s8":
        # int8 byte planes, bias -128 so [0,255] fits s8; the s8 x s8 -> s32
        # MXU dot runs at 2x the bf16 rate, the one-hot row restores the
        # bias exactly (+128 after the pair select). int8 operand tiles are
        # (32, 128), so the subgroup window below starts 32-aligned.
        planes_ref[pl.ds(0, rows), 0:128] = (
            (local_all & 0xFF) - 128
        ).astype(jnp.int8)
        planes_ref[pl.ds(0, rows), 128:256] = (
            (jax.lax.shift_right_logical(local_all, 8) & 0xFF) - 128
        ).astype(jnp.int8)
        planes_ref[pl.ds(0, rows), 256:384] = (
            (jax.lax.shift_right_logical(local_all, 16) & 0xFF) - 128
        ).astype(jnp.int8)
        planes_ref[pl.ds(0, rows), 384:512] = (
            jax.lax.shift_right_logical(local_all, 24) - 128
        ).astype(jnp.int8)
    elif plane_mode != "halves":
        planes_ref[pl.ds(0, rows), 0:128] = (local_all & 0xFF).astype(
            jnp.bfloat16
        )
        planes_ref[pl.ds(0, rows), 128:256] = (
            jax.lax.shift_right_logical(local_all, 8) & 0xFF
        ).astype(jnp.bfloat16)
        planes_ref[pl.ds(0, rows), 256:384] = (
            jax.lax.shift_right_logical(local_all, 16) & 0xFF
        ).astype(jnp.bfloat16)
        planes_ref[pl.ds(0, rows), 384:512] = jax.lax.shift_right_logical(
            local_all, 24
        ).astype(jnp.bfloat16)
    else:
        planes_ref[pl.ds(0, rows), 0:128] = (local_all & 0xFFFF).astype(
            jnp.float32
        )
        planes_ref[pl.ds(0, rows), 128:256] = jax.lax.shift_right_logical(
            local_all, 16
        ).astype(jnp.float32)

    mt_all = (
        jnp.transpose(meta, (1, 0))  # (BP, 8): one lane->sublane relayout
        if (chunk_mt or chunk_desc or chunk_oh) and "nometa" not in ablate
        else None
    )

    oh0_all = oh1_all = None
    if chunk_oh and plane_mode in ("bytes", "halves") and mt_all is not None:
        oh_dt = jnp.bfloat16 if plane_mode == "bytes" else jnp.float32
        q8_all = mt_all[:, 6:7]  # (BP, 1) window-relative pick rows
        rid_bp = jax.lax.broadcasted_iota(
            jnp.int32, (bp, sub_rows + 8), 1
        )
        oh0_all = (rid_bp == q8_all).astype(oh_dt)
        oh1_all = (rid_bp == q8_all + 1).astype(oh_dt)

    desc_all = None
    if chunk_desc and "nometa" not in ablate and "nodesc" not in ablate:
        # ONE (BP, 2*ncls) x (2*ncls, dw) descriptor matmul for the whole
        # chunk instead of 24 per-subgroup (sgp, 2*ncls) ones — same MACs,
        # 1/24th the MXU invocations; subgroups below take static sublane
        # slices. Exactness unchanged (same one-hot fp32 HIGHEST contract).
        # NOTE chunk_desc implies the chunk-wide meta transpose (mt_all is
        # built above and the subgroup loop then slices it) — chunk_mt
        # measured neutral on its own, so the A/B stays clean.
        ids_bp = jax.lax.broadcasted_iota(jnp.int32, (bp, ncls), 1)
        oh2_all = jnp.concatenate(
            [
                (ids_bp == mt_all[:, 2:3]).astype(jnp.float32),
                (ids_bp == mt_all[:, 3:4]).astype(jnp.float32),
            ],
            axis=1,
        )  # (BP, 2*ncls)
        dw_all = max(nfields, 1) * 128
        desc_all = jnp.dot(
            oh2_all,
            tables_ref[:, :dw_all].astype(jnp.float32),
            precision=hi,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (BP, dw_all)

    for j in range(SUBGROUPS_V5):
        # Scalars feed ONLY ref-level slices (scalar unit); all per-pair
        # values arrive pre-computed in the meta rows (prep knows every
        # subgroup base, so rel/t0/q are laid out there — no per-subgroup
        # scalar->vector broadcast, which has crossing latency on TPU).
        off = base_ref[i * SUBGROUPS_V5 + j] - chunk_row0
        off8 = pl.multiple_of((off >> 3) << 3, 8)
        sl = slice(j * sgp, (j + 1) * sgp)
        if "nometa" in ablate:  # (timing ablation: wrong results; measures
            # the per-subgroup lane->sublane meta transpose)
            col = jax.lax.broadcasted_iota(jnp.int32, (sgp, 1), 0)
            t0_e = col & 127
            rb_o = (col & 127) + 64
            cls_e = cls_o = col & 7
            refs_e = refs_o = col & 0xFFF
            q8 = col & 7
        else:
            # ONE (8, sgp) -> (sgp, 8) transpose per subgroup instead of six
            # (1, sgp) -> (sgp, 1) ones; columns then slice out for free.
            # chunk_mt amortizes further: one (8, BP) -> (BP, 8) relayout
            # per chunk, subgroups then take static sublane slices.
            mt = (
                mt_all[sl]
                if mt_all is not None
                else jnp.transpose(meta[:, sl], (1, 0))
            )  # (sgp, 8)
            t0_e = mt[:, 0:1]  # rel_e & 127 == even-lane funnel base
            rb_o = mt[:, 1:2]  # rel_o - (q << 7): odd-lane funnel base
            cls_e = mt[:, 2:3]
            cls_o = mt[:, 3:4]
            refs_e = mt[:, 4:5]
            refs_o = mt[:, 5:6]
            q8 = mt[:, 6:7]  # (rel_e >> 7) + (off - off8): pick row index

        # Per-lane field descriptors: the concatenated even/odd one-hot rows
        # pick both parities' table rows in ONE matmul (tables_ref is laid
        # out [even rows; odd rows]); exact (descriptors < 2^19 per the
        # _packed_field_tables_v5 assert, fp32 HIGHEST matmul < 2^24).
        nf = nfields
        if "mergedout" in ablate:  # (timing ablation: wrong results) keep
            # planes/oh/picks/merge live, drop desc + field passes — the
            # complement of fields0 for splitting the compute complex.
            nf = 0
        elif "fields" in ablate:
            nf = int(ablate[ablate.index("fields") + 6])

        # descriptor columns actually consumed; "dwfull" keeps the desc
        # dot at the full static nfields width while fieldsN trims only
        # the pass loop — isolates desc-width layout effects from pass
        # work (the fields1 ablation is SLOWER than full on hw, r5).
        dw = max(nfields if "dwfull" in ablate else nf, 1) * 128
        if "nodesc" in ablate:  # (timing ablation: wrong results;
            # data-dependent so Mosaic keeps a real vector value)
            desc = (
                jax.lax.broadcasted_iota(jnp.int32, (sgp, dw), 1) + cls_e
            ) & 31
        elif desc_all is not None:  # chunk-wide matmul, static slice
            desc = desc_all[j * sgp : (j + 1) * sgp, :dw]
        elif desc_mode == "bytedot":
            # {1,256,65536}-weighted one-hot x byte-plane table: ONE
            # DEFAULT bf16 MXU pass (see _MODERN_TABLES_V5_BYTES). The
            # operand repeats the even/odd one-hot pair once per byte
            # plane with the plane's weight.
            ids = jax.lax.broadcasted_iota(jnp.int32, (sgp, ncls), 1)
            eq_e = ids == cls_e
            eq_o = ids == cls_o
            op = jnp.concatenate(
                [
                    jnp.where(eq, w, 0.0).astype(jnp.bfloat16)
                    for w in (1.0, 256.0, 65536.0)
                    for eq in (eq_e, eq_o)
                ],
                axis=1,
            )  # (sgp, 6*ncls)
            desc = jnp.dot(
                op,
                tables_ref[:, :dw].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # (sgp, nf*128)
        else:
            ids = jax.lax.broadcasted_iota(jnp.int32, (sgp, ncls), 1)
            oh2 = jnp.concatenate(
                [
                    (ids == cls_e).astype(jnp.float32),
                    (ids == cls_o).astype(jnp.float32),
                ],
                axis=1,
            )  # (sgp, 2*ncls)
            desc = jnp.dot(
                oh2,
                tables_ref[:, :dw].astype(jnp.float32),
                precision=hi,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # (sgp, nf*128)

        # Pick operands are the chunk-wide planes: bf16 byte planes by
        # default (bf16-exact for values <= 255 under a one-hot DEFAULT
        # dot), f32 16-bit half planes as the "halves" fallback (f32-exact
        # < 2^24 under a one-hot HIGHEST matmul). With chunk-wide plane
        # builds, bytes wins on device (0.652 vs 0.720 ms net, sharp
        # harness); the opposite held in v5.1 when planes were rebuilt per
        # subgroup. Mosaic requires a provably 8-aligned sublane start for
        # the plane load feeding the matmul: the subgroup offset is rounded
        # down to off8 and the remainder is already folded into the q8 meta
        # row by prep.
        if plane_mode == "s8":
            # int8 operand tiles are (32, 128): round the window start down
            # to 32 and add the 0/8/16/24 remainder to the pick row index
            # (same fold-the-remainder trick as off8, one scalar->vector
            # add per subgroup).
            off32 = pl.multiple_of((off >> 5) << 5, 32)
            planes = planes_ref[pl.ds(off32, sub_rows + 32), :]
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (sgp, sub_rows + 32), 1
            )
            q8 = q8 + (off8 - off32)
        else:
            planes = planes_ref[pl.ds(off8, sub_rows + 8), :]
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (sgp, sub_rows + 8), 1
            )

        # Pick precision note: a 3-pass bf16 decomposition (HIGH) would be
        # exact for one-hot x 16-bit-half operands (the one-hot is a
        # single bf16 term, any 16-bit value splits into hi+mid terms),
        # but Mosaic only lowers DEFAULT and HIGHEST dot precisions —
        # Precision.HIGH raises NotImplementedError in the TPU lowering.
        # plane_mode="bytes"/"packed" sidestep this: byte operands are
        # bf16-exact, so a DEFAULT single-pass dot is exact with no
        # decomposition.
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lanep = jax.lax.broadcasted_iota(
            jnp.int32, (1, planes.shape[1]), 1
        ) & 127
        # Merged-row trick (both branches): the pair window is [t, t+64)
        # with t = t0_e, so row0's used lanes are [t, 128) and row1's are
        # [0, t) — disjoint. One per-lane select builds a single 128-lane
        # source; every field then needs ONE gather at (widx & 127)
        # instead of two + a per-field select. Column c of the plane row
        # belongs to word lane c & 127.
        if plane_mode in ("packed", "packed2"):
            # ONE dot fetches BOTH pair rows: the "one-hot" carries 1 at
            # row q8 and 256 at row q8+1, so c = p0 + (p1 << 8). Exact
            # under a DEFAULT bf16 dot: {1, 256} and byte operands are
            # bf16-exact, each product <= 0xFF00 is a byte's 8 significand
            # bits exponent-shifted, and the two-term f32 accumulation
            # <= 65535 < 2^24. The pair-row select: "packed" = a variable
            # right-shift of the int32 c; "packed2" = constant-shift
            # extraction of both rows (c & 255, c >> 8) + a plain select.
            # MEASURED (r3, ablate_sharp_null_bytes_packed2_packed.json):
            # packed2 0.881 ~= packed 0.876 ms net 4K, both REJECTED vs
            # bytes 0.658 — the variable shift was NOT packed's loss; the
            # one-dot pick itself doesn't pay on modern.
            oh = (row_ids == q8).astype(jnp.int32) + (
                (row_ids == q8 + 1).astype(jnp.int32) << 8
            )
            c = jnp.dot(
                oh.astype(jnp.bfloat16),
                planes,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            if plane_mode == "packed2":
                pm = jnp.where(
                    lanep >= t0_e,
                    c & 0xFF,
                    jax.lax.shift_right_logical(c, 8),
                )
            else:
                pm = (
                    jax.lax.shift_right_logical(
                        c, jnp.where(lanep >= t0_e, 0, 8)
                    )
                    & 0xFF
                )
        else:
            if plane_mode == "bytes":
                def pick(oh):
                    return jnp.dot(
                        oh.astype(jnp.bfloat16),
                        planes,
                        preferred_element_type=jnp.float32,
                    )
            elif plane_mode == "s8":
                # s8 x s8 -> s32: exact by construction (integer MACs), and
                # the MXU runs int8 at 2x the bf16 pass rate.
                def pick(oh):
                    return jnp.dot(
                        oh.astype(jnp.int8),
                        planes,
                        preferred_element_type=jnp.int32,
                    )
            else:
                def pick(oh):
                    return jnp.dot(
                        oh.astype(jnp.float32),
                        planes,
                        precision=hi,
                        preferred_element_type=jnp.float32,
                    )

            # A pair spans <= 64 words, so rows q8, q8+1 always cover both
            # windows of the off8-based plane slice.
            if oh0_all is not None:  # chunk-wide one-hot build (chunk_oh):
                # astype is an identity on the pre-cast slices
                p0 = pick(oh0_all[sl])
                p1 = pick(oh1_all[sl])
            elif pick_stack:
                # Both pick one-hots stacked along M: ONE MXU dispatch per
                # subgroup instead of two — identical MACs/passes, half
                # the dot issues; static sublane slices split the result.
                # MEASURED r3: exactly neutral (0.662 vs 0.661 ms net 4K,
                # ablate_sharp_null_pstack_full_fields0.json) — dispatch
                # count is not the pick cost; pinned non-default.
                pp = pick(
                    jnp.concatenate(
                        [row_ids == q8, row_ids == q8 + 1], axis=0
                    )
                )
                p0 = pp[0:sgp]
                p1 = pp[sgp : 2 * sgp]
            elif "ohcheap" in ablate:
                # (timing ablation: wrong results) dots with a meta-
                # independent one-hot (same compare shape, constant
                # pattern CSE-able across subgroups): isolates pure MXU
                # streaming from the meta->compare->operand-relayout
                # chain the real picks carry.
                q8c = jax.lax.broadcasted_iota(jnp.int32, (sgp, 1), 0) & 7
                p0 = pick(row_ids == q8c)
                p1 = pick(row_ids == q8c + 1)
            elif "ohonly" in ablate:
                # (timing ablation: wrong results) real one-hot builds
                # kept live through a 1-column consumer, dots dropped:
                # the complement of ohcheap.
                dt = jnp.bfloat16 if plane_mode != "halves" else jnp.float32
                z = (row_ids == q8).astype(dt)[:, 0:1] + (
                    row_ids == q8 + 1
                ).astype(dt)[:, 0:1]
                p0 = p1 = (
                    jnp.zeros((sgp, planes.shape[1]), jnp.float32)
                    + z.astype(jnp.float32)
                )
            else:
                p0 = pick(row_ids == q8)
                p1 = pick(row_ids == q8 + 1)

            # The select runs in f32 plane space BEFORE the int32 convert
            # + plane-combine, so convert/shift/or happen once, not twice
            # (f32 select of exact integers < 2^24 stays exact).
            if "noselect" in ablate:  # (timing ablation: wrong results;
                # keeps both pick dots + the convert live, drops the
                # per-lane pair select — isolates the where cost)
                pm = (p0 + p1).astype(jnp.int32)
            else:
                pm = jnp.where(lanep >= t0_e, p0, p1).astype(jnp.int32)
            if plane_mode == "s8":
                pm = pm + 128  # undo the int8 plane bias (one-hot sum == 1)
        if "nomerge" in ablate:  # (timing ablation: wrong results; keeps
            # dots + select + convert live, drops the shift/or plane
            # combine — isolates the byte-merge cost)
            merged = pm[:, 0:128]
        elif plane_mode != "halves":
            merged = (
                pm[:, 0:128]
                | (pm[:, 128:256] << 8)
                | (pm[:, 256:384] << 16)
                | (pm[:, 384:512] << 24)
            )
        else:
            merged = pm[:, 0:128] | (pm[:, 128:256] << 16)
        if "nopick" in ablate:  # (timing ablation: wrong results; the
            # scalar read keeps the span DMA live)
            merged = (t0_e ^ scratch_ref[slot, 0, 0]) + lane_ids

        rel_base = jnp.where(c_lane == 1, rb_o, t0_e)  # (sgp, 128)

        if "mergedout" in ablate:
            vals = merged
        else:
            vals = jnp.zeros((sgp, 128), jnp.int32) if nf == 0 else None
        for f in range(nf):
            d = desc[:, f * 128 : (f + 1) * 128]
            widx = rel_base + (d & 31)
            word = jnp.take_along_axis(merged, widx & 127, axis=1)
            fv = jax.lax.shift_right_logical(
                word << ((d >> 5) & 31), (d >> 10) & 31
            )
            if f > 0:  # slot 0 always has lsh == 0
                fv = fv << ((d >> 15) & 15)
            vals = fv if vals is None else vals | fv

        # Class 0 has no fields (its funnel slots are all-zero descriptors
        # that pass word bits through) — zero those lanes. A lane's slot-0
        # descriptor is 0 iff its class is 0 (every other class has a
        # slot-0 field with nb > 0, so rsh2 = 32-nb != 0), so testing the
        # descriptor directly saves building a cls lane-select.
        vals = jnp.where(desc[:, 0:128] == 0, 0, vals)

        refs_lane = jnp.where(c_lane == 1, refs_o, refs_e)
        # No & 0xFFFF: the uint16 store cast below truncates mod 2^16.
        vals = vals + refs_lane  # (sgp, 128) finished pixels

        if "rawout" in ablate:  # (timing ablation: raw pair-row layout)
            out_ref[pl.ds(j * sgp, sgp)] = vals.astype(jnp.uint16)
        elif wide_store:
            # (2*txp, 64) row-major == (txp, 128): the reshape interleaves
            # adjacent sublanes into lane halves, so each store writes full
            # 128-lane vreg rows (flat_out's 64-lane stores mask half of
            # every vreg). Same HBM bytes, half the vreg rows per store.
            u16 = vals.astype(jnp.uint16)
            for t_local in range(tr_sub):
                band = t_local * 2 * txp
                r0 = (j * rows_per_sub + t_local * 4) * txp
                w0 = u16[band : band + 2 * txp, 0:64].reshape(txp, 128)
                w1 = u16[band : band + 2 * txp, 64:128].reshape(txp, 128)
                if wide_store == 2:
                    out_ref[pl.ds(r0 // 2, 2 * txp)] = jnp.concatenate(
                        [w0, w1], axis=0
                    )
                else:
                    out_ref[pl.ds(r0 // 2, txp)] = w0
                    out_ref[pl.ds(r0 // 2 + txp, txp)] = w1
        elif flat_out:
            # The 3D (rows_chunk, txp, 64) out block is row-major-identical
            # to 2D (rows_chunk*txp, 64): out image rows 4j+2h+qr for
            # qr=0,1 occupy CONTIGUOUS 2D rows, and their values are
            # contiguous vals sublane bands [t*2*txp, (t+1)*2*txp) at lane
            # half h. So per (t_local, h): ONE full-sublane (2*txp, 64)
            # store instead of two 64-lane sliced ones — halves the
            # statically-unrolled store count at identical HBM bytes.
            u16 = vals.astype(jnp.uint16)
            for t_local in range(tr_sub):
                band = t_local * 2 * txp
                r0 = (j * rows_per_sub + t_local * 4) * txp
                out_ref[pl.ds(r0, 2 * txp)] = u16[
                    band : band + 2 * txp, 0:64
                ]
                out_ref[pl.ds(r0 + 2 * txp, 2 * txp)] = u16[
                    band : band + 2 * txp, 64:128
                ]
        else:
            for r in range(rows_per_sub):
                t_local, h, qr = r >> 2, (r >> 1) & 1, r & 1
                band = (t_local * 2 + qr) * txp
                out_ref[j * rows_per_sub + r] = vals[
                    band : band + txp, h * 64 : (h + 1) * 64
                ].astype(jnp.uint16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_chunks", "txp", "tr_sub", "tx", "rows", "sub_rows", "nfields",
        "flat_out", "chunk_mt", "chunk_desc", "chunk_oh", "wide_store",
        "plane_mode", "desc_mode", "pick_stack", "ablate", "interpret",
    ),
)
def _unpack_image_pallas_v5(
    payload2d: jnp.ndarray,
    base_rows: jnp.ndarray,  # (num_chunks * SUBGROUPS_V5,)
    meta: jnp.ndarray,  # (num_chunks, 8, BP)
    *,
    num_chunks: int,
    txp: int,
    tr_sub: int,
    tx: int | None = None,  # real tile columns: enables the uniform16
    # fast path when nfields == UNIFORM16 (without it the sentinel safely
    # clamps to the general 1-field path)
    rows: int | None = None,  # content-aware chunk-DMA span (None = worst)
    sub_rows: int | None = None,  # content-aware subgroup span (None = worst)
    nfields: int = 3,  # static field-pass count: max word-fields over the
    # classes PRESENT in the frame (v5_required_fields); 3 is always safe;
    # UNIFORM16 (-1) marks an all-class-16 frame (static-slice fast path)
    flat_out: bool = True,  # 2D out block, 2 stores/subgroup (see kernel)
    chunk_mt: bool = False,  # chunk-wide meta transpose (see kernel)
    chunk_desc: bool = False,  # chunk-wide desc matmul (see kernel)
    chunk_oh: bool = False,  # chunk-wide pick one-hot build (see kernel)
    pick_stack: bool = False,  # one M-stacked pick dot per subgroup (see kernel)
    wide_store: int = 0,  # 128-lane out block via 2D reshape (see kernel)
    plane_mode: str = "bytes",  # pick-operand planes (see kernel)
    desc_mode: str = "dot3",  # descriptor-dot structure (see kernel)
    ablate: str = "",
    interpret: bool = False,
):
    """(num_chunks * SUBGROUPS_V5 * tr_sub * 4, txp, 64) uint16 image rows."""
    # A/B flags that would silently no-op under some plane_modes must fail
    # loudly instead: a benchmark "testing" pick_stack under packed planes
    # (the packed branch returns before the pick_stack one) or chunk_oh
    # under s8 (falls back to per-subgroup one-hots while still paying the
    # chunk-wide transpose) would produce misleading conclusions.
    if pick_stack and plane_mode in ("packed", "packed2"):
        raise ValueError(
            f"pick_stack is a no-op under plane_mode={plane_mode!r}"
        )
    if chunk_oh and plane_mode not in ("bytes", "halves"):
        raise ValueError(
            f"chunk_oh is not supported with plane_mode={plane_mode!r}"
        )
    if (wide_store or chunk_desc) and not interpret:
        # Quarantine (VERDICT r3 #8): these pinned A/B variants compile and
        # pass under the Pallas interpreter but SIGABRT Mosaic on real TPU
        # hardware (r3 ledger; tools/hw_parity.py flags sweep re-checks
        # each round). They must not be reachable from the default
        # namespace on hardware — a library kwarg that aborts the process
        # is a landmine, not a feature.
        import os

        if not os.environ.get("MCRAW_UNSAFE_VARIANTS"):
            raise ValueError(
                "wide_store/chunk_desc are interpret-only: they crash "
                "Mosaic on TPU hardware. Set MCRAW_UNSAFE_VARIANTS=1 to "
                "bypass for compiler-regression probes."
            )
    # UNIFORM16 sentinel: take the static-slice fast path when the caller
    # supplied tx and no variant/ablation flag conflicts with it; otherwise
    # clamp to the general path with the (correct for class 16) one field
    # pass. The fallback is a correctness guarantee, not an A/B no-op: the
    # sentinel is auto-derived from frame content, so sweeps with exotic
    # flags must still decode all-16-bit frames.
    uniform16 = False
    if nfields < 0:
        uniform16 = (
            tx is not None
            and not ablate
            and flat_out is True
            and not wide_store
            and not (chunk_mt or chunk_desc or chunk_oh or pick_stack)
            # Non-default plane/desc modes must hit the general path: the
            # fast path uses neither planes nor desc dots, so letting it
            # engage would make a plane_mode/desc_mode A/B on all-16-bit
            # content compare two identical programs and report the flag
            # as exactly neutral (the same silent-no-op class the
            # ValueErrors above exist to prevent).
            and plane_mode == "bytes"
            and desc_mode == "dot3"
        )
        nfields = 1
    if chunk_desc:
        desc_mode = "dot3"  # chunk-wide desc matmul needs the int32 table
    bp = meta.shape[2]
    sgp = bp // SUBGROUPS_V5
    if sub_rows is None:
        # A subgroup's real blocks span at most sgp*2 block windows of 32
        # words; plane-build and pick-matmul work scale with this, so
        # callers that know the frame's actual spans (v6 light prep) pass
        # smaller bucketed values.
        sub_rows = (sgp * 2 * _MAX_WORDS_PER_BLOCK) // 128 + 2
        sub_rows += (-sub_rows) % 8
    rows_worst = (bp * 2 * _MAX_WORDS_PER_BLOCK) // 128 + 2
    rows_worst += (-rows_worst) % 8
    if rows is None:
        rows = rows_worst
    else:
        # rows from v5_content_spans is the chunk CONTENT span; every
        # subgroup's scratch slice [sub_base - chunk_base, +sub_rows) must
        # fit, and sub_base can sit anywhere inside the content span (a
        # late subgroup after dense ones, or a padded-tail dummy whose
        # base is the last real block) — so the window is span + sub_rows.
        rows = min(rows_worst, rows + sub_rows)
    if uniform16:
        # All-16-bit content spans the worst case by definition, and the
        # fast path's dummy-column row slices (g0 + txp + 1 with txp up to
        # tx+7) must stay inside the scratch window for every subgroup.
        rows = rows_worst
    rows_chunk = SUBGROUPS_V5 * tr_sub * 4
    if "smallout" in ablate:  # timing ablation: (8, 128) out per chunk
        out_spec = pl.BlockSpec(
            (8, 128), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((num_chunks * 8, 128), jnp.uint16)
    elif "rawout" in ablate:  # timing ablation: raw (pair-row, 128) layout
        out_spec = pl.BlockSpec(
            (SUBGROUPS_V5 * sgp, 128),
            lambda i, base: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (num_chunks * SUBGROUPS_V5 * sgp, 128), jnp.uint16
        )
    elif wide_store:
        # Row-major-identical to the flat 2D block at double lane width:
        # (2*txp, 64) value slabs reshape to (txp, 128) full-vreg rows.
        out_spec = pl.BlockSpec(
            (rows_chunk * txp // 2, 128),
            lambda i, base: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (num_chunks * rows_chunk * txp // 2, 128), jnp.uint16
        )
    elif flat_out:
        # Row-major-identical to the 3D (rows_chunk, txp, 64) block; the
        # flat shape lets the kernel write 2*txp-sublane slabs (two image
        # rows) per store. Reshaped back to 3D below — free on HBM.
        out_spec = pl.BlockSpec(
            (rows_chunk * txp, 64),
            lambda i, base: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (num_chunks * rows_chunk * txp, 64), jnp.uint16
        )
    else:
        out_spec = pl.BlockSpec(
            (rows_chunk, txp, 64),
            lambda i, base: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (num_chunks * rows_chunk, txp, 64), jnp.uint16
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, bp), lambda i, base: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.int32),
            # +8 tail rows: zeroed overhang for the 8-aligned slices (+32
            # for s8, whose operand tiles force 32-aligned window starts).
            # Same VMEM bytes bytes-vs-halves: 256 f32 lanes == 512 bf16
            # lanes; s8 is half that. The uniform16 fast path gathers from
            # the int32 scratch directly — its plane scratch is a dummy.
            pltpu.VMEM((8, 512), jnp.bfloat16)
            if uniform16
            else pltpu.VMEM((rows + 32, 512), jnp.int8)
            if plane_mode == "s8"
            else pltpu.VMEM((rows + 8, 512), jnp.bfloat16)
            if plane_mode != "halves"
            else pltpu.VMEM((rows + 8, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tables = jnp.asarray(
        _MODERN_TABLES_V5_BYTES if desc_mode == "bytedot"
        else _MODERN_TABLES_V5
    )
    kern = functools.partial(
        _unpack_kernel_v5,
        rows=rows,
        sub_rows=sub_rows,
        txp=txp,
        tr_sub=tr_sub,
        tx=tx,
        uniform16=uniform16,
        nfields=nfields,
        flat_out=flat_out,
        chunk_mt=chunk_mt,
        chunk_desc=chunk_desc,
        chunk_oh=chunk_oh,
        wide_store=wide_store,
        plane_mode=plane_mode,
        desc_mode=desc_mode,
        pick_stack=pick_stack,
        ablate=ablate,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(base_rows, meta, tables, payload2d)
    if (flat_out or wide_store) and (
        "smallout" not in ablate and "rawout" not in ablate
    ):
        out = out.reshape(num_chunks * rows_chunk, txp, 64)
    return out


def v5_geometry(tiles_y: int, tiles_x: int) -> tuple[int, int]:
    """(txp, tr_sub) for a frame geometry.

    txp: tile columns padded to a multiple of 8 (sublane-aligned bands).
    tr_sub: tile-rows per subgroup — capped because each tile-row adds 4
    statically-unrolled slab stores, and a chunk should not vastly out-span
    a small frame.
    """
    txp = tiles_x + (-tiles_x) % 8
    trb = 4 * tiles_x
    tr_sub = max(
        1,
        min(int(round(TARGET_SG_V5 / trb)), -(-tiles_y // SUBGROUPS_V5), 8),
    )
    return txp, tr_sub


def v5_chunk_span_rows(tiles_y: int, tiles_x: int) -> int:
    """Worst-case 512B payload rows one chunk's DMA window can span."""
    txp, tr_sub = v5_geometry(tiles_y, tiles_x)
    bp = SUBGROUPS_V5 * tr_sub * 2 * txp
    rows = (bp * 2 * _MAX_WORDS_PER_BLOCK) // 128 + 2
    return rows + (-rows) % 8


# Host-prep cache: the kernel-row gather indices depend only on geometry,
# not content — build once per (tiles_y, tiles_x).
_V5_IDX_CACHE: dict = {}


def _v5_indices(ty: int, tx: int) -> dict:
    # Keyed on the tunables too: benchmark sweeps monkeypatch them.
    key = (ty, tx, SUBGROUPS_V5, TARGET_SG_V5)
    c = _V5_IDX_CACHE.get(key)
    if c is not None:
        return c
    txp, tr_sub = v5_geometry(ty, tx)
    trb = 4 * tx
    tr_chunk = SUBGROUPS_V5 * tr_sub
    num_chunks = max(1, -(-ty // tr_chunk))
    ty_pad = num_chunks * tr_chunk
    nblk = ty_pad * trb

    # Pair gather indices in kernel-row order (t, q, txi). Dummy lanes
    # (txi >= tx) take their OFFSETS from the band's first pair (in-span DMA
    # windows) but their cls/refs from a zeroed sentinel pair appended past
    # the block arrays — no per-frame np.where needed.
    t_idx = np.arange(ty_pad, dtype=np.int64)[:, None, None]
    q_idx = np.arange(2, dtype=np.int64)[None, :, None]
    x_idx = np.arange(txp, dtype=np.int64)[None, None, :]
    real = x_idx < tx
    pair_off = (t_idx * tx + np.where(real, x_idx, 0)) * 2 + q_idx
    sentinel = nblk // 2  # pair index of the appended zero pair
    pair_meta = np.where(real, pair_off, sentinel)
    pair_off = pair_off.reshape(-1)
    pair_meta = pair_meta.reshape(-1)
    c = {
        "txp": txp,
        "tr_sub": tr_sub,
        "num_chunks": num_chunks,
        "nblk": nblk,
        "bp": tr_chunk * 2 * txp,
        "off_e": (pair_off * 2).astype(np.intp),
        "off_o": (pair_off * 2 + 1).astype(np.intp),
        "meta_e": (pair_meta * 2).astype(np.intp),
        "meta_o": (pair_meta * 2 + 1).astype(np.intp),
        "base_idx": (
            np.arange(num_chunks * SUBGROUPS_V5, dtype=np.intp)
            * (tr_sub * trb)
        ),
        "span_rows": v5_chunk_span_rows(ty, tx),
    }
    # Device-prep permutation matrices: block order (txi, q, c) -> kernel-row
    # order (q, txi) per tile-row, as one-hot matmuls (exact in fp32 HIGHEST;
    # XLA's minor-dim-2 slicing/transposes cost ~1.1ms/frame on TPU).
    # perm_off_* route dummy lanes (txi >= tx) to the band's first pair;
    # perm_meta_* leave them zero (class 0 / ref 0).
    for cc in (0, 1):
        p_off = np.zeros((trb, 2 * txp), dtype=np.float32)
        p_meta = np.zeros((trb, 2 * txp), dtype=np.float32)
        for q in range(2):
            for txi in range(txp):
                dst = q * txp + txi
                p_off[4 * (txi if txi < tx else 0) + 2 * q + cc, dst] = 1.0
                if txi < tx:
                    p_meta[4 * txi + 2 * q + cc, dst] = 1.0
        c[f"perm_off_{cc}"] = p_off
        c[f"perm_meta_{cc}"] = p_meta
    _V5_IDX_CACHE[key] = c
    return c


def prepare_chunked_v5(plan: U.ModernPlan):
    """Pair-row chunk layout for the v5 kernel.

    Returns (payload2d, base_rows, meta, num_chunks, txp, tr_sub).
    Kernel-row order within a subgroup is (tile_row, q, tx) so image rows
    are contiguous bands; tx is padded to a multiple of 8 with zero-class
    dummy pairs (their columns are cropped after the reshape).
    """
    c = _v5_indices(plan.tiles_y, plan.tiles_x)
    txp, tr_sub = c["txp"], c["tr_sub"]
    num_chunks, nblk, bp = c["num_chunks"], c["nblk"], c["bp"]

    n = len(plan.offsets)  # == ty * 4 * tx
    # Block arrays + 2 sentinel entries (zero class/ref for dummy lanes).
    offs_w = np.empty(nblk + 2, dtype=np.int32)
    np.floor_divide(plan.offsets, 4, out=offs_w[:n], casting="unsafe")
    offs_w[n:] = offs_w[n - 1] if n else 0
    cls = np.zeros(nblk + 2, dtype=np.int32)
    cls[:n] = plan.cls
    refs = np.zeros(nblk + 2, dtype=np.int32)
    refs[:n] = plan.refs

    base_rows = (offs_w.take(c["base_idx"]) // 128).astype(np.int32)

    meta = np.empty((num_chunks, 8, bp), dtype=np.int32)
    flat = (num_chunks, bp)
    offe = offs_w.take(c["off_e"]).reshape(flat)
    offo = offs_w.take(c["off_o"]).reshape(flat)
    meta[:, 2] = cls.take(c["meta_e"]).reshape(flat)
    meta[:, 3] = cls.take(c["meta_o"]).reshape(flat)
    meta[:, 4] = refs.take(c["meta_e"]).reshape(flat)
    meta[:, 5] = refs.take(c["meta_o"]).reshape(flat)
    # Rel-meta rows (see _unpack_kernel_v5): every per-pair value the kernel
    # needs is precomputed here against the subgroup/chunk bases so the
    # kernel's vector path never touches a scalar (scalar->vector broadcast
    # latency) and batched launches need no meta rebase at all.
    sgp = bp // SUBGROUPS_V5
    base = base_rows.reshape(num_chunks, SUBGROUPS_V5).astype(np.int64)
    rel_e = offe.reshape(num_chunks, SUBGROUPS_V5, sgp) - (
        base[:, :, None] * 128
    )
    rel_o = offo.reshape(num_chunks, SUBGROUPS_V5, sgp) - (
        base[:, :, None] * 128
    )
    q = rel_e >> 7
    off = base - base[:, :1]
    delta = off - ((off >> 3) << 3)  # remainder of the 8-aligned slice
    meta[:, 0] = (rel_e & 127).reshape(flat)
    meta[:, 1] = (rel_o - (q << 7)).reshape(flat)
    meta[:, 6] = (q + delta[:, :, None]).reshape(flat)
    meta[:, 7] = 0

    pay = plan.payload
    rows_needed = int(base_rows[-SUBGROUPS_V5]) + c["span_rows"]
    total = max(rows_needed * 512, len(pay))
    total += (-total) % 512
    if len(pay) >= total:
        padded = pay[: len(pay) - (len(pay) % 512)]  # zero-copy view
    else:
        padded = np.zeros(total, dtype=np.uint8)
        padded[: len(pay)] = pay
    payload2d = np.ascontiguousarray(padded).view("<i4").reshape(-1, 128)
    return payload2d, base_rows, meta, num_chunks, txp, tr_sub


def decode_modern_pallas_v5(
    payload: np.ndarray, width: int, height: int, interpret: bool = False,
    **kw,
):
    """Full modern decode, fused de-interleave (no XLA epilogue).

    Extra keyword arguments forward to :func:`_unpack_image_pallas_v5`
    (variant flags — tools/hw_parity.py sweeps the shipping set on
    hardware each round, VERDICT r3 #8)."""
    plan = U.prepare_modern(payload, width, height)
    payload2d, base_rows, meta, num_chunks, txp, tr_sub = prepare_chunked_v5(
        plan
    )
    img3 = _unpack_image_pallas_v5(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        txp=txp,
        tr_sub=tr_sub,
        tx=plan.tiles_x,
        nfields=v5_required_fields_cls(plan.cls),
        interpret=interpret,
        **kw,
    )
    img = img3.reshape(img3.shape[0], txp * 64)
    return img[: plan.height, : plan.width]


def stack_chunked_v5(plans: list) -> tuple:
    """Concatenate same-geometry frames into one v5 launch."""
    chunked = [prepare_chunked_v5(p) for p in plans]
    _, _, _, nc, txp, tr_sub = chunked[0]
    if any(c[3:] != (nc, txp, tr_sub) for c in chunked):
        raise ValueError("frames in a batch must share geometry")

    row_starts = []
    total_rows = 0
    for p2d, *_ in chunked:
        row_starts.append(total_rows)
        total_rows += p2d.shape[0]
    payload2d = np.concatenate([c[0] for c in chunked], axis=0)
    base_rows = np.concatenate(
        [c[1] + rs for c, rs in zip(chunked, row_starts)]
    ).astype(np.int32)
    # Rel-meta is frame-local by construction — only base_rows shift.
    meta = np.concatenate([c[2] for c in chunked], axis=0)
    return payload2d, base_rows, meta, nc * len(plans), txp, tr_sub


def decode_modern_pallas_batch_v5(plans: list, interpret: bool = False):
    """(F, H, W) uint16 from same-geometry ModernPlans in ONE kernel launch."""
    payload2d, base_rows, meta, num_chunks, txp, tr_sub = stack_chunked_v5(
        plans
    )
    p = plans[0]
    img3 = _unpack_image_pallas_v5(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        txp=txp,
        tr_sub=tr_sub,
        tx=p.tiles_x,
        nfields=max(v5_required_fields_cls(q.cls) for q in plans),
        interpret=interpret,
    )
    rows_frame = img3.shape[0] // len(plans)
    img = img3.reshape(len(plans), rows_frame, txp * 64)
    return img[:, : p.height, : p.width]


# -----------------------------------------------------------------------------
# v6 = v5 kernel + DEVICE-SIDE prep: everything after the two serial host
# scans (bits/refs streams) moves into the jit program — class/length
# mapping, the block-offset prefix sum, and the kernel-row meta layout. The
# meta layout is pure reshapes/transposes/pads (the (t,q,txi) kernel-row
# order is a transpose of the (t,txi,q,c) block order), so no big gathers.
# Host cost per frame drops to: native scans (~0.2ms) + a bucketed
# (recompile-bounded) zero-copy payload upload. This is what makes sustained
# streaming device-bound instead of host-bound.
# -----------------------------------------------------------------------------

PAYLOAD_BUCKET_ROWS = 4096  # 2MB H2D buckets bound jit recompiles
SUB_ROWS_STEP = 16  # content-span bucket steps (bound recompiles per geometry)
ROWS_STEP = 512
# The v6 device-prep permutation/prefix-sum matmuls are fp32-exact only
# while word offsets stay below 2^24, i.e. payloads under 64 MiB; larger
# frames must take the integer host-prep v5 path (pipeline._v6_eligible).
V6_MAX_PAYLOAD = 1 << 26


def _spans_from_lengths(
    lengths: np.ndarray, ty: int, tx: int
) -> tuple[int, int]:
    """Bucketed (rows, sub_rows) from a frame's per-block payload lengths.

    The kernel's plane-build, one-hot pick matmuls, and chunk DMA all scale
    with the span windows, which default to the all-16-bit worst case; real
    content (e.g. ~9.6 bits/px) spans ~60% of that. One reduceat at subgroup
    boundaries (no full cumsum), rounded up to coarse buckets so jit
    recompiles stay bounded.
    """
    geo = _v5_indices(ty, tx)
    nblk = len(lengths)
    idxs = geo["base_idx"]  # subgroup starts, block units, ascending
    k = max(int(np.searchsorted(idxs, nblk)), 1)
    seg = np.add.reduceat(lengths, np.asarray(idxs[:k], dtype=np.intp))
    return _spans_from_segments(seg, ty, tx)


def _spans_from_segments(
    seg: np.ndarray, ty: int, tx: int
) -> tuple[int, int]:
    """Span buckets from per-subgroup payload byte sums (see
    _spans_from_lengths; the native scan produces `seg` directly)."""
    geo = _v5_indices(ty, tx)
    k = len(seg)
    ends = 16 + np.cumsum(seg, dtype=np.int64)  # each subgroup's end byte
    starts = ends - seg
    base = (starts >> 2) >> 7
    need = ((((ends + 3) >> 2) - (base << 7) + 127) >> 7) + 1
    sub_need = int(need.max())
    cstarts = starts[::SUBGROUPS_V5]
    last = np.minimum(
        np.arange(1, len(cstarts) + 1) * SUBGROUPS_V5, k
    ) - 1
    cends = ends[last]
    cbase = (cstarts >> 2) >> 7
    cneed = ((((cends + 3) >> 2) - (cbase << 7) + 127) >> 7) + 1
    rows_need = int(cneed.max())

    sgp = geo["bp"] // SUBGROUPS_V5
    sub_worst = (sgp * 2 * _MAX_WORDS_PER_BLOCK) // 128 + 2
    sub_worst += (-sub_worst) % 8
    rows_worst = (geo["bp"] * 2 * _MAX_WORDS_PER_BLOCK) // 128 + 2
    rows_worst += (-rows_worst) % 8
    sub_rows = min(sub_worst, sub_need + (-sub_need) % SUB_ROWS_STEP)
    # Returned rows are the CONTENT span only. The kernel slices scratch at
    # [sub_base - chunk_base, +sub_rows) for every subgroup, so the scratch
    # window must be span + sub_rows — added in _unpack_image_pallas_v5,
    # NOT here, so that batched callers can max() each component across
    # frames independently without breaking the coupled invariant.
    rows = min(rows_worst, rows_need + (-rows_need) % ROWS_STEP)
    return rows, max(sub_rows, 8)


def v5_content_spans(bits: np.ndarray, ty: int, tx: int) -> tuple[int, int]:
    """Bucketed (rows, sub_rows) content spans from a raw bits stream."""
    nblk = ty * 4 * tx
    lengths = T.MODERN_BLOCK_LENGTH.take(bits[:nblk], mode="clip")
    return _spans_from_lengths(lengths, ty, tx)


def _cls_from_bits(b):
    """bits (clamped 0..16) -> MODERN_CLASSES row index, branch-free.

    Mirrors tables.MODERN_CLASS_INDEX: 0..6 -> itself, 7/8 -> 7 (class 8),
    9/10 -> 8 (class 10), 11..16 -> 9 (class 16).
    """
    return jnp.where(b <= 6, b, jnp.where(b <= 8, 7, jnp.where(b <= 10, 8, 9)))


def _len_from_bits(b):
    """tables.MODERN_BLOCK_LENGTH as arithmetic (payload bytes per block)."""
    return jnp.where(
        b <= 6, 8 * b, jnp.where(b <= 8, 64, jnp.where(b <= 10, 80, 128))
    )


def _v6_build_meta(bits: jnp.ndarray, refs: jnp.ndarray, *, ty: int, tx: int):
    """Device-side prep for ONE frame: raw bits/refs streams -> (meta
    (nc, 8, bp), base_rows (nc*SUBGROUPS_V5,)). Pure jnp (vmappable: the
    batched v6 path maps this over a frame axis)."""
    geo = _v5_indices(ty, tx)
    nc, bp = geo["num_chunks"], geo["bp"]
    trb = 4 * tx
    ty_pad = geo["nblk"] // trb
    nblk = ty * trb

    b = jnp.minimum(bits.astype(jnp.int32), 16)
    cls = _cls_from_bits(b)
    lengths = _len_from_bits(b)
    # Exclusive prefix sum on the MXU: jnp.cumsum lowers to a scan that
    # costs ~0.7ms at 200k elements; two triangular matmuls are exact
    # (level 1: values <= 128 in bf16; level 2: row totals <= 16384 in
    # fp32 HIGHEST) and effectively free.
    padn = (-nblk) % (128 * 128)
    lp = (
        jnp.concatenate([lengths, jnp.zeros(padn, jnp.int32)])
        if padn
        else lengths
    )
    x = lp.reshape(-1, 128)  # (R, 128), R <= 128 * ceil(nblk/16384) blocks
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    within = jnp.dot(
        x.astype(jnp.bfloat16),
        tri.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    rt = within[:, -1].reshape(-1, 128).astype(jnp.float32)  # (R/128, 128)
    w2 = jnp.dot(
        rt, tri, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    row_excl = (w2 - rt.astype(jnp.int32)).reshape(-1, 1)  # per-row base
    # rows of 16384-element super-blocks still need the super-block bases
    sb = w2[:, -1]  # (S,) super-block totals, S small
    sb_excl = jnp.cumsum(sb) - sb  # tiny (<= a few dozen rows)
    base = (row_excl.reshape(w2.shape) + sb_excl[:, None]).reshape(-1, 1)
    inclusive = (within + base).reshape(-1)[:nblk]
    offs = 16 + inclusive - lengths
    offs_w = offs >> 2
    ref32 = refs.astype(jnp.int32)

    pad_t = ty_pad * trb - nblk
    if pad_t:
        offs_w = jnp.concatenate(
            [offs_w, jnp.broadcast_to(offs_w[-1:], (pad_t,))]
        )
        cls = jnp.concatenate([cls, jnp.zeros(pad_t, jnp.int32)])
        ref32 = jnp.concatenate([ref32, jnp.zeros(pad_t, jnp.int32)])

    # Block order (t, txi, q, c) -> kernel-row order (t, q, txi) as exact
    # one-hot matmuls (values < 2^24; fp32 HIGHEST). XLA's native form of
    # this permutation (minor-dim-2 slices + transposes) costs ~1.1ms/frame.
    hi = jax.lax.Precision.HIGHEST

    def bands(arr, pkey):
        x = arr.reshape(ty_pad, trb).astype(jnp.float32)
        y = jnp.dot(
            x,
            jnp.asarray(geo[pkey]),
            precision=hi,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return y.reshape(nc, bp)

    base_rows = offs_w[jnp.asarray(geo["base_idx"], dtype=jnp.int32)] >> 7

    # Rel-meta rows (mirrors prepare_chunked_v5): per-pair funnel bases and
    # pick-row indices against the subgroup/chunk bases, so the kernel's
    # vector path is scalar-free and batch launches need no meta rebase.
    s_ = SUBGROUPS_V5
    sgp = bp // s_
    o_e = bands(offs_w, "perm_off_0").reshape(nc, s_, sgp)
    o_o = bands(offs_w, "perm_off_1").reshape(nc, s_, sgp)
    base = base_rows.reshape(nc, s_)
    rel_e = o_e - base[:, :, None] * 128
    rel_o = o_o - base[:, :, None] * 128
    q = rel_e >> 7
    off = base - base[:, :1]
    delta = off - ((off >> 3) << 3)
    meta = jnp.stack(
        [
            (rel_e & 127).reshape(nc, bp),
            (rel_o - (q << 7)).reshape(nc, bp),
            bands(cls, "perm_meta_0"),
            bands(cls, "perm_meta_1"),
            bands(ref32, "perm_meta_0"),
            bands(ref32, "perm_meta_1"),
            (q + delta[:, :, None]).reshape(nc, bp),
            jnp.zeros((nc, bp), jnp.int32),
        ],
        axis=1,
    )  # (nc, 8, bp)
    return meta, base_rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "ty", "tx", "height", "width", "rows", "sub_rows", "nfields",
        "interpret",
    ),
)
def decode_modern_device_v6(
    p32: jnp.ndarray,  # (rows_bucketed * 128,) int32 payload words
    bits: jnp.ndarray,  # (nblk,) uint16 raw stream values
    refs: jnp.ndarray,  # (nblk,) uint16
    *,
    ty: int,
    tx: int,
    height: int,
    width: int,
    rows: int | None = None,  # bucketed content spans (v5_content_spans)
    sub_rows: int | None = None,
    nfields: int = 3,  # v5_required_fields of the frame (3 always safe)
    interpret: bool = False,
):
    """Full modern decode with on-device prep + the fused v5 kernel."""
    geo = _v5_indices(ty, tx)
    txp, tr_sub, nc = geo["txp"], geo["tr_sub"], geo["num_chunks"]
    meta, base_rows = _v6_build_meta(bits, refs, ty=ty, tx=tx)

    # prepare_modern_light buckets the payload with the chunk-span overhang
    # included, so no device-side pad copy is needed.
    payload2d = p32.reshape(-1, 128)

    img3 = _unpack_image_pallas_v5.__wrapped__(
        payload2d,
        base_rows,
        meta,
        num_chunks=nc,
        txp=txp,
        tr_sub=tr_sub,
        tx=tx,
        rows=rows,
        sub_rows=sub_rows,
        nfields=nfields,
        interpret=interpret,
    )
    img = img3.reshape(img3.shape[0], txp * 64)
    return img[:height, :width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "ty", "tx", "height", "width", "rows", "sub_rows", "nfields",
        "interpret",
    ),
)
def decode_modern_device_v6_batch(
    p32s: jnp.ndarray,  # (F, rows * 128) int32 per-frame bucketed words
    bits: jnp.ndarray,  # (F, nblk) uint16 raw stream values
    refs: jnp.ndarray,  # (F, nblk) uint16
    *,
    ty: int,
    tx: int,
    height: int,
    width: int,
    rows: int | None = None,  # max of per-frame v5_content_spans buckets
    sub_rows: int | None = None,
    nfields: int = 3,  # max v5_required_fields over the batch (3 safe)
    interpret: bool = False,
):
    """(F, H, W) modern decode with per-frame DEVICE-side prep + ONE fused
    kernel launch. The host only runs the serial bits/refs scans and uploads
    payload buckets — no per-frame offset/meta assembly on the host, so a
    multi-chip mesh can be fed from one process (see
    parallel.decode_frames_v6_mesh)."""
    geo = _v5_indices(ty, tx)
    txp, tr_sub, nc = geo["txp"], geo["tr_sub"], geo["num_chunks"]
    f = p32s.shape[0]
    frame_rows = p32s.shape[1] // 128
    metas, bases = jax.vmap(
        functools.partial(_v6_build_meta, ty=ty, tx=tx)
    )(bits, refs)  # (F, nc, 8, bp), (F, nc*SUBGROUPS_V5)
    # Rel-meta is frame-local — only the DMA bases shift per frame.
    shift = jnp.arange(f, dtype=jnp.int32) * frame_rows
    bases = (bases + shift[:, None]).reshape(-1)
    meta2 = metas.reshape(f * nc, 8, metas.shape[3])
    img3 = _unpack_image_pallas_v5.__wrapped__(
        p32s.reshape(-1, 128),
        bases,
        meta2,
        num_chunks=f * nc,
        txp=txp,
        tr_sub=tr_sub,
        tx=tx,
        rows=rows,
        sub_rows=sub_rows,
        nfields=nfields,
        interpret=interpret,
    )
    rows_frame = img3.shape[0] // f
    img = img3.reshape(f, rows_frame, txp * 64)
    return img[:, :height, :width]


def prepare_modern_light(
    payload: np.ndarray,
    width: int,
    height: int,
    window: np.ndarray | None = None,
):
    """Minimal host prep for the v6 device-prep path.

    Runs only the format's serial scans + validation; returns
    (p32, bits, refs, ty, tx, spans) where p32 is the payload as int32
    words, bucketed to PAYLOAD_BUCKET_ROWS (zero-copy from `window` when it
    covers the bucket) and spans = (rows, sub_rows, nfields): the bucketed
    content spans for the kernel's static window sizes plus the static
    field-pass count (v5_required_fields) for this frame's classes.
    """
    from . import numpy_ref as R
    from .native import decode_metadata_stream, length_segments2
    from ..errors import DecodeError

    payload = np.asarray(payload, dtype=np.uint8)
    n = len(payload)
    enc_w, enc_h, bits_off, refs_off = R.read_metadata_header(payload)
    if bits_off > n or refs_off > n:
        raise DecodeError("metadata offsets out of bounds")
    if enc_w % T.MODERN_BLOCK != 0:
        raise DecodeError("encoded width not a multiple of 64")
    if enc_w < width:
        raise DecodeError("encoded width smaller than width")

    bits, _ = decode_metadata_stream(payload, bits_off)
    refs, _ = decode_metadata_stream(payload, refs_off)
    ty, tx, nblk = R.modern_block_geometry(enc_w, enc_h)
    if len(bits) < nblk or len(refs) < nblk:
        raise DecodeError("metadata streams shorter than block count")
    bits, refs = bits[:nblk], refs[:nblk]
    geo = _v5_indices(ty, tx)
    native_seg = length_segments2(bits, geo["tr_sub"] * 4 * tx)
    if native_seg is not None:
        total, seg, mask = native_seg
        spans = _spans_from_segments(seg, ty, tx)
        nf = v5_required_fields_mask(mask)
    else:
        # mode='clip' == the codec's bits<=16 clamp (RawData.cpp:424-458).
        lengths = T.MODERN_BLOCK_LENGTH.take(bits, mode="clip")
        total = int(lengths.sum(dtype=np.int64))
        spans = _spans_from_lengths(lengths, ty, tx)
        nf = v5_required_fields(bits)
    spans = spans + (nf,)
    if 16 + total > n:
        raise DecodeError("main data truncated")

    # Bucket includes the kernel's worst-case last-chunk DMA overhang so the
    # device consumes the buffer as-is (no pad copy anywhere).
    span = (v5_chunk_span_rows(ty, tx) + 8) * 512
    # The device-prep permutation matmuls are exact only while word offsets
    # stay below 2^24 (fp32 integer range); past that (payload >= 64 MiB)
    # callers must use the integer host-prep path (prepare_chunked_v5).
    if n >= V6_MAX_PAYLOAD:
        raise DecodeError(
            "payload too large for the v6 device-prep path (>= 64 MiB); "
            "use the host-prep (v5) path"
        )

    bucket = PAYLOAD_BUCKET_ROWS * 512
    need = n + span
    need += (-need) % bucket
    p32 = U.pad_or_window(payload, need, window).view("<i4")
    return p32, bits, refs, ty, tx, spans


def _unpack_kernel_v2(
    base_ref,  # scalar prefetch: (num_chunks,) int32 chunk base row
    meta_ref,  # (1, 8, B) int32: row 0 = word offsets, 1 = class, 2 = refs
    tables_ref,  # (2*ncls, 128) int32 packed field descriptors
    payload_ref,  # HBM (P32/128, 128) int32
    out_ref,  # (B, 64) uint16
    scratch_ref,  # VMEM (2, rows, 128) int32
    sems,  # DMA semaphores (2,)
    rows: int = None,
):
    """Table-gather variant: no per-class unpack code at all. Field byte
    positions/shifts/masks come from packed per-class tables; one lane
    select per class row, then per-lane dynamic gathers fetch the bytes."""
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
    offs_col = jnp.transpose(meta[0:1, :], (1, 0))  # (B, 1) word offsets
    cls_col = jnp.transpose(meta[1:2, :], (1, 0))
    refs_col = jnp.transpose(meta[2:3, :], (1, 0))
    rel = offs_col - base_row * 128
    q = rel >> 7

    ncls = len(T.MODERN_CLASSES)

    def table_select(t):
        out = None
        for ci in range(ncls):
            row = tables_ref[t * ncls + ci : t * ncls + ci + 1, :]
            contrib = jnp.where(cls_col == ci, row, 0)
            out = contrib if out is None else out | contrib
        return out  # (B, 128)

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
    )

    def pick(oh):
        p = jnp.dot(oh, planes, preferred_element_type=jnp.float32).astype(jnp.int32)
        return (
            p[:, 0:128]
            | (p[:, 128:256] << 8)
            | (p[:, 256:384] << 16)
            | (p[:, 384:512] << 24)
        )

    row0 = pick(oh0)
    row1 = pick(oh1)

    def fields(t):
        """Fetch + extract the packed fields described by table row t."""
        desc = table_select(t)  # (B, 128)
        pos = desc & 127
        rsh = (desc >> 7) & 7
        mask = (1 << ((desc >> 10) & 31)) - 1
        lsh = (desc >> 15) & 15
        widx = rel + (pos >> 2) - (q << 7)  # word within the fetched row pair
        in0 = widx < 128
        w0 = jnp.take_along_axis(row0, jnp.where(in0, widx, 0), axis=1)
        w1 = jnp.take_along_axis(row1, jnp.where(in0, 0, widx - 128), axis=1)
        word = jnp.where(in0, w0, w1)
        byt = jax.lax.shift_right_logical(word, 8 * (pos & 3)) & 0xFF
        return ((byt >> rsh) & mask) << lsh

    fa = fields(0)  # fields 0 (lanes 0..63) and 1 (lanes 64..127)
    fb = fields(1)  # field 2 (lanes 0..63)
    vals = fa[:, 0:64] | fa[:, 64:128] | fb[:, 0:64]
    out_ref[:] = ((vals + refs_col) & 0xFFFF).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("num_chunks", "interpret"))
def _unpack_blocks_pallas_v2(
    payload2d: jnp.ndarray,
    base_rows: jnp.ndarray,
    meta: jnp.ndarray,
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed field tables
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, 64), lambda i, base: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tables = jnp.asarray(_MODERN_TABLES.reshape(-1, 128))
    return pl.pallas_call(
        functools.partial(_unpack_kernel_v2, rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_chunks * b, 64), jnp.uint16),
        interpret=interpret,
    )(base_rows, meta, tables, payload2d)




def prepare_chunked(plan: U.ModernPlan):
    """Reshape a ModernPlan's arrays into the kernel's chunked layout."""
    n = len(plan.offsets)
    b = BLOCKS_PER_CHUNK
    num_chunks = max(1, -(-n // b))
    pad_n = num_chunks * b

    offs_w = np.zeros(pad_n, dtype=np.int32)
    offs_w[:n] = plan.offsets // 4  # word offsets (8-byte aligned -> even)
    offs_w[n:] = offs_w[n - 1] if n else 0
    cls = np.zeros(pad_n, dtype=np.int32)
    cls[:n] = plan.cls
    refs = np.zeros(pad_n, dtype=np.int32)
    refs[:n] = plan.refs

    base_rows = (offs_w.reshape(num_chunks, b)[:, 0] // 128).astype(np.int32)

    # Metadata rows packed 8-deep so the VMEM block shape is (8, B)-aligned.
    meta = np.zeros((num_chunks, 8, b), dtype=np.int32)
    meta[:, 0] = offs_w.reshape(num_chunks, b)
    meta[:, 1] = cls.reshape(num_chunks, b)
    meta[:, 2] = refs.reshape(num_chunks, b)

    # Pad payload so every chunk's span-rows DMA window exists. Skip the
    # 15MB copy when the plan's buffer is already large enough (prepare_modern
    # over-pads for this when targeting the Pallas kernel).
    pay = plan.payload
    rows_needed = int(base_rows[-1]) + _span_rows(b)
    total = max(rows_needed * 512, len(pay))
    total += (-total) % 512
    if len(pay) >= total:
        padded = pay[: len(pay) - (len(pay) % 512)]  # zero-copy view
    else:
        padded = np.zeros(total, dtype=np.uint8)
        padded[: len(pay)] = pay
    payload2d = np.ascontiguousarray(padded).view("<i4").reshape(-1, 128)

    return payload2d, base_rows, meta, num_chunks, n


def decode_modern_pallas(
    payload: np.ndarray, width: int, height: int, interpret: bool = False
):
    """Full modern decode with the Pallas unpack kernel + XLA epilogue."""
    plan = U.prepare_modern(payload, width, height)
    payload2d, base_rows, meta, num_chunks, n = prepare_chunked_v4(plan)
    vals = _unpack_blocks_pallas_v4(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        interpret=interpret,
    )[:n]
    img = _deinterleave_packed(vals, plan.tiles_y, plan.tiles_x)
    return img[: plan.height, : plan.width]


def stack_chunked(plans: list) -> tuple:
    """Concatenate same-geometry frames into one kernel launch.

    The kernel's grid is just chunks-at-absolute-offsets, so a batch of F
    frames is a single launch with F x num_chunks chunks whose base rows and
    word offsets are shifted by each frame's payload position. Returns
    (payload2d, base_rows, meta, num_chunks_total, blocks_per_frame).
    """
    chunked = [prepare_chunked_v4(p) for p in plans]
    nc = chunked[0][3]
    n = chunked[0][4]
    if any(c[3] != nc or c[4] != n for c in chunked):
        raise ValueError("frames in a batch must share geometry")

    row_starts = []
    total_rows = 0
    for p2d, *_ in chunked:
        row_starts.append(total_rows)
        total_rows += p2d.shape[0]
    payload2d = np.concatenate([c[0] for c in chunked], axis=0)

    base_rows = np.concatenate(
        [c[1] + rs for c, rs in zip(chunked, row_starts)]
    ).astype(np.int32)
    metas = []
    for c, rs in zip(chunked, row_starts):
        m = c[2].copy()
        m[:, 0] += rs * 128  # word offsets shift with the payload rows
        metas.append(m)
    meta = np.concatenate(metas, axis=0)
    return payload2d, base_rows, meta, nc * len(plans), n


def decode_modern_pallas_batch(plans: list, interpret: bool = False):
    """(F, H, W) uint16 from same-geometry ModernPlans in ONE kernel launch."""
    payload2d, base_rows, meta, num_chunks, n = stack_chunked(plans)
    p = plans[0]
    b = meta.shape[2]
    vals = _unpack_blocks_pallas_v4(
        jnp.asarray(payload2d),
        jnp.asarray(base_rows),
        jnp.asarray(meta),
        num_chunks=num_chunks,
        interpret=interpret,
    )
    per_frame = num_chunks // len(plans) * b
    vals = vals.reshape(len(plans), per_frame, 64)[:, :n]
    img = jax.vmap(
        lambda v: _deinterleave_packed.__wrapped__(v, p.tiles_y, p.tiles_x)
    )(vals)
    return img[:, : p.height, : p.width]


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x"))
def _deinterleave_packed(vals: jnp.ndarray, tiles_y: int, tiles_x: int):
    """Bayer de-interleave via int32 packing (refs already added).

    Packing the even/odd column pair into one int32 and bitcasting to uint16
    turns the parity interleave (a minor-dim-2 transpose, slow on TPU) into
    integer ops; the remaining transpose keeps a 32-lane minor dim.
    """
    v = vals.astype(jnp.int32).reshape(tiles_y, tiles_x, 2, 2, 2, 32)
    even = v[:, :, :, 0]  # (ty, tx, q, h, k)
    odd = v[:, :, :, 1]
    packed = even | (odd << 16)
    packed = packed.transpose(0, 3, 2, 1, 4)  # (ty, h, q, tx, k)
    u16 = jax.lax.bitcast_convert_type(packed, jnp.uint16)  # (..., 2)
    return u16.reshape(tiles_y * 4, tiles_x * 64)
