"""Codec correctness: round-trip, per-bit-width coverage, and differential
parity against the compiled C++ reference decoder (the gold standard —
SURVEY.md §4 items 1 and 3)."""

import numpy as np
import pytest

from mcraw import encode as E
from mcraw.errors import DecodeError
from mcraw.kernels import numpy_ref as R
from mcraw.kernels import tables as T


def _payload_modern(img, **kw):
    return np.frombuffer(E.encode_modern(img, **kw), dtype=np.uint8)


def _payload_legacy(img, **kw):
    return np.frombuffer(E.encode_legacy(img, **kw), dtype=np.uint8)


class TestTables:
    def test_field_masks_disjoint(self):
        """Each output value's fields must cover disjoint bit ranges."""
        for fields, block in ((T.MODERN_FIELDS, 64), (T.LEGACY_FIELDS, 16)):
            for cls, per_out in fields.items():
                for j in range(block):
                    covered = 0
                    for _, _, msk, lsh in per_out[j]:
                        bits = msk << lsh
                        assert covered & bits == 0, (cls, j)
                        covered |= bits

    def test_field_width_matches_class(self):
        """Output values of class c must cover exactly c bits (c<=10)."""
        for fields in (T.MODERN_FIELDS, T.LEGACY_FIELDS):
            for cls, per_out in fields.items():
                if cls in (0, 16):
                    continue
                for j, fl in enumerate(per_out):
                    covered = 0
                    for _, _, msk, lsh in fl:
                        covered |= msk << lsh
                    # legacy class 9's first output uses the whole first byte
                    # unmasked ((*input) << 1), giving 9 covered bits
                    assert covered == (1 << cls) - 1, (cls, j, bin(covered))

    def test_source_bits_disjoint_within_block(self):
        """No payload bit feeds two outputs (layouts are permutations)."""
        for fields, maxlen in (
            (T.MODERN_FIELDS, T.MODERN_MAX_LENGTH),
            (T.LEGACY_FIELDS, T.LEGACY_MAX_LENGTH),
        ):
            for cls, per_out in fields.items():
                used = np.zeros(maxlen, dtype=np.int64)
                for fl in per_out:
                    for pos, rsh, msk, _ in fl:
                        bits = (msk << rsh) & 0xFF
                        assert used[pos] & bits == 0, (cls, pos)
                        used[pos] |= bits


@pytest.mark.parametrize("bits", range(17))
def test_modern_bitwidth_roundtrip(rng, bits):
    lo = 0 if bits == 0 else 1 << (bits - 1)
    img = rng.integers(lo, 1 << bits, size=(8, 128), dtype=np.uint16)
    assert np.array_equal(R.decode_modern(_payload_modern(img), 128, 8), img)


@pytest.mark.parametrize("bits", range(17))
def test_legacy_bitwidth_roundtrip(rng, bits):
    lo = 0 if bits == 0 else 1 << (bits - 1)
    img = rng.integers(lo, 1 << bits, size=(4, 64), dtype=np.uint16)
    assert np.array_equal(R.decode_legacy(_payload_legacy(img), 64, 4), img)


def test_modern_width_crop(rng):
    """encodedWidth > width: rows assembled at encoded width then cropped
    (RawData.cpp:598-608)."""
    img = rng.integers(0, 4096, size=(8, 100), dtype=np.uint16)
    payload = _payload_modern(img, encoded_width=192)
    assert np.array_equal(R.decode_modern(payload, 100, 8), img)


def test_modern_height_not_multiple_of_4(rng):
    """encodedHeight % 4 != 0: the decoder processes whole 4-row tiles and
    crops (the reference writes the full tiles past `height`,
    RawData.cpp:571-609)."""
    img = rng.integers(0, 4096, size=(10, 64), dtype=np.uint16)
    payload = _payload_modern(img)
    assert int(np.frombuffer(payload[4:8].tobytes(), "<u4")[0]) == 10
    assert np.array_equal(R.decode_modern(payload, 64, 10), img)


def test_modern_encoded_height_exceeds_height(rng):
    """encodedHeight > height: extra tile rows decoded then cropped."""
    img = rng.integers(0, 4096, size=(8, 64), dtype=np.uint16)
    payload = _payload_modern(img, encoded_height=16)
    assert np.array_equal(R.decode_modern(payload, 64, 8), img)


def test_modern_encoded_both_dims_exceed(rng):
    img = rng.integers(0, 4096, size=(6, 90), dtype=np.uint16)
    payload = _payload_modern(img, encoded_width=192, encoded_height=11)
    assert np.array_equal(R.decode_modern(payload, 90, 6), img)


def test_modern_rejects_bad_geometry(rng):
    img = rng.integers(0, 4096, size=(8, 64), dtype=np.uint16)
    payload = _payload_modern(img)
    with pytest.raises(DecodeError):
        R.decode_modern(payload, 128, 8)  # width > encodedWidth
    bad = payload.copy()
    bad[8:12] = np.frombuffer(np.uint32(1 << 30).tobytes(), np.uint8)
    with pytest.raises(DecodeError):
        R.decode_modern(bad, 64, 8)  # bitsOffset > len


def test_modern_truncated_payload_raises(rng):
    img = rng.integers(0, 65536, size=(8, 64), dtype=np.uint16)
    payload = _payload_modern(img)
    with pytest.raises(DecodeError):
        R.decode_modern(payload[: len(payload) // 2], 64, 8)


def test_legacy_padded_width(rng):
    img = rng.integers(0, 1024, size=(5, 50), dtype=np.uint16)
    assert np.array_equal(R.decode_legacy(_payload_legacy(img), 50, 5), img)


def test_legacy_chunk_offset_table(rng):
    img = rng.integers(0, 1024, size=(16, 64), dtype=np.uint16)
    payload = _payload_legacy(img, chunk_rows=4, add_offset_table=True)
    offsets = R.legacy_chunk_offsets(payload)
    assert len(offsets) == 3  # rows 4, 8, 12 (row 0 implicit)
    assert np.array_equal(R.decode_legacy(payload, 64, 16), img)
    # chunk offsets are valid resume points: decoding rows 4.. from entry 0
    bits, refs, offs = R.legacy_scan(payload, 12 * 4, start_offset=offsets[-1])
    assert len(bits) == 48


def test_legacy_no_offset_table(rng):
    img = rng.integers(0, 1024, size=(4, 32), dtype=np.uint16)
    payload = _payload_legacy(img, add_offset_table=False)
    assert np.array_equal(R.decode_legacy(payload, 32, 4), img)


def test_legacy_truncated_raises(rng):
    img = rng.integers(0, 65536, size=(4, 32), dtype=np.uint16)
    payload = _payload_legacy(img, add_offset_table=False)
    with pytest.raises(DecodeError):
        R.decode_legacy(payload[: len(payload) // 2], 32, 4)


class TestDifferentialVsReference:
    """Encoded payloads must decode identically through the compiled C++
    reference and the NumPy oracle, and equal the source image."""

    def test_modern(self, rng, ref_lib):
        for _ in range(25):
            h = int(4 * rng.integers(1, 9))
            w = int(rng.integers(33, 300))
            maxv = int(rng.choice([1, 3, 15, 255, 1023, 4095, 16383, 65535]))
            img = rng.integers(0, maxv + 1, size=(h, w), dtype=np.uint16)
            payload = _payload_modern(img)
            n, ref_out = ref_lib.ref_decode(payload, w, h)
            assert n > 0
            mine = R.decode_modern(payload, w, h)
            assert np.array_equal(ref_out[:h], mine)
            assert np.array_equal(mine, img)

    def test_legacy(self, rng, ref_lib):
        for _ in range(25):
            h = int(rng.integers(1, 24))
            w = int(rng.integers(16, 300))
            maxv = int(rng.choice([1, 3, 15, 255, 1023, 4095, 16383, 65535]))
            img = rng.integers(0, maxv + 1, size=(h, w), dtype=np.uint16)
            payload = _payload_legacy(img)
            n, ref_out = ref_lib.ref_decode_legacy(payload, w, h)
            assert n == h * w
            mine = R.decode_legacy(payload, w, h)
            assert np.array_equal(ref_out, mine)
            assert np.array_equal(mine, img)

    def test_modern_irregular_heights(self, rng, ref_lib):
        """height % 4 != 0 and encodedHeight/Width > height/width: the
        reference writes whole 4-row tiles regardless of `height`
        (RawData.cpp:571-609) — ref_shim over-allocates for that, so the
        differential runs where the raw reference API would overrun a
        height-sized buffer."""
        cases = [
            dict(h=10, w=64),
            dict(h=7, w=100),
            dict(h=8, w=64, encoded_height=16),
            dict(h=6, w=90, encoded_width=192, encoded_height=11),
        ]
        for c in cases:
            h, w = c.pop("h"), c.pop("w")
            img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
            payload = _payload_modern(img, **c)
            n, ref_out = ref_lib.ref_decode(payload, w, h)
            assert n > 0
            mine = R.decode_modern(payload, w, h)
            assert np.array_equal(ref_out[:h], mine), c
            assert np.array_equal(mine, img), c

    def test_modern_mixed_content(self, rng, ref_lib):
        """Gradients + flat + noise regions exercise mixed bit widths."""
        h, w = 32, 256
        img = np.zeros((h, w), dtype=np.uint16)
        img[:, :64] = 512  # flat -> 0 bits
        img[:, 64:128] = (np.arange(64) * 16).astype(np.uint16)  # gradient
        img[:, 128:] = rng.integers(0, 4096, size=(h, 128))  # noise
        payload = _payload_modern(img)
        n, ref_out = ref_lib.ref_decode(payload, w, h)
        assert n > 0
        mine = R.decode_modern(payload, w, h)
        assert np.array_equal(ref_out[:h], mine)
        assert np.array_equal(mine, img)
