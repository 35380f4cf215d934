"""JAX device decode path (CPU backend in tests): must equal the NumPy
oracle bit-for-bit, including the structured vs table-driven unpack forms."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mcraw import encode as E  # noqa: E402
from mcraw.kernels import numpy_ref as R  # noqa: E402
from mcraw.kernels import structured as S  # noqa: E402
from mcraw.kernels import tables as T  # noqa: E402
from mcraw.kernels import unpack as U  # noqa: E402


class TestStructuredEqualsTables:
    def test_modern(self, rng):
        w = jnp.asarray(
            rng.integers(0, 256, size=(64, 128), dtype=np.uint8).astype(np.int32)
        )
        for row, c in enumerate(T.MODERN_CLASSES):
            if c == 0:
                continue
            a = np.asarray(U._class_unpack(w, row, True))
            b = np.asarray(S.MODERN_STRUCTURED[c](w))
            assert np.array_equal(a, b), f"modern class {c}"

    def test_legacy(self, rng):
        w = jnp.asarray(
            rng.integers(0, 256, size=(64, 32), dtype=np.uint8).astype(np.int32)
        )
        for row, c in enumerate(T.LEGACY_CLASSES):
            if c == 0:
                continue
            a = np.asarray(U._class_unpack(w, row, False))
            b = np.asarray(S.LEGACY_STRUCTURED[c](w))
            assert np.array_equal(a, b), f"legacy class {c}"


@pytest.mark.parametrize("maxv", [1, 15, 255, 1023, 4095, 65535])
def test_modern_device_equals_oracle(rng, maxv):
    img = rng.integers(0, maxv + 1, size=(16, 192), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    dev = np.asarray(U.decode_modern(payload, 192, 16))
    assert np.array_equal(dev, R.decode_modern(payload, 192, 16))
    assert np.array_equal(dev, img)


@pytest.mark.parametrize("maxv", [1, 255, 4095, 65535])
def test_legacy_device_equals_oracle(rng, maxv):
    img = rng.integers(0, maxv + 1, size=(8, 96), dtype=np.uint16)
    payload = np.frombuffer(E.encode_legacy(img), dtype=np.uint8)
    dev = np.asarray(U.decode_legacy(payload, 96, 8))
    assert np.array_equal(dev, R.decode_legacy(payload, 96, 8))
    assert np.array_equal(dev, img)


def test_modern_device_mixed_classes(rng):
    h, w = 32, 256
    img = np.zeros((h, w), dtype=np.uint16)
    img[:, :64] = 512
    img[:, 64:128] = (np.arange(64) * 16).astype(np.uint16)
    img[:, 128:] = rng.integers(0, 65536, size=(h, 128))
    payload = np.frombuffer(E.encode_modern(img), dtype=np.uint8)
    assert np.array_equal(np.asarray(U.decode_modern(payload, w, h)), img)


def test_modern_device_cropped_width(rng):
    img = rng.integers(0, 4096, size=(8, 100), dtype=np.uint16)
    payload = np.frombuffer(E.encode_modern(img, encoded_width=192), dtype=np.uint8)
    assert np.array_equal(np.asarray(U.decode_modern(payload, 100, 8)), img)
