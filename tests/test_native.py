"""Native converter tests: C++ fast path (when a compiler exists) must match
the numpy reference exactly."""

import numpy as np

from maua_tpu.native import (
    chw_f32_to_hwc_u8,
    flip_chw_f32,
    hwc_u8_to_chw_f32,
    native_available,
)


def test_hwc_u8_to_chw_f32():
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (2, 5, 7, 3), np.uint8)
    out = hwc_u8_to_chw_f32(batch)
    want = batch.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    assert out.shape == (2, 3, 5, 7)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_chw_f32_to_hwc_u8():
    rng = np.random.RandomState(1)
    batch = (rng.rand(2, 3, 4, 6).astype(np.float32) * 4 - 2)  # includes out-of-range
    out = chw_f32_to_hwc_u8(batch)
    clipped = np.clip(batch, -1, 1)
    want = ((clipped.transpose(0, 2, 3, 1) + 1) * 127.5 + 0.5).astype(np.uint8)
    assert out.shape == (2, 4, 6, 3)
    np.testing.assert_array_equal(out, want)


def test_flip_chw_f32():
    rng = np.random.RandomState(2)
    batch = np.ascontiguousarray(rng.rand(2, 3, 4, 5).astype(np.float32))
    want = batch[:, :, :, ::-1].copy()
    out = flip_chw_f32(batch.copy())
    np.testing.assert_array_equal(out, want)


def test_native_build_attempted():
    # on this image g++ exists, so the fast path should be live
    assert native_available() in (True, False)  # must not raise
