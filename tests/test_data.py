"""Data pipeline tests: record format round-trip, dataset decode, prepare_data
conversion, loader batching."""

import os

import numpy as np
import pytest

from maua_tpu.data import (
    DataLoader,
    MultiResolutionRecordDataset,
    RecordShardReader,
    RecordShardWriter,
    prepare_data,
)


def test_record_shard_roundtrip(tmp_path):
    p = str(tmp_path / "x-64-0000.mrec")
    blobs = [bytes([i]) * (i + 1) for i in range(10)]
    with RecordShardWriter(p) as w:
        for b in blobs:
            w.append(b)
    r = RecordShardReader(p)
    assert len(r) == 10
    for i, b in enumerate(blobs):
        assert r.get(i) == b


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    import cv2

    folder = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(folder / f"img_{i}.png"), img)
    return str(folder)


def test_prepare_data_and_dataset(image_folder, tmp_path):
    out = str(tmp_path / "shards")
    n = prepare_data(image_folder, out, sizes=(32, 64), n_workers=1, shard_size=4)
    assert n == 6

    ds = MultiResolutionRecordDataset(out, resolution=32)
    assert len(ds) == 6
    img = ds[0]
    assert img.shape == (3, 32, 32)
    assert img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0

    ds64 = MultiResolutionRecordDataset(out, resolution=64)
    assert ds64[3].shape == (3, 64, 64)


def test_corrupt_record_retry(tmp_path):
    p = str(tmp_path / "bad-16-0000.mrec")
    import cv2

    good = cv2.imencode(".jpg", np.zeros((16, 16, 3), np.uint8))[1].tobytes()
    with RecordShardWriter(p) as w:
        w.append(b"not a jpeg")
        w.append(good)
    ds = MultiResolutionRecordDataset(str(tmp_path), resolution=16)
    img = ds[0]  # retries onto the good record
    assert img.shape == (3, 16, 16)


def test_loader_superbatch_shape(image_folder, tmp_path):
    out = str(tmp_path / "shards")
    prepare_data(image_folder, out, sizes=(32,), n_workers=1)
    ds = MultiResolutionRecordDataset(out, resolution=32)
    dl = DataLoader(ds, batch_size=2, num_accumulate=2, num_workers=2, prefetch=1)
    batch = next(dl)
    assert batch.shape == (2, 2, 3, 32, 32)
    dl.close()


def test_loader_uint8_pipeline(image_folder, tmp_path):
    """uint8_hwc mode ships [A, B, H, W, 3] uint8 straight from the decoder
    (device-side normalization in train/step.py), and its pixels match the
    fp32 CHW path exactly under the host formula x/127.5 - 1."""
    out = str(tmp_path / "shards")
    prepare_data(image_folder, out, sizes=(32,), n_workers=1)
    ds8 = MultiResolutionRecordDataset(out, resolution=32, uint8_hwc=True)
    img8 = ds8[0]
    assert img8.dtype == np.uint8 and img8.shape == (32, 32, 3)
    dsf = MultiResolutionRecordDataset(out, resolution=32)
    np.testing.assert_allclose(
        img8.transpose(2, 0, 1).astype(np.float32) / 127.5 - 1.0, dsf[0], atol=1e-6
    )

    dl = DataLoader(ds8, batch_size=2, num_accumulate=2, num_workers=2, prefetch=1)
    batch = next(dl)
    assert batch.dtype == np.uint8
    assert batch.shape == (2, 2, 32, 32, 3)
    dl.close()


def test_raw_records_roundtrip_and_fast_path(image_folder, tmp_path):
    """v2 raw shards: prepare --format raw produces bit-identical pixels to
    decoding the same source with OpenCV, dataset __getitem__ is the
    zero-decode mmap path, and reencode_raw converts existing JPEG shards
    (pixels match a decode of the original JPEG records exactly)."""
    import cv2

    from maua_tpu.data.prepare import reencode_raw

    out_raw = str(tmp_path / "raw")
    n = prepare_data(image_folder, out_raw, sizes=(32,), n_workers=1, fmt="raw")
    assert n == 6

    ds = MultiResolutionRecordDataset(out_raw, resolution=32, uint8_hwc=True)
    assert len(ds) == 6
    img = ds[0]
    assert img.dtype == np.uint8 and img.shape == (32, 32, 3)

    # same source through the independent reference pipeline
    from maua_tpu.data.prepare import _center_crop_resize, _list_images

    src = cv2.imread(_list_images(image_folder)[0], cv2.IMREAD_COLOR)
    want = cv2.cvtColor(_center_crop_resize(src, 32), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(np.asarray(img), want)

    # float path off raw shards matches uint8/127.5-1
    dsf = MultiResolutionRecordDataset(out_raw, resolution=32)
    np.testing.assert_allclose(
        np.asarray(img).transpose(2, 0, 1).astype(np.float32) / 127.5 - 1.0,
        dsf[0], atol=1e-6,
    )

    # loader integration: uint8 HWC superbatch straight off the mmap
    dl = DataLoader(ds, batch_size=2, num_accumulate=2, num_workers=2, prefetch=1)
    batch = next(dl)
    assert batch.dtype == np.uint8 and batch.shape == (2, 2, 32, 32, 3)
    dl.close()

    # reencode existing JPEG shards -> raw; pixels equal decoding the JPEGs
    out_jpg = str(tmp_path / "jpg")
    prepare_data(image_folder, out_jpg, sizes=(32,), n_workers=1)
    out_conv = str(tmp_path / "conv")
    assert reencode_raw(out_jpg, out_conv, 32) == 6
    ds_jpg = MultiResolutionRecordDataset(out_jpg, resolution=32, uint8_hwc=True)
    ds_conv = MultiResolutionRecordDataset(out_conv, resolution=32, uint8_hwc=True)
    for i in range(6):
        np.testing.assert_array_equal(np.asarray(ds_conv[i]), np.asarray(ds_jpg[i]))


def test_raw_record_writer_validates(tmp_path):
    with pytest.raises(ValueError):
        RecordShardWriter(str(tmp_path / "x-8-0000.mrec"), fmt="raw")  # no side
    w = RecordShardWriter(str(tmp_path / "y-8-0000.mrec"), fmt="raw", side=8)
    with pytest.raises(ValueError):
        w.append(np.zeros((4, 4, 3), np.uint8))  # wrong size


def test_synthetic_dataset_generator(tmp_path):
    """maua_tpu.data.synthetic: reproducible structured samples -> shards the
    loader consumes (the data source behind the PARITY.md chip artifacts)."""
    from maua_tpu.data.synthetic import synth_image, write_synth_shards

    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a, b = synth_image(rng1, 32), synth_image(rng2, 32)
    np.testing.assert_array_equal(a, b)  # seeded => reproducible
    assert a.dtype == np.uint8 and a.shape == (32, 32, 3)
    assert a.std() > 5  # actual structure, not a constant field

    out = str(tmp_path / "synth")
    assert write_synth_shards(out, size=32, n=5, fmt="raw", seed=1, shard_size=3) == 5
    ds = MultiResolutionRecordDataset(out, resolution=32, uint8_hwc=True)
    assert len(ds) == 5 and np.asarray(ds[4]).shape == (32, 32, 3)
