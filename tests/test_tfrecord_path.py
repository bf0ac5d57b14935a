"""TFRecord input path: write reference-format records with TF, parse
with our pipeline (the TPU training data path, reference dataset.py
TFRecordDatasetOp + ParsePairExampleOp)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from joshupscale_tpu.data import create_dataset  # noqa: E402


@pytest.fixture(scope="module")
def tfrecord(tmp_path_factory):
    """Two sequences of 10 (input, target) PNG pairs."""
    path = str(tmp_path_factory.mktemp("rec") / "data.tfrecord")
    rng = np.random.default_rng(0)
    with tf.io.TFRecordWriter(path) as writer:
        for _ in range(2):
            lr = [tf.io.encode_png(
                rng.integers(0, 256, (16, 24, 3), np.uint8)).numpy()
                for _ in range(10)]
            hr = [tf.io.encode_png(
                rng.integers(0, 256, (64, 96, 3), np.uint8)).numpy()
                for _ in range(10)]
            ex = tf.train.Example(features=tf.train.Features(feature={
                "input": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=lr)),
                "target": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=hr)),
            }))
            writer.write(ex.SerializeToString())
    return path


def test_tfrecord_pair_pipeline(tfrecord):
    config = [
        {"name": "TFRecordDatasetOp", "path": tfrecord},
        {"name": "ParsePairExampleOp"},
        {"name": "RandomCropOp", "crop_size": 8, "num_img": 2},
        {"name": "NormalizeOp", "crop_size": 8},
    ]
    items = list(create_dataset(config))
    assert len(items) == 4
    assert items[0]["input"].shape == (10, 8, 8, 3)
    assert items[0]["target"].shape == (10, 32, 32, 3)


def test_tfrecord_single_example(tmp_path):
    """HR-only records: LR derived by nearest x1/4 subsampling."""
    path = str(tmp_path / "single.tfrecord")
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (32, 48, 3), np.uint8)
              for _ in range(10)]
    with tf.io.TFRecordWriter(path) as writer:
        ex = tf.train.Example(features=tf.train.Features(feature={
            "images": tf.train.Feature(bytes_list=tf.train.BytesList(
                value=[tf.io.encode_png(f).numpy() for f in frames])),
        }))
        writer.write(ex.SerializeToString())

    config = [
        {"name": "TFRecordDatasetOp", "path": path},
        {"name": "ParseSingleExampleOp"},
    ]
    item = next(iter(create_dataset(config)))
    assert item["target"].shape == (10, 32, 48, 3)
    assert item["input"].shape == (10, 8, 12, 3)
    # Nearest x1/4 on the TF1 legacy grid == plain ::4 subsampling.
    np.testing.assert_array_equal(item["input"][0], frames[0][::4, ::4])
