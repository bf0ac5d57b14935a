"""Self-contained TFRecord codec: round-trips + tensorflow interop.

The reference's training data is TFRecord files of tf.train.Example
protos (reference scripts/training/dataset.py:50-68, :194-216).
data/tfrecord.py makes those readable/writable with no tensorflow;
these tests pin the wire format against tensorflow itself when it is
installed.
"""

import numpy as np
import pytest

from joshupscale_tpu.data import tfrecord as tfr
from joshupscale_tpu.data.pipeline import (
    ParsePairExampleOp,
    TFRecordDatasetOp,
)

try:
    import tensorflow as tf
except ImportError:  # pragma: no cover - tf is present in CI image
    tf = None

needs_tf = pytest.mark.skipif(tf is None, reason="tensorflow not installed")


def test_crc32c_known_answer():
    # RFC 3720 test vector for CRC32C.
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"") == 0


def test_record_roundtrip(tmp_path):
    recs = [b"hello", b"", bytes(range(256)) * 7]
    path = str(tmp_path / "x.tfrecords")
    assert tfr.write_records(path, recs) == 3
    assert list(tfr.read_records(path, verify=True)) == recs


def test_corrupt_payload_detected(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    tfr.write_records(path, [b"payload-bytes"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        list(tfr.read_records(path, verify=True))
    # unverified read returns the (corrupt) payload without raising
    assert len(list(tfr.read_records(path))) == 1


def test_example_roundtrip():
    feats = {
        "b": [b"x", b"yz", b""],
        "f": [1.5, -2.25, 0.0],
        "i": [3, -4, 1 << 40],
    }
    out = tfr.decode_example(tfr.encode_example(feats))
    assert out["b"] == feats["b"]
    np.testing.assert_array_equal(out["f"], feats["f"])
    assert out["i"] == feats["i"]


def test_example_empty_list_kinds():
    """Empty lists need an explicit kind to land in the right oneof
    (tf.io parsing rejects a string feature that arrives as an
    int64_list); numpy scalar values must dispatch by dtype, not
    Python type."""
    buf = tfr.encode_example(
        {"b": [], "f": [], "i": [], "nf": [np.float32(1.5)],
         "ni": [np.int64(7)]},
        kinds={"b": "bytes", "f": "float"})
    out = tfr.decode_example(buf)
    assert out["b"] == []
    np.testing.assert_array_equal(out["f"], [])
    assert out["i"] == []
    np.testing.assert_array_equal(out["nf"], [1.5])
    assert out["ni"] == [7]
    if tf is not None:
        ex = tf.train.Example()
        ex.ParseFromString(buf)
        assert ex.features.feature["b"].WhichOneof("kind") == "bytes_list"
        assert ex.features.feature["f"].WhichOneof("kind") == "float_list"
        assert ex.features.feature["nf"].WhichOneof("kind") == "float_list"


def test_parse_fixed_len_validates():
    buf = tfr.encode_example({"images": [b"a", b"b"]})
    assert tfr.parse_fixed_len(buf, {"images": 2})["images"] == [b"a", b"b"]
    with pytest.raises(ValueError):
        tfr.parse_fixed_len(buf, {"images": 10})
    with pytest.raises(KeyError):
        tfr.parse_fixed_len(buf, {"input": 2})


@needs_tf
def test_tensorflow_reads_our_file(tmp_path):
    path = str(tmp_path / "ours.tfrecords")
    recs = [tfr.encode_example({"b": [b"data" * 100], "i": [7, -7]}),
            b"raw-record"]
    tfr.write_records(path, recs)
    got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(path)]
    assert got == recs
    parsed = tf.io.parse_single_example(got[0], {
        "b": tf.io.FixedLenFeature([1], tf.string),
        "i": tf.io.FixedLenFeature([2], tf.int64),
    })
    assert bytes(parsed["b"].numpy()[0]) == b"data" * 100
    assert list(parsed["i"].numpy()) == [7, -7]


@needs_tf
def test_we_read_tensorflows_file(tmp_path):
    path = str(tmp_path / "theirs.tfrecords")
    example = tf.train.Example(features=tf.train.Features(feature={
        "images": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"p1", b"p2"])),
        "f": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.5, -1.0])),
        "i": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[-1, 2])),
    }))
    with tf.io.TFRecordWriter(path) as w:
        w.write(example.SerializeToString())
    recs = list(tfr.read_records(path, verify=True))
    assert len(recs) == 1
    out = tfr.decode_example(recs[0])
    assert out["images"] == [b"p1", b"p2"]
    np.testing.assert_array_equal(out["f"], [0.5, -1.0])
    assert out["i"] == [-1, 2]


def _pair_tfrecord(tmp_path, n_seq=2, size=16):
    """Tiny pair-example file via the pure-python writer + cv2 PNGs."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    path = str(tmp_path / "pairs.tfrecords")

    def png(img):
        return cv2.imencode(".png", img)[1].tobytes()

    recs = []
    for _ in range(n_seq):
        hr = rng.integers(0, 256, (10, size * 4, size * 4, 3), np.uint8)
        recs.append(tfr.encode_example({
            "input": [png(f[::4, ::4]) for f in hr],
            "target": [png(f) for f in hr],
        }))
    tfr.write_records(path, recs)
    return path


def test_pipeline_pure_python_path(tmp_path):
    """TFRecordDatasetOp + ParsePairExampleOp with pure_python: true."""
    path = _pair_tfrecord(tmp_path)
    stream = TFRecordDatasetOp("src", path=path, pure_python=True)(None)
    stream = ParsePairExampleOp("parse", pure_python=True)(stream)
    items = list(stream)
    assert len(items) == 2
    assert items[0]["input"].shape == (10, 16, 16, 3)
    assert items[0]["target"].shape == (10, 64, 64, 3)


@needs_tf
def test_pipeline_pure_python_matches_tf(tmp_path):
    path = _pair_tfrecord(tmp_path)

    def run(pure):
        stream = TFRecordDatasetOp("src", path=path, pure_python=pure)(None)
        stream = ParsePairExampleOp("parse", pure_python=pure)(stream)
        return list(stream)

    for ours, theirs in zip(run(True), run(False)):
        np.testing.assert_array_equal(ours["input"], theirs["input"])
        np.testing.assert_array_equal(ours["target"], theirs["target"])
