"""Golden tests driving the REFERENCE'S OWN dataset pipeline code.

Like test_reference_golden.py (models) and
test_reference_golden_losses.py (losses), these execute the reference
checkout itself: the same op-chain config is fed to the reference's own
``dataset.create_dataset`` (tf.data graph, reference
scripts/training/dataset.py:641-656) and to our NumPy generator
pipeline (``joshupscale_tpu.data.pipeline.create_dataset``), and every
batch is compared elementwise.

Covered (the deterministic op subset -- random-augmentation ops draw
from different RNGs by construction and are oracle-tested elsewhere):

- TFRecordDatasetOp reading a file written by OUR from-scratch codec
  (data/tfrecord.py) -- wire-format interop in the same breath,
- ParsePairExampleOp (10+10 encoded PNGs per example,
  reference :189-204),
- ParseSingleExampleOp (HR-only examples; LR = nearest x1/4 downscale
  through tf.compat.v1.image.resize_nearest_neighbor with
  half_pixel_centers=False, reference :206-226 -- pins our ``::4``
  subsampling equivalence),
- NormalizeOp / RgbToBgrOp / ClipOp (:270-298, :308-317, :430-446),
- FilterFlatOp dropping a genuinely flat sequence (:292-308),
- SingleFrameMapOp window/label/last selection (:454-476),
- BatchOp with drop_remainder semantics (:496-508).
"""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF_TRAINING = "/root/reference/scripts/training"

CROP = 12  # LR crop; HR = 48. Frames are emitted exactly crop-sized so
# the deterministic chain needs no RandomCropOp.


@pytest.fixture(scope="module")
def ref_dataset_mod():
    """Import the reference's dataset.py (its modules import each other
    by plain name, so the path must be on sys.path during import)."""
    sys.path.insert(0, REF_TRAINING)
    try:
        import dataset as ref_dataset  # noqa: F401
    finally:
        sys.path.remove(REF_TRAINING)
    return ref_dataset


def _png(frame: np.ndarray) -> bytes:
    return tf.io.encode_png(tf.constant(frame)).numpy()


@pytest.fixture(scope="module")
def pair_tfrecord(tmp_path_factory):
    """3 pair-examples (10 LR + 10 HR PNGs each); example 1 is FLAT
    (constant pixels) so FilterFlatOp has something to drop.  Written
    with OUR from-scratch TFRecord/Example codec."""
    from joshupscale_tpu.data.tfrecord import encode_example, write_records

    rng = np.random.default_rng(42)
    path = str(tmp_path_factory.mktemp("golden_ds") / "pairs.tfrecord")
    records = []
    for seq in range(3):
        if seq == 1:
            lr = np.full((10, CROP, CROP, 3), 37, np.uint8)
            hr = np.full((10, CROP * 4, CROP * 4, 3), 141, np.uint8)
        else:
            lr = rng.integers(0, 256, (10, CROP, CROP, 3), dtype=np.uint8)
            hr = rng.integers(
                0, 256, (10, CROP * 4, CROP * 4, 3), dtype=np.uint8)
        records.append(encode_example({
            "input": [_png(f) for f in lr],
            "target": [_png(f) for f in hr],
        }))
    write_records(path, records)
    return path


@pytest.fixture(scope="module")
def single_tfrecord(tmp_path_factory):
    """2 HR-only examples (10 PNGs each) for ParseSingleExampleOp."""
    from joshupscale_tpu.data.tfrecord import encode_example, write_records

    rng = np.random.default_rng(7)
    path = str(tmp_path_factory.mktemp("golden_ds1") / "single.tfrecord")
    records = []
    for _ in range(2):
        hr = rng.integers(
            0, 256, (10, CROP * 4, CROP * 4, 3), dtype=np.uint8)
        records.append(encode_example({
            "images": [_png(f) for f in hr],
        }))
    write_records(path, records)
    return path


def _run_reference(ref_dataset_mod, config):
    ds = ref_dataset_mod.create_dataset(config)
    return [
        {k: np.asarray(v) for k, v in batch.items()}
        for batch in ds.as_numpy_iterator()
    ]


def _run_ours(config):
    from joshupscale_tpu.data.pipeline import create_dataset

    return [
        {k: np.asarray(v) for k, v in batch.items()}
        for batch in create_dataset(config)
    ]


def _assert_batches_equal(ref_batches, our_batches):
    assert len(ref_batches) == len(our_batches)
    for i, (rb, ob) in enumerate(zip(ref_batches, our_batches)):
        assert rb.keys() == ob.keys(), i
        for k in rb:
            assert rb[k].shape == ob[k].shape, (i, k)
            np.testing.assert_allclose(
                ob[k], rb[k], atol=1e-6, rtol=0,
                err_msg=f"batch {i} key {k}")


def test_pair_pipeline_matches_reference(ref_dataset_mod, pair_tfrecord):
    """Full deterministic pair chain: parse -> normalize -> bgr ->
    filter-flat -> clip -> single-frame windows -> batch.  The flat
    example must be dropped on BOTH sides; the 2 surviving sequences
    flat-map to 2*7 window elements = 2 full batches of 7."""
    config = [
        {"name": "TFRecordDatasetOp", "path": pair_tfrecord},
        {"name": "ParsePairExampleOp"},
        {"name": "NormalizeOp", "crop_size": CROP},
        {"name": "RgbToBgrOp"},
        {"name": "FilterFlatOp", "threshold": 0.01},
        {"name": "ClipOp", "minval": -0.45, "maxval": 0.45},
        {"name": "SingleFrameMapOp", "flow_frames": 4},
        {"name": "BatchOp", "batch_size": 7},
    ]
    ref_batches = _run_reference(ref_dataset_mod, config)
    our_batches = _run_ours(config)
    assert len(ref_batches) == 2  # flat sequence filtered out
    assert ref_batches[0]["input"].shape == (7, 4, CROP, CROP, 3)
    assert ref_batches[0]["last"].shape == (7, CROP * 4, CROP * 4, 3)
    _assert_batches_equal(ref_batches, our_batches)


def test_pair_pipeline_matches_reference_pure_python(
        ref_dataset_mod, pair_tfrecord):
    """Same chain with OUR tensorflow-free record reader + image
    decoder (pure_python: the self-contained TFRecord framing codec
    and cv2/PIL PNG decode) against the reference's tf.data graph."""
    base = [
        {"name": "NormalizeOp", "crop_size": CROP},
        {"name": "FilterFlatOp", "threshold": 0.01},
        {"name": "BatchOp", "batch_size": 2},
    ]
    ref_batches = _run_reference(ref_dataset_mod, [
        {"name": "TFRecordDatasetOp", "path": pair_tfrecord},
        {"name": "ParsePairExampleOp"},
    ] + base)
    our_batches = _run_ours([
        {"name": "TFRecordDatasetOp", "path": pair_tfrecord,
         "pure_python": True},
        {"name": "ParsePairExampleOp", "pure_python": True},
    ] + base)
    _assert_batches_equal(ref_batches, our_batches)


def test_single_pipeline_matches_reference(
        ref_dataset_mod, single_tfrecord):
    """ParseSingleExampleOp: the reference derives LR via TF1
    resize_nearest_neighbor (align_corners=False,
    half_pixel_centers=False) at x1/4 -- ours is plain ::4 subsampling;
    this golden pins the equivalence on real decoded frames."""
    config = [
        {"name": "TFRecordDatasetOp", "path": single_tfrecord},
        {"name": "ParseSingleExampleOp"},
        {"name": "NormalizeOp", "crop_size": CROP},
        {"name": "BatchOp", "batch_size": 2},
    ]
    ref_batches = _run_reference(ref_dataset_mod, config)
    our_batches = _run_ours(config)
    assert len(ref_batches) == 1
    assert ref_batches[0]["input"].shape == (2, 10, CROP, CROP, 3)
    _assert_batches_equal(ref_batches, our_batches)


def test_batch_drop_remainder_matches_reference(
        ref_dataset_mod, pair_tfrecord):
    """BatchOp uses drop_remainder=True in the reference (:505-507);
    3 parsed sequences at batch_size=2 must yield exactly ONE batch on
    both sides."""
    config = [
        {"name": "TFRecordDatasetOp", "path": pair_tfrecord},
        {"name": "ParsePairExampleOp"},
        {"name": "NormalizeOp", "crop_size": CROP},
        {"name": "BatchOp", "batch_size": 2},
    ]
    ref_batches = _run_reference(ref_dataset_mod, config)
    our_batches = _run_ours(config)
    assert len(ref_batches) == 1
    _assert_batches_equal(ref_batches, our_batches)
