"""Seeded-pipeline determinism + multiprocess loader tests.

Reference parity: ``train_local.py:78-79`` seeds keras/np/random from
the config so a run is reproducible end to end; tf.data runs its op
chain on parallel C++ threads (dataset.py:496-607).  Here the same
guarantees are: ``create_dataset(seed=...)`` reproduces the exact
element stream (shuffle order + augmentation draws), and
``create_train_dataset(num_workers=N)`` runs pipeline replicas in
worker processes over disjoint source shards, deterministically for a
fixed (seed, num_workers).
"""

import numpy as np
import pytest

from joshupscale_tpu.data import create_dataset, create_train_dataset
from joshupscale_tpu.data.mploader import (
    ConfigPipelineFactory,
    MultiprocessLoader,
    WorkerInfo,
)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """40 LR (16x16) + 40 HR (64x64) PNGs = four 10-frame groups."""
    import cv2

    root = tmp_path_factory.mktemp("mp_imgs")
    (root / "lr").mkdir()
    (root / "hr").mkdir()
    rng = np.random.default_rng(7)
    for i in range(40):
        lr = rng.integers(0, 256, (16, 16, 3), np.uint8)
        hr = rng.integers(0, 256, (64, 64, 3), np.uint8)
        cv2.imwrite(str(root / "lr" / f"{i:03d}.png"), lr)
        cv2.imwrite(str(root / "hr" / f"{i:03d}.png"), hr)
    return root


def _config(image_tree, crop=4):
    return [
        {"name": "LocalDatasetOp", "shuffle": True,
         "lr_path": str(image_tree / "lr" / "*.png"),
         "hr_path": str(image_tree / "hr" / "*.png")},
        {"name": "RandomCropOp", "crop_size": crop, "num_img": 2},
        {"name": "NormalizeOp", "crop_size": crop},
        {"name": "RandomNoiseOp", "stddev": 0.01},
        {"name": "RandomHorizontalFlipOp", "threshold": 0.5},
    ]


def _stream_digest(items):
    return [float(np.sum(x["input"])) for x in items]


def test_seeded_pipeline_reproducible(image_tree):
    """Same config + seed => identical element stream (shuffle order,
    crop windows, noise and flip draws)."""
    a = _stream_digest(create_dataset(_config(image_tree), seed=123))
    b = _stream_digest(create_dataset(_config(image_tree), seed=123))
    assert a == b
    assert len(a) == 8  # 4 groups x 2 crops


def test_seed_changes_stream(image_tree):
    a = _stream_digest(create_dataset(_config(image_tree), seed=123))
    b = _stream_digest(create_dataset(_config(image_tree), seed=124))
    assert a != b


def test_unseeded_pipeline_still_works(image_tree):
    items = list(create_dataset(_config(image_tree)))
    assert len(items) == 8


def test_seeded_shuffle_op_reproducible(image_tree):
    config = _config(image_tree) + [
        {"name": "ShuffleOp", "shuffle_window": 4},
    ]
    a = _stream_digest(create_dataset(config, seed=5))
    b = _stream_digest(create_dataset(config, seed=5))
    assert a == b


def test_seeded_sample_dataset_reproducible(image_tree):
    config = [{
        "name": "SampleDatasetOp",
        "configs": [_config(image_tree), _config(image_tree)],
        "weights": [1.0, 2.0],
    }]
    a = _stream_digest(create_dataset(config, seed=9))
    b = _stream_digest(create_dataset(config, seed=9))
    assert a == b
    assert len(a) == 16


def test_shard_partitions_source(image_tree):
    """Shards cover the source exactly once, disjointly."""
    config = [
        {"name": "LocalDatasetOp",
         "lr_path": str(image_tree / "lr" / "*.png"),
         "hr_path": str(image_tree / "hr" / "*.png")},
    ]
    full = _stream_digest(create_dataset(config, seed=1))
    s0 = _stream_digest(create_dataset(config, seed=1, shard=(2, 0)))
    s1 = _stream_digest(create_dataset(config, seed=1, shard=(2, 1)))
    assert sorted(s0 + s1) == sorted(full)
    assert s0 == full[0::2] and s1 == full[1::2]


def test_mploader_deterministic_and_covering(image_tree):
    """Two fresh 2-worker loaders with one seed yield identical batch
    streams, and the epoch covers every source group exactly once."""
    factory = ConfigPipelineFactory(_config(image_tree), batch_size=2)

    def collect():
        return [
            (float(b["input"].sum()), b["input"].shape)
            for b in MultiprocessLoader(factory, num_workers=2, seed=11)
        ]

    a = collect()
    b = collect()
    assert a == b
    # 4 groups x 2 crops = 8 elements -> 4 batches of 2 across workers
    assert len(a) == 4
    assert all(shape == (2, 10, 4, 4, 3) for _, shape in a)


def test_mploader_shards_are_one_exact_pass(image_tree):
    """The union of the worker shards is the source, each group ONCE.

    Regression: seeding the shuffled SOURCE per worker shards N
    different permutations — batch counts stay right while some groups
    repeat and others vanish (silently biased epochs) — so identity is
    asserted content-wise, not by count.  Aug-free config: each
    element's digest identifies its source group exactly.
    """
    config = [{
        "name": "LocalDatasetOp", "shuffle": True,
        "lr_path": str(image_tree / "lr" / "*.png"),
        "hr_path": str(image_tree / "hr" / "*.png"),
    }]
    full = _stream_digest(create_dataset(config, seed=11))
    assert len(full) == len(set(full)) == 4  # distinct random groups
    for workers in (2, 3):
        got = [
            float(b["input"].sum())
            for b in MultiprocessLoader(
                ConfigPipelineFactory(config, batch_size=1),
                num_workers=workers, seed=11)
        ]
        assert sorted(got) == sorted(full), f"num_workers={workers}"
    # Unseeded loaders still shard ONE shared source order (a random
    # root drawn in the parent), so coverage holds there too.
    got = [
        float(b["input"].sum())
        for b in MultiprocessLoader(
            ConfigPipelineFactory(config, batch_size=1), num_workers=2)
    ]
    assert sorted(got) == sorted(full)


def test_mploader_matches_worker_count_invariant(image_tree):
    """Single-worker mp stream == in-process stream with the worker's
    info (the loader adds transport, not semantics)."""
    factory = ConfigPipelineFactory(_config(image_tree), batch_size=2)
    mp_stream = [
        float(b["input"].sum())
        for b in MultiprocessLoader(factory, num_workers=1, seed=3)
    ]
    info_seed = int(np.random.SeedSequence(3).spawn(1)[0]
                    .generate_state(1)[0])
    local = factory(WorkerInfo(0, 1, info_seed, root_seed=3))
    local_stream = [float(b["input"].sum()) for b in local]
    assert mp_stream == local_stream


def test_mploader_error_propagates():
    factory = ConfigPipelineFactory(
        [{"name": "NoSuchOp"}], batch_size=1)
    with pytest.raises(RuntimeError, match="worker 0 failed"):
        list(MultiprocessLoader(factory, num_workers=1, seed=0))


def test_mploader_early_close_shuts_down(image_tree):
    """Abandoning the iterator mid-epoch releases the workers."""
    config = _config(image_tree) + [{"name": "RepeatOp"}]
    loader = MultiprocessLoader(
        ConfigPipelineFactory(config, batch_size=2),
        num_workers=2, seed=0, prefetch=1,
    )
    it = iter(loader)
    next(it)
    next(it)
    it.close()  # generator close() runs the finally-cleanup


def test_create_train_dataset_mp_path(image_tree):
    ds = create_train_dataset(
        _config(image_tree), batch_size=2, seed=4, num_workers=2)
    batches = list(ds)
    assert len(batches) == 4
    assert batches[0]["input"].shape == (2, 10, 4, 4, 3)
    assert batches[0]["input"].dtype == np.float32
    # deterministic across fresh passes (fresh workers, same seeds)
    again = list(ds)
    assert [float(b["input"].sum()) for b in batches] == \
        [float(b["input"].sum()) for b in again]


def test_unpack_bounds_check():
    """_unpack validates offsets against the segment size instead of
    letting np.frombuffer raise an opaque buffer error (or silently
    reading short)."""
    from joshupscale_tpu.data.mploader import _pack, _unpack

    batch = {"a": np.arange(12, dtype=np.float32).reshape(3, 4)}
    name, meta = _pack(batch)
    k, shape, dtype, offset = meta[0]
    bad = [(k, (1000, 1000), dtype, offset)]
    with pytest.raises(ValueError, match="too small"):
        _unpack(name, bad)  # finally-clause unlinks the segment


def test_unseeded_shard_rejected(image_tree):
    """shard=(n>1, i) without a seed must raise: each worker would draw
    its own source order, so the strided shards would not partition the
    dataset (silently biased epochs)."""
    from joshupscale_tpu.data.pipeline import create_dataset

    config = [
        {"name": "LocalDatasetOp",
         "lr_path": str(image_tree / "lr" / "*.png"),
         "hr_path": str(image_tree / "hr" / "*.png")},
    ]
    with pytest.raises(ValueError, match="requires a seed"):
        create_dataset(config, shard=(2, 0))
    # Trivial full shard stays allowed unseeded.
    next(iter(create_dataset(config, shard=(1, 0))))


def test_create_train_dataset_prefetch_honored(image_tree, monkeypatch):
    """The prefetch parameter must reach the in-process PrefetchOp, not
    just the multiprocess queue depth."""
    from joshupscale_tpu.data import pipeline as pl

    seen = {}
    real = pl.DATASET_OPS["PrefetchOp"]

    def recording(**kw):
        seen.update(kw)
        return real(**kw)

    monkeypatch.setitem(pl.DATASET_OPS, "PrefetchOp", recording)
    ds = pl.create_train_dataset(
        _config(image_tree), batch_size=2, seed=0,
        num_workers=0, prefetch=7)
    next(iter(ds))
    assert seen.get("buffer_size") == 7
