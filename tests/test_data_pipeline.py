"""Dataset pipeline tests: op-chain configs over synthetic image trees."""

import numpy as np
import pytest

from joshupscale_tpu.data import create_dataset, create_train_dataset


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """20 LR (32x48) + 20 HR (128x192) PNGs = two 10-frame groups."""
    import cv2

    root = tmp_path_factory.mktemp("imgs")
    (root / "lr").mkdir()
    (root / "hr").mkdir()
    rng = np.random.default_rng(0)
    for i in range(20):
        lr = rng.integers(0, 256, (32, 48, 3), np.uint8)
        hr = rng.integers(0, 256, (128, 192, 3), np.uint8)
        cv2.imwrite(str(root / "lr" / f"{i:03d}.png"), lr)
        cv2.imwrite(str(root / "hr" / f"{i:03d}.png"), hr)
    return root


def _base_config(image_tree, crop=8):
    return [
        {"name": "LocalDatasetOp",
         "lr_path": str(image_tree / "lr" / "*.png"),
         "hr_path": str(image_tree / "hr" / "*.png")},
        {"name": "RandomCropOp", "crop_size": crop, "num_img": 2},
        {"name": "NormalizeOp", "crop_size": crop},
    ]


def test_local_crop_normalize(image_tree):
    items = list(create_dataset(_base_config(image_tree)))
    # 2 groups x 2 crops each
    assert len(items) == 4
    it = items[0]
    assert it["input"].shape == (10, 8, 8, 3)
    assert it["target"].shape == (10, 32, 32, 3)
    assert it["input"].dtype == np.float32
    assert it["input"].min() >= -0.5 and it["input"].max() <= 0.5


def test_crop_alignment(image_tree):
    """HR crop must be exactly 4x the LR crop window."""
    config = [
        {"name": "LocalDatasetOp",
         "lr_path": str(image_tree / "lr" / "*.png"),
         "hr_path": str(image_tree / "hr" / "*.png")},
    ]
    seq = next(iter(create_dataset(config)))
    assert seq["input"].shape == (10, 32, 48, 3)
    assert seq["target"].shape == (10, 128, 192, 3)


def test_augmentations_and_batch(image_tree):
    config = _base_config(image_tree) + [
        {"name": "RgbToBgrOp"},
        {"name": "RandomNoiseOp", "stddev": 0.01},
        {"name": "RandomContrastOp", "stddev": 0.1, "base": 2.0},
        {"name": "RandomBrightnessOp", "stddev": 0.05},
        {"name": "RandomHorizontalFlipOp", "threshold": 0.5},
        {"name": "RandomVerticalFlipOp", "threshold": 0.5},
        {"name": "RandomTransposeOp", "threshold": 0.5},
        {"name": "ClipOp", "minval": -0.5, "maxval": 0.5},
        {"name": "RepeatOp"},
    ]
    ds = create_train_dataset(config, batch_size=3)
    it = iter(ds)
    batch = next(it)
    assert batch["input"].shape == (3, 10, 8, 8, 3)
    assert batch["target"].shape == (3, 10, 32, 32, 3)
    assert batch["input"].min() >= -0.5 and batch["input"].max() <= 0.5
    # Repeat keeps the stream alive well past one epoch.
    for _ in range(5):
        next(it)


def test_single_frame_windows(image_tree):
    config = _base_config(image_tree) + [
        {"name": "SingleFrameMapOp", "flow_frames": 4},
    ]
    item = next(iter(create_dataset(config)))
    assert item["input"].shape == (4, 8, 8, 3)
    assert item["target"].shape == (32, 32, 3)
    assert item["last"].shape == (32, 32, 3)


def test_filter_flat_drops_static(image_tree):
    from joshupscale_tpu.data.pipeline import FilterFlatOp

    op = FilterFlatOp(threshold=0.01, name="f")
    static = {"input": np.zeros((10, 8, 8, 3), np.float32)}
    moving = {"input": np.random.default_rng(0).random(
        (10, 8, 8, 3)).astype(np.float32)}
    assert not op.filter_fn(static)
    assert op.filter_fn(moving)


def test_take_skip_shuffle_cache(image_tree):
    base = _base_config(image_tree)
    taken = list(create_dataset(base + [{"name": "TakeOp", "size": 3}]))
    assert len(taken) == 3
    skipped = list(create_dataset(base + [{"name": "SkipOp", "size": 3}]))
    assert len(skipped) == 1
    cached = create_dataset(base + [{"name": "CacheOp"}])
    a = [x["input"].sum() for x in cached]
    b = [x["input"].sum() for x in cached]
    assert a == b  # second pass served from cache (same values)


def test_sample_dataset_mixes(image_tree):
    cfg_a = _base_config(image_tree)
    config = [{
        "name": "SampleDatasetOp",
        "configs": [cfg_a, cfg_a],
    }]
    items = list(create_dataset(config))
    assert len(items) == 8  # 4 from each sub-pipeline


def test_map_num_parallel_preserves_order():
    """num_parallel (the tf.data num_parallel_calls analog) keeps the
    exact sequential output order via its bounded in-order window."""
    from joshupscale_tpu.data.pipeline import MapOp

    class Double(MapOp):
        def map_fn(self, data):
            return data * 2

    seq = list(Double("d")(range(100)))
    par = list(Double("d", num_parallel=4)(range(100)))
    assert par == seq == [2 * i for i in range(100)]
    # restartable: a second pull re-runs the pool cleanly
    op = Double("d", num_parallel=3)(range(10))
    assert list(op) == list(op)


def test_display_data_helpers(tmp_path):
    """Notebook display helpers (reference utils.py:113-148 analog)
    render paired-sequence and single-window elements headlessly."""
    from joshupscale_tpu.utils.display import (
        display_comparison, display_data, to_display)

    rng = np.random.default_rng(0)
    # to_display: u8 and normalized-float conventions, BGR flip.
    u8 = rng.integers(0, 256, (4, 4, 3), np.uint8)
    disp = to_display(u8)
    assert disp.dtype == np.float32 and disp.max() <= 1.0
    assert np.allclose(disp[..., 0], u8[..., 2] / 255.0)
    norm = rng.uniform(-0.5, 0.5, (4, 4, 3)).astype(np.float32)
    assert np.allclose(to_display(norm, bgr=False), norm + 0.5,
                       atol=1e-6)

    paired = [{"input": rng.uniform(-0.5, 0.5, (3, 4, 4, 3)),
               "target": rng.uniform(-0.5, 0.5, (3, 16, 16, 3))}
              for _ in range(2)]
    out = tmp_path / "paired.png"
    display_data(iter(paired), num_img=2, save_path=str(out))
    assert out.stat().st_size > 0

    single = [{"input": rng.uniform(-0.5, 0.5, (3, 4, 4, 3)),
               "last": rng.uniform(-0.5, 0.5, (16, 16, 3)),
               "target": rng.uniform(-0.5, 0.5, (16, 16, 3))}]
    out2 = tmp_path / "single.png"
    display_data(iter(single), num_img=1, save_path=str(out2))
    assert out2.stat().st_size > 0

    # Batched elements are unbatched transparently.
    batched = [{"input": rng.uniform(-0.5, 0.5, (2, 3, 4, 4, 3)),
                "target": rng.uniform(-0.5, 0.5, (2, 3, 16, 16, 3))}]
    out3 = tmp_path / "batched.png"
    display_data(iter(batched), num_img=2, save_path=str(out3))
    assert out3.stat().st_size > 0

    out4 = tmp_path / "cmp.png"
    display_comparison(
        rng.integers(0, 256, (8, 8, 3), np.uint8),
        rng.integers(0, 256, (32, 32, 3), np.uint8),
        rng.integers(0, 256, (32, 32, 3), np.uint8),
        save_path=str(out4))
    assert out4.stat().st_size > 0


def test_display_data_single_window_no_cell_collision(tmp_path,
                                                      monkeypatch):
    """A 1-frame window element ('input' (1,H,W,3) + last/target) must
    render input, last AND target in distinct grid cells: the seq_len-
    wide grid used to resolve 'last' to the input frame's own subplot,
    silently replacing it."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from joshupscale_tpu.utils.display import display_data

    captured = []
    real_figure = plt.figure

    def capture_figure(*a, **kw):
        fig = real_figure(*a, **kw)
        captured.append(fig)
        return fig

    monkeypatch.setattr(plt, "figure", capture_figure)
    rng = np.random.default_rng(5)
    elems = [{"input": rng.uniform(-0.5, 0.5, (1, 4, 4, 3)),
              "last": rng.uniform(-0.5, 0.5, (16, 16, 3)),
              "target": rng.uniform(-0.5, 0.5, (16, 16, 3))}]
    out = tmp_path / "win1.png"
    display_data(iter(elems), num_img=1, save_path=str(out))
    assert out.stat().st_size > 0
    (fig,) = captured
    # input + last + target = 3 distinct axes (a collision would reuse
    # the input cell and leave only 2).
    assert len(fig.axes) == 3
    boxes = {tuple(np.round(ax.get_position().bounds, 6))
             for ax in fig.axes}
    assert len(boxes) == 3
