"""End-to-end CLI test: YAML config -> train -> export -> serve.

The reference's train_local.py trains from a YAML and exports a
deployable engine; here the whole chain runs on a tiny model and a
2-sequence on-disk PNG dataset, then the exported package must serve
uint8 frames through create_runtime — in particular the training-time
``skip_processing: true`` (float-I/O) inference entry must NOT leak
into the package (a package is a serving artifact; the native runtime
ABI feeds uint8).
"""

import os

import numpy as np
import pytest
import yaml

from joshupscale_tpu.runtime.engine import create_runtime

CROP = 8


def _write_dataset(root, n_seq=2, lr=16):
    import cv2

    rng = np.random.default_rng(3)
    for sub in ("lr", "hr"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for s in range(n_seq):
        hr_seq = rng.integers(0, 256, (10, lr * 4, lr * 4, 3),
                              dtype=np.uint8)
        for t in range(10):
            cv2.imwrite(os.path.join(root, "hr", f"{s:02d}_{t:02d}.png"),
                        hr_seq[t])
            # Nearest-downsample at sub-position 0 (dataset convention).
            cv2.imwrite(os.path.join(root, "lr", f"{s:02d}_{t:02d}.png"),
                        hr_seq[t, ::4, ::4])


def _tiny_config(data_root, out_root):
    ds = [
        {"name": "LocalDatasetOp",
         "lr_path": os.path.join(data_root, "lr", "*.png"),
         "hr_path": os.path.join(data_root, "hr", "*.png")},
        {"name": "RandomCropOp", "crop_size": CROP, "num_img": 3},
        {"name": "NormalizeOp", "crop_size": CROP},
        {"name": "RepeatOp"},
    ]
    return {
        "models": {
            "flow": {"name": "flow-resnet", "num_inputs": 4,
                     "num_filters": 8, "num_res_blocks": 1},
            "generator": {"name": "generator-resnet", "num_filters": 8,
                          "num_res_blocks": 1},
            "inference": {"name": "inference",
                          "flow": {"model": "flow"},
                          "generator": {"model": "generator"},
                          "skip_processing": True,
                          "frame_height": CROP, "frame_width": CROP},
            "frvsr": {"name": "frvsr", "flow": {"model": "flow"},
                      "generator": {"model": "generator"},
                      "inference": {"model": "inference"},
                      "learning_rate": 1e-4},
        },
        "train_dataset": ds,
        "val_dataset": ds[:3],
        "train": {
            "model": "frvsr", "batch_size": 2, "epochs": 1,
            "steps_per_epoch": 2, "val_size": 2,
            "checkpoint_dir": os.path.join(out_root, "ckpt"),
            "log_dir": os.path.join(out_root, "ckpt"),
            "tensorboard": False,
        },
        "export": {"dir": os.path.join(out_root, "export"),
                   "model": "inference"},
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    data_root = os.path.join(root, "data")
    _write_dataset(data_root)
    config = _tiny_config(data_root, str(root))
    from joshupscale_tpu.training.cli import train

    assert train(config, seed=0, num_devices=1) == 0
    return root, config


def test_cli_trains_and_exports_serving_package(trained):
    root, config = trained
    pkg = os.path.join(root, "export", "package")
    assert os.path.isdir(pkg)
    meta = yaml.safe_load(open(os.path.join(pkg, "model.yaml")))
    # The float-I/O training flag must not leak into the package.
    assert meta["models"]["inference"]["skip_processing"] is False

    eng = create_runtime(pkg)
    frame = np.random.default_rng(0).integers(
        0, 256, (CROP, CROP, 3), dtype=np.uint8)
    out = eng.process(frame)
    assert out.shape == (CROP * 4, CROP * 4, 3) and out.dtype == np.uint8


def test_create_runtime_frame_size_override(trained):
    root, _ = trained
    pkg = os.path.join(root, "export", "package")
    h, w = 12, 20
    eng = create_runtime(pkg, frame_size=(h, w))
    frame = np.random.default_rng(1).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    out = eng.process(frame)
    assert out.shape == (h * 4, w * 4, 3)


def test_process_clip_rejects_wrong_frame_dims(trained):
    root, _ = trained
    pkg = os.path.join(root, "export", "package")
    eng = create_runtime(pkg)
    clip = np.zeros((3, 1, CROP + 4, CROP, 3), np.uint8)
    with pytest.raises(ValueError, match="frame_size"):
        eng.process_clip(clip)


def test_upscale_images_tool_matches_engine(trained, tmp_path):
    """tools/upscale_images.py (the reference inference.py runner
    analog: sorted globs -> recurrent engine -> PNG per frame + avg
    time log) must reproduce the Engine's streamed outputs exactly,
    carrying state ACROSS images."""
    import subprocess
    import sys

    import cv2

    root, config = trained
    pkg = os.path.join(config["export"]["dir"], "package")

    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (4, CROP, CROP, 3), np.uint8)
    in_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    for t in range(4):
        cv2.imwrite(str(in_dir / f"f_{t:03d}.png"), frames[t])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "upscale_images.py"),
         "-p", pkg, "-o", str(out_dir), "--cpu",
         str(in_dir / "*.png")],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr
    assert "average time" in r.stdout

    eng = create_runtime(pkg)
    for t in range(4):
        ref = np.asarray(eng.process(frames[t]))
        got = cv2.imread(str(out_dir / f"f_{t:03d}.png"),
                         cv2.IMREAD_COLOR)
        assert got is not None
        np.testing.assert_array_equal(got, ref, err_msg=f"frame {t}")
