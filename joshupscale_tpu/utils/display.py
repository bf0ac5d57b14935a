"""Notebook display helpers for datasets and model outputs.

The analog of the reference's ``scripts/training/utils.py:113-148``
``display_data`` (matplotlib grid of a dataset's input sequences and
targets, used from the training notebooks).  Works on this package's
iterable datasets (:func:`joshupscale_tpu.data.pipeline.create_dataset`
elements are dicts of numpy arrays) instead of ``tf.data``.

All functions are matplotlib-lazy: importable (and the module testable)
without a display; pass ``save_path`` for headless use, otherwise
``plt.show()`` renders inline in a notebook.
"""

from typing import Any, Dict, Iterable, Optional, Sequence

import numpy as np

__all__ = ["to_display", "display_data", "display_comparison"]


def to_display(img: np.ndarray, bgr: bool = True) -> np.ndarray:
    """Convert a pipeline image to displayable RGB float in [0, 1].

    Handles the pipeline's two conventions: normalized float in
    [-0.5, 0.5] (post-``NormalizeOp``, BGR channel order by default --
    the decode ops emit BGR like the reference's cv2 loader) and uint8.
    """
    img = np.asarray(img)
    if img.dtype == np.uint8:
        out = img.astype(np.float32) / 255.0
    else:
        out = np.clip(img.astype(np.float32) + 0.5, 0.0, 1.0)
    if bgr and out.ndim >= 3 and out.shape[-1] == 3:
        out = out[..., ::-1]
    return out


def _take_elements(dataset: Iterable[Dict[str, Any]],
                   num_img: int) -> Sequence[Dict[str, np.ndarray]]:
    """First ``num_img`` UNBATCHED elements of an iterable dataset."""
    out = []
    for elem in dataset:
        arrs = {k: np.asarray(v) for k, v in elem.items()}
        seq = arrs.get("input")
        if seq is not None and seq.ndim == 5:  # batched: unbatch
            n = seq.shape[0]
            for b in range(n):
                out.append({k: v[b] for k, v in arrs.items()})
                if len(out) >= num_img:
                    return out
        else:
            out.append(arrs)
        if len(out) >= num_img:
            return out
    return out


def display_data(dataset: Iterable[Dict[str, Any]], num_img: int,
                 bgr: bool = True,
                 save_path: Optional[str] = None) -> None:
    """Render a grid of dataset samples: input sequence rows over
    target rows (reference ``utils.display_data`` semantics).

    Supports both element shapes the pipeline produces: paired
    sequences (``input``/``target`` both (T, H, W, 3)) and the
    FRVSR-single window form (``input`` (T, H, W, 3) + ``last``/
    ``target`` single frames, reference ``SingleFrameMapOp``).
    """
    import matplotlib

    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    elems = _take_elements(dataset, num_img)
    if not elems:
        raise ValueError("dataset yielded no elements")
    seq_len = elems[0]["input"].shape[0]
    # The window form needs TWO cells in its second row (last | target);
    # at seq_len == 1 a seq_len-wide grid would draw "last" over the
    # input cell.
    cols = max(seq_len, 2) if "last" in elems[0] else seq_len
    fig = plt.figure(figsize=(2 * cols, 4 * len(elems)))
    rows = 2 * len(elems)
    for ind, elem in enumerate(elems):
        base = ind * 2 * cols
        for i in range(seq_len):
            ax = fig.add_subplot(rows, cols, base + 1 + i)
            ax.axis("off")
            ax.imshow(to_display(elem["input"][i], bgr))
        if "last" in elem:
            for col, key in ((cols - 1, "last"), (cols, "target")):
                ax = fig.add_subplot(rows, cols, base + cols + col)
                ax.axis("off")
                ax.imshow(to_display(elem[key], bgr))
        else:
            for i in range(seq_len):
                ax = fig.add_subplot(rows, cols, base + cols + 1 + i)
                ax.axis("off")
                ax.imshow(to_display(elem["target"][i], bgr))
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover - interactive
        plt.show()


def display_comparison(lr: np.ndarray, out: np.ndarray, hr: np.ndarray,
                       bgr: bool = False, upscale: int = 4,
                       save_path: Optional[str] = None) -> None:
    """Side-by-side nearest-upscaled-LR | model output | ground truth
    (the strip ``tools/eval_synth.py --save-png`` writes, as an inline
    notebook figure)."""
    import matplotlib

    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lr_up = np.repeat(np.repeat(np.asarray(lr), upscale, 0), upscale, 1)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, title in zip(axes, (lr_up, out, hr),
                              (f"LR nearest x{upscale}", "model",
                               "ground truth")):
        ax.axis("off")
        ax.set_title(title)
        ax.imshow(to_display(img, bgr))
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover - interactive
        plt.show()
