#!/usr/bin/env python3
"""Generate the placeholder PS2 HUD mask asset.

The reference ships obs_plugin/data/mask.png (1920x1440, binary
{0, 255}): bright regions keep the upscaled output, dark regions
re-composite the original frame over it (HUD elements that must not be
hallucinated by the GAN).  Real PS2 HUD geometry depends on the game;
this placeholder marks a bottom-left status-bar region like a typical
PS2 HUD.  Replace with a game-specific mask for production.

Usage:
    python tools/make_hud_mask.py [out.png]

Writes an 8-bit grayscale non-interlaced PNG (the format
native/src/png.cc and libobs both read).
"""

import os
import sys
import struct
import zlib

import numpy as np

W, H = 1920, 1080


def write_png_gray(path: str, img: np.ndarray) -> None:
    """Minimal 8-bit grayscale PNG writer (no PIL dependency)."""
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(chunk(b"IEND", b""))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "plugins", "obs", "data", "mask.png")
    mask = np.full((H, W), 255, np.uint8)
    # Placeholder HUD: bottom-left status bar + a minimap corner.
    mask[896:1040, 64:512] = 0
    mask[64:272, 1648:1856] = 0
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_png_gray(out, mask)
    print(f"wrote {out} ({W}x{H}, keep={int((mask == 255).mean() * 100)}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
