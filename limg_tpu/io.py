"""Image I/O: loading via PIL, debug dumps as TGA.

The reference vendors stb_image/stb_image_write and dumps 12 TGA planes for
eyeballing (src/main.cpp:184-195, :350-370). PIL covers loading; TGA writing
is implemented directly (it is a 18-byte header + raw BGRA) so dumps are
byte-compatible with stb's output style. A native C++ writer with the same
format lives in runtime/ for the zero-Python deployment path.
"""

from __future__ import annotations

import struct

import numpy as np


def load_image(path: str):
    """Load any PIL-supported image -> ((H, W, 4) uint8 RGBA, has_alpha)."""
    from PIL import Image

    with Image.open(path) as im:
        has_alpha = im.mode in ("RGBA", "LA", "PA") or "transparency" in im.info
        rgba = np.asarray(im.convert("RGBA"))
    return rgba, has_alpha


def write_tga(path: str, data: np.ndarray) -> None:
    """Write (H, W) grayscale or (H, W, 4) RGBA uint8 as an uncompressed TGA."""
    data = np.ascontiguousarray(data)
    h, w = data.shape[:2]
    if data.ndim == 2:
        header = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, w, h, 8, 0x20)
        payload = data
    else:
        assert data.shape[2] == 4
        header = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 32, 0x28)
        payload = data[..., [2, 1, 0, 3]]  # RGBA -> BGRA
    with open(path, "wb") as f:
        f.write(header)
        f.write(payload.tobytes())
