"""Generate the synthetic 4K photo-like benchmark image (seed 42).

Same recipe used to produce the CPU baselines in BASELINE_MEASURED.md.
"""

import numpy as np


def make_4k(h: int = 2160, w: int = 3840, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        120 + 80 * np.sin(x / 300) + 40 * np.cos(y / 200),
        100 + 70 * np.cos(x / 250 + y / 400),
        140 + 60 * np.sin((x + y) / 350),
    ], axis=-1)
    blob = 80 * np.exp(-((x - 2000) ** 2 + (y - 1000) ** 2) / (2 * 400 ** 2))
    img[..., 0] += blob
    img[..., 2] -= blob
    img += rng.normal(0, 6, img.shape)
    img[500:700, 500:1500] = [210, 40, 60]
    return np.clip(img, 0, 255).astype(np.uint8)


if __name__ == "__main__":
    from PIL import Image

    img = make_4k()
    Image.fromarray(img, "RGB").save("test4k.png")
    print("saved test4k.png", img.shape)
