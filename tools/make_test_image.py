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


def make_family(name: str, h: int = 1080, w: int = 1920, seed: int = 42) -> np.ndarray:
    """Content families for the quality-parity sweeps (PARITY_RESULTS.md).

    - "photo":    the make_4k recipe (gradients + blob + noise + flat patch)
    - "smooth":   low-noise large-scale gradients (factor planes dominate)
    - "graphics": UI-like content -- flat panels, 8px bands, hard edges,
                  text-ish speckle rows (exercises merging + coalescing)
    - "unaligned": alignment-adversarial -- large coherent regions
                  straddling every 2^L block boundary, diagonal bands,
                  off-grid anchors (VERDICT r4 item 4: where the
                  reference's free-anchor grower could beat the aligned
                  quadtree geometry)
    """
    rng = np.random.default_rng(seed)
    if name == "photo":
        return make_4k(h, w, seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    if name == "smooth":
        img = np.stack([
            90 + 100 * x / w + 20 * np.sin(y / 400),
            70 + 110 * y / h,
            130 + 70 * np.sin(x / 700) * np.cos(y / 500),
        ], axis=-1)
        img += rng.normal(0, 1.5, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)
    if name == "graphics":
        img = np.full((h, w, 3), 245.0, np.float32)
        # side panel + header bands (8 px tall, distinct colors)
        img[:, : w // 5] = [52, 58, 84]
        for i in range(6):
            c = rng.integers(60, 200, 3)
            img[i * 8:(i + 1) * 8, w // 5:] = c
        # content cards with hard edges + subtle vertical gradient
        for r in range(4):
            for cix in range(3):
                y0 = 80 + r * (h - 120) // 4
                x0 = w // 5 + 40 + cix * (w - w // 5 - 80) // 3
                hh, ww = (h - 160) // 4, (w - w // 5 - 120) // 3
                grad = np.linspace(0, 18, hh, dtype=np.float32)[:, None, None]
                img[y0:y0 + hh, x0:x0 + ww] = (
                    np.array(rng.integers(150, 235, 3), np.float32) - grad
                )
        # text-like speckle rows
        for ty in range(120, h, 90):
            mask_txt = rng.random((12, w - w // 5 - 100)) < 0.18
            img[ty:ty + 12, w // 5 + 50:w - 50][mask_txt] = 30
        return np.clip(img, 0, 255).astype(np.uint8)
    if name == "unaligned":
        # adversarial to ALIGNED region geometry (the rebuild's quadtree
        # squares + axis-aligned runs): every coherent feature deliberately
        # straddles 2^L block boundaries, where the reference's free-anchor
        # rectangle grower (src/limg.cpp:1294-1496, recenter at :1427-1438)
        # could amortize headers the aligned quadtree cannot.
        img = np.empty((h, w, 3), np.float32)
        # 45-degree diagonal gradient bands, widths NOT multiples of 8
        d = (x + y)
        band = (d // 37).astype(np.int64)
        cols = rng.integers(40, 220, (int(band.max()) + 1, 3)).astype(np.float32)
        img[:] = cols[band]
        # large flat rectangles anchored at odd offsets, odd sizes
        for (y0, x0, rh, rw) in ((13, 21, h // 3 + 5, w // 2 + 9),
                                 (h // 2 + 7, w // 3 + 11, h // 3 - 3,
                                  w // 2 - 13),
                                 (5, w - w // 4 - 3, h // 2 + 1, w // 5 + 2)):
            img[y0:y0 + rh, x0:x0 + rw] = rng.integers(50, 210, 3)
        # one smooth off-grid ellipse (coherent curved boundary)
        cy, cx = h * 0.37 + 3.0, w * 0.62 + 5.0
        ell = ((y - cy) / (h * 0.21)) ** 2 + ((x - cx) / (w * 0.17)) ** 2 < 1.0
        img[ell] = np.stack([180 + 40 * np.sin(x / 90), 90 + 50 * y / h,
                             60 + 30 * np.cos(y / 70)], -1)[ell]
        img += rng.normal(0, 1.0, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)
    raise ValueError(name)
