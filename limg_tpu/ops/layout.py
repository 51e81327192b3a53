"""Image <-> block-tensor layout transforms.

The whole encoder works on the canonical device layout ``(ch, P, NB)``:
channels outermost, the P pixels of a block in the sublane axis, and all
blocks of the image along the minor (lane) axis. On TPU this puts the
embarrassingly parallel axis (blocks) on the 128-wide vector lanes and makes
every per-block reduction a cheap sublane reduction.

This replaces the reference's per-tile memcpy gather
(src/limg.cpp:1104-1107) and its row-band thread sharding
(src/limg.cpp:2114-2137) with a single relayout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import BLOCK_SIZE


class BlockGrid(NamedTuple):
    height: int
    width: int
    blocks_y: int
    blocks_x: int

    @property
    def num_blocks(self) -> int:
        return self.blocks_y * self.blocks_x


def grid_for(height: int, width: int, block: int = BLOCK_SIZE) -> BlockGrid:
    return BlockGrid(height, width, -(-height // block), -(-width // block))


def blockify(image: jnp.ndarray, block: int = BLOCK_SIZE):
    """(H, W, C) uint8 -> (C, block*block, NB) uint8 + (block*block, NB) mask.

    Edge blocks are zero-padded; ``mask`` marks real pixels. Pixel order
    within a block is row-major, matching the reference's tile copy
    (src/limg.cpp:1104-1107).
    """
    h, w, c = image.shape
    g = grid_for(h, w, block)
    pad_y = g.blocks_y * block - h
    pad_x = g.blocks_x * block - w
    padded = jnp.pad(image, ((0, pad_y), (0, pad_x), (0, 0)))
    # (By, b, Bx, b, C) -> (C, b, b, By, Bx) -> (C, P, NB)
    tiles = padded.reshape(g.blocks_y, block, g.blocks_x, block, c)
    px = tiles.transpose(4, 1, 3, 0, 2).reshape(c, block * block, g.num_blocks)

    ys = np.arange(g.blocks_y * block).reshape(g.blocks_y, block)
    xs = np.arange(g.blocks_x * block).reshape(g.blocks_x, block)
    valid = (ys < h)[:, :, None, None] & (xs < w)[None, None, :, :]  # (By,b,Bx,b)
    mask = jnp.asarray(
        valid.transpose(1, 3, 0, 2).reshape(block * block, g.num_blocks)
    )
    return px, mask, g


def packed_words(image) -> jnp.ndarray:
    """(H, W, 4) uint8 RGBA -> (H, W) int32 RGBA words.

    On host numpy input this is a free reinterpretation (the byte quadruple
    IS the little-endian word, R in the low byte, matching pack_channels);
    prefer passing the words into jitted entry points -- an in-graph bitcast
    makes XLA re-lay out the whole 33 MB u8 image first (~7 ms on a 4K).
    """
    from jax import lax

    if isinstance(image, np.ndarray):
        a = np.ascontiguousarray(image)
        return jnp.asarray(a.view(np.int32).reshape(a.shape[0], a.shape[1]))
    return lax.bitcast_convert_type(image, jnp.int32)


def host_block_view(image: np.ndarray, block: int = BLOCK_SIZE):
    """HOST-side (H, W, 4) u8 / (H, W) i32 -> ((by, b, bx, b) i32 view, h, w).

    Free numpy reinterpretation when H and W are multiples of ``block``
    (the row-major bytes of the image ARE the 4-D view); otherwise one host
    memcpy pads to the grid. Shipping this view to the device instead of
    (H, W) words skips an on-device retile: XLA materializes the
    (H, W) -> (by, b, bx, b) reshape as a full T(8,128) re-tiling pass
    (~0.8 ms per 4K, tools/profiling/xplane_detail.py) even though the
    bytes don't move.
    """
    if image.ndim == 3:
        image = packed_words(image)
    image = np.asarray(image)
    h, w = image.shape
    g = grid_for(h, w, block)
    pad_y = g.blocks_y * block - h
    pad_x = g.blocks_x * block - w
    if pad_y or pad_x:
        image = np.pad(image, ((0, pad_y), (0, pad_x)))
    view = image.reshape(g.blocks_y, block, g.blocks_x, block)
    return view, h, w


def _block_mask(h: int, w: int, g: BlockGrid, block: int):
    ys = np.arange(g.blocks_y * block).reshape(g.blocks_y, block)
    xs = np.arange(g.blocks_x * block).reshape(g.blocks_x, block)
    valid = (ys < h)[:, :, None, None] & (xs < w)[None, None, :, :]
    return jnp.asarray(
        valid.transpose(1, 3, 0, 2).reshape(block * block, g.num_blocks)
    )


def blockify_packed(image: jnp.ndarray, block: int = BLOCK_SIZE,
                    hw: tuple | None = None):
    """RGBA image -> ((block*block, NB) int32 packed words, mask, grid).

    Accepts (H, W, 4) uint8, pre-packed (H, W) int32 words (see
    packed_words), or the free (by, block, bx, block) int32 host view (see
    host_block_view; pass ``hw`` for edge-padded images so the mask knows
    the real extent). Fast path for the fused kernels: packing is a bitcast
    and the relayout moves one int32 plane instead of four channel planes.
    Produces bit-identical output to ``pack_channels(blockify(image)[0])``.
    """
    from jax import lax

    if image.ndim == 4:
        by, b1, bx, b2 = image.shape
        assert b1 == block and b2 == block
        h, w = hw if hw is not None else (by * block, bx * block)
        g = grid_for(h, w, block)
        assert (g.blocks_y, g.blocks_x) == (by, bx)
        px = image.transpose(1, 3, 0, 2).reshape(block * block, g.num_blocks)
        return px, _block_mask(h, w, g, block), g
    if image.ndim == 2:
        # pre-packed words; hw gives the real extent when the plane is
        # already padded to a finer grid (e.g. the 8-padded plane of a
        # 16/32-px level encode) so the mask marks only real pixels
        packed2d = image
        h, w = hw if hw is not None else image.shape
    else:
        h, w, c = image.shape
        assert c == 4, "blockify_packed requires an RGBA image"
        packed2d = lax.bitcast_convert_type(image, jnp.int32)    # (H, W)
    g = grid_for(h, w, block)
    padded = jnp.pad(
        packed2d, ((0, g.blocks_y * block - packed2d.shape[0]),
                   (0, g.blocks_x * block - packed2d.shape[1])))
    tiles = padded.reshape(g.blocks_y, block, g.blocks_x, block)
    px = tiles.transpose(1, 3, 0, 2).reshape(block * block, g.num_blocks)
    return px, _block_mask(h, w, g, block), g


def unblockify(px: jnp.ndarray, grid: BlockGrid, block: int = BLOCK_SIZE) -> jnp.ndarray:
    """(C, block*block, NB) -> (H, W, C), cropping edge padding."""
    c = px.shape[0]
    tiles = px.reshape(c, block, block, grid.blocks_y, grid.blocks_x)
    img = tiles.transpose(3, 1, 4, 2, 0).reshape(
        grid.blocks_y * block, grid.blocks_x * block, c
    )
    return img[: grid.height, : grid.width]


def broadcast_block_plane(vals: jnp.ndarray, grid: BlockGrid, block: int = BLOCK_SIZE) -> jnp.ndarray:
    """Per-block values (..., NB) -> per-pixel plane (..., H, W)."""
    lead = vals.shape[:-1]
    v = vals.reshape(*lead, grid.blocks_y, grid.blocks_x)
    v = jnp.broadcast_to(
        v[..., :, None, :, None],
        (*lead, grid.blocks_y, block, grid.blocks_x, block),
    )
    img = v.reshape(*lead, grid.blocks_y * block, grid.blocks_x * block)
    return img[..., : grid.height, : grid.width]
