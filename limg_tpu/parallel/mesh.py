"""Multi-chip sharding of the encoder over a jax.sharding.Mesh.

The reference's entire parallelism story is a std::thread pool sharding one
image into row bands (src/limg_threading.cpp, src/limg.cpp:2105-2138) and a
serial CLI loop over files (src/main.cpp:171-414). The TPU-native story
(SURVEY.md section 2.7):

- intra-image: blocks are the vector/data axis -- shard the NB axis of the
  block tensors across chips; every encode stage is elementwise over NB, so
  XLA inserts no communication until the final stats reductions (psum).
- inter-image: corpus encode shards same-shaped images across chips with
  shard_map; per-image encode is embarrassingly parallel, metrics are
  all-reduced.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BLOCK_SIZE, EncodeConfig, static_block_bits
from ..ops import layout
from ..ops.error import max_possible_error, weighted_error
from ..encoder import encode_blocks


def make_mesh(n_devices: int | None = None, axis: str = "img") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible ({devs[0].platform}); for a virtual "
                "CPU mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
                "--xla_force_host_platform_device_count=N before importing jax"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _encode_one_image_stats(image: jnp.ndarray, cfg: EncodeConfig, key: jax.Array):
    """Full encode of one image -> (psnr, mean_bpp, accum_bits)."""
    px, mask, grid = layout.blockify(image, BLOCK_SIZE)
    res = encode_blocks(px, mask, cfg, key)
    src = px[: cfg.channels].astype(jnp.int32)
    err = weighted_error(res.decoded, src) * mask.astype(jnp.int32)
    total_err = err.astype(jnp.float32).sum()
    n = grid.height * grid.width
    mse = total_err / n
    psnr = 10.0 * jnp.log10(max_possible_error(cfg.channels) / jnp.maximum(mse, 1e-12))
    count = mask.astype(jnp.int32).sum(axis=0)
    header_bits = static_block_bits(cfg.channels) * grid.num_blocks
    exact_bpp = (res.accum_bits.sum() + header_bits) / n
    return psnr, exact_bpp, res.accum_bits


def encode_corpus_sharded(images, cfg: EncodeConfig, n_devices: int | None = None,
                          seed: int = 0, use_pallas: bool = False):
    """Encode a batch of same-shape images sharded over a device mesh.

    ``images``: (N, H, W, C) uint8, N divisible by the mesh size. Returns
    host-side dict with per-image psnr/bpp and the corpus-mean psnr computed
    with an on-device psum (the collective rides ICI). With ``use_pallas``
    each chip concatenates its images along the block axis and runs the
    fused kernel once over the whole shard.
    """
    mesh = make_mesh(n_devices)
    images = jnp.asarray(images)
    n = images.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), n)

    if use_pallas:
        from ..pallas_kernels.encode_fixed import (
            encode_blocks_pallas, pack_channels, unpack_plane,
        )

        ch = cfg.channels
        h, w = images.shape[1:3]
        grid = layout.grid_for(h, w)
        nb = grid.num_blocks

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("img"), P("img")),
            out_specs=(P("img"), P("img"), P()),
            check_vma=False,
        )
        def shard_fn(imgs, ks):
            n_loc = imgs.shape[0]
            px, mask = jax.vmap(lambda im: layout.blockify(im, BLOCK_SIZE)[:2])(imgs)
            # (n_loc, C, P, NB) -> (C, P, n_loc*NB): the shard is one big
            # block batch for the kernel
            px_all = px.transpose(1, 2, 0, 3).reshape(px.shape[1], 64, n_loc * nb)
            mask_all = mask.transpose(1, 0, 2).reshape(64, n_loc * nb)
            packed = pack_channels(px_all)
            seed_s = jax.random.randint(ks[0], (), 0, 2**31 - 1, jnp.int32)
            shifts, q_packed, dec_packed = encode_blocks_pallas(
                packed, mask_all, cfg, seed_s
            )[:3]
            dec = jnp.stack([unpack_plane(dec_packed, c) for c in range(ch)])
            src = px_all[:ch].astype(jnp.int32)
            mask_i = mask_all.astype(jnp.int32)
            err = (weighted_error(dec, src) * mask_i).astype(jnp.float32)
            err_img = err.sum(axis=0).reshape(n_loc, nb).sum(axis=1)
            npx = h * w
            psnr = 10.0 * jnp.log10(
                max_possible_error(ch) / jnp.maximum(err_img / npx, 1e-12)
            )
            count = mask_i.sum(axis=0).reshape(n_loc, nb)
            s_eff = jnp.minimum(shifts, 8).reshape(3, n_loc, nb)
            bits = ((8 - s_eff) * count[None]).sum(axis=(0, 2))
            bpp = (bits + static_block_bits(ch) * nb) / npx
            mean_psnr = jax.lax.psum(psnr.sum(), "img") / n
            return psnr, bpp, mean_psnr
    else:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("img"), P("img")),
            out_specs=(P("img"), P("img"), P()),
        )
        def shard_fn(imgs, ks):
            psnr, bpp = jax.vmap(
                lambda im, k: _encode_one_image_stats(im, cfg, k)[:2]
            )(imgs, ks)
            mean_psnr = jax.lax.psum(psnr.sum(), "img") / n
            return psnr, bpp, mean_psnr

    psnr, bpp, mean_psnr = jax.jit(shard_fn)(images, keys)
    return {
        "psnr": np.asarray(psnr),
        "bpp": np.asarray(bpp),
        "mean_psnr": float(mean_psnr),
    }


def encode_corpus_sharded_merged(images, cfg: EncodeConfig,
                                 n_devices: int | None = None, seed: int = 0,
                                 num_levels: int = 3, coalesce: bool = True,
                                 use_pallas: bool = True):
    """Corpus encode with the DEFAULT (merged/blocked-analog) encoder
    sharded over a device mesh.

    Same contract as encode_corpus_sharded (same-shape (N, H, W, C) batch, N
    divisible by the mesh), but every image runs the merged pipeline
    (quadtree merge + run/rectangle coalescing) instead of the fixed grid;
    per-image encodes are embarrassingly parallel across chips and the
    corpus-mean PSNR is an on-device psum. ``use_pallas=False`` selects the
    dense jnp merged path (threefry dithering) -- the configuration a CPU
    mesh can run at the DEFAULT config, since the fused kernels'
    pltpu-PRNG dither has no interpret-mode lowering.

    Run-buffer capacity inside shard_map is the fused path's
    latency-bounded default (the host-side auto-capacity decision cannot
    run per image inside shard_map); small grids get full capacity either
    way, and corpora needing unbounded capacity on big images should
    encode per image through the host API.
    """
    from ..regions import (
        encode_image_merged_device, encode_image_merged_fused_device,
    )

    mesh = make_mesh(n_devices)
    images = jnp.asarray(images)
    n = images.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), n)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("img"), P("img")),
        out_specs=(P("img"), P("img"), P()),
        check_vma=False,
    )
    def shard_fn(imgs, ks):
        def one(args):
            im, k = args
            if use_pallas:
                out = encode_image_merged_fused_device(
                    im, cfg, k, num_levels, emit_planes=False,
                    coalesce=coalesce,
                )
            else:
                out = encode_image_merged_device(
                    im, cfg, k, num_levels, use_pallas=False,
                    emit_planes=False, coalesce=coalesce,
                )
            npx = im.shape[0] * im.shape[1]
            mse = out["total_err"] / npx
            psnr = 10.0 * jnp.log10(
                max_possible_error(cfg.channels) / jnp.maximum(mse, 1e-12)
            )
            return psnr, out["mean_bpp"]

        psnr, bpp = jax.lax.map(one, (imgs, ks))
        mean_psnr = jax.lax.psum(psnr.sum(), "img") / n
        return psnr, bpp, mean_psnr

    psnr, bpp, mean_psnr = jax.jit(shard_fn)(images, keys)
    return {
        "psnr": np.asarray(psnr),
        "bpp": np.asarray(bpp),
        "mean_psnr": float(mean_psnr),
    }


def encode_corpus_sharded_mixed(images, cfg: EncodeConfig,
                                n_devices: int | None = None, seed: int = 0,
                                use_pallas: bool = False):
    """Mixed-size corpus encode: bucket by shape, shard each bucket.

    A real corpus has many resolutions; XLA needs static shapes, so images
    are grouped into (H, W, C) buckets (SURVEY.md section 7 step 7), each
    bucket padded to a multiple of the mesh size by repeating its last image
    and encoded with :func:`encode_corpus_sharded`. Pad entries are dropped
    from the results, so per-image stats and the corpus mean stay exact.

    ``images``: list of (H, W, C) uint8 arrays and/or file paths. Returns
    per-image psnr/bpp in input order + exact corpus mean psnr.
    """
    import os

    arrs = []
    for im in images:
        if isinstance(im, (str, os.PathLike)):
            from ..io import load_image

            im, _ = load_image(im)
        arrs.append(np.asarray(im))

    buckets: dict[tuple, list[int]] = {}
    for i, a in enumerate(arrs):
        buckets.setdefault(a.shape, []).append(i)

    mesh_n = n_devices if n_devices is not None else len(jax.devices())
    psnr = np.zeros(len(arrs), np.float64)
    bpp = np.zeros(len(arrs), np.float64)
    for shape, idxs in sorted(buckets.items()):
        batch = np.stack([arrs[i] for i in idxs])
        pad = (-len(idxs)) % mesh_n
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        out = encode_corpus_sharded(
            batch, cfg, n_devices=n_devices, seed=seed, use_pallas=use_pallas
        )
        psnr[idxs] = out["psnr"][: len(idxs)]
        bpp[idxs] = out["bpp"][: len(idxs)]
    return {
        "psnr": psnr,
        "bpp": bpp,
        "mean_psnr": float(psnr.mean()) if len(arrs) else 0.0,
        "buckets": {str(k): len(v) for k, v in buckets.items()},
    }


def encode_image_blocks_sharded(image, cfg: EncodeConfig, n_devices: int | None = None,
                                seed: int = 0, use_pallas: bool = False):
    """Single-image encode with the *block* axis sharded across chips.

    The block tensors' NB axis is laid out over the mesh; all encode stages
    are block-elementwise so the only communication is the stats reduction.
    NB must be divisible by the mesh size (guaranteed by padding in
    blockify for typical sizes; asserts otherwise). ``use_pallas`` runs the
    fused kernel inside a shard_map so each chip encodes its block shard.
    """
    mesh = make_mesh(n_devices, axis="blk")
    image = jnp.asarray(image)
    px, mask, grid = layout.blockify(image, BLOCK_SIZE)
    nb = px.shape[-1]
    ndev = mesh.devices.size
    # pallas lane tiles want multiples of 256 blocks per shard
    mult = ndev * (256 if use_pallas else 1)
    pad = (-nb) % mult
    if pad:
        px = jnp.pad(px, ((0, 0), (0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    key = jax.random.PRNGKey(seed)

    sharding = NamedSharding(mesh, P(None, None, "blk"))
    px = jax.device_put(px, sharding)
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, "blk")))

    if use_pallas:
        from ..pallas_kernels.encode_fixed import (
            encode_blocks_pallas, pack_channels, unpack_plane,
        )

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def run(px, mask, cfg, key):
            ch = cfg.channels

            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(None, None, "blk"), P(None, "blk")),
                out_specs=(P(None, None, "blk"), P(None, "blk"), P(), P()),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
            def shard_fn(px_s, mask_s):
                packed = pack_channels(px_s)
                seed_s = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
                shifts, q_packed, dec_packed = encode_blocks_pallas(
                    packed, mask_s, cfg, seed_s
                )[:3]
                dec = jnp.stack([unpack_plane(dec_packed, c) for c in range(ch)])
                src = px_s[:ch].astype(jnp.int32)
                mask_i = mask_s.astype(jnp.int32)
                err = (
                    weighted_error(dec, src) * mask_i
                ).astype(jnp.float32).sum()
                count = mask_i.sum(axis=0)
                bits = (
                    (8 - jnp.minimum(shifts, 8)) * count[None]
                ).astype(jnp.float32).sum()
                return (dec, shifts, jax.lax.psum(err, "blk"),
                        jax.lax.psum(bits, "blk"))

            return shard_fn(px, mask)
    else:
        @functools.partial(jax.jit, static_argnames=("cfg",))
        def run(px, mask, cfg, key):
            res = encode_blocks(px, mask, cfg, key)
            src = px[: cfg.channels].astype(jnp.int32)
            err = (weighted_error(res.decoded, src) * mask.astype(jnp.int32)).astype(jnp.float32).sum()
            return res.decoded, res.shifts, err, res.accum_bits.sum().astype(jnp.float32)

    decoded, shifts, err, bits = run(px, mask, cfg, key)
    n = grid.height * grid.width
    mse = float(err) / n
    psnr = 10.0 * np.log10(max_possible_error(cfg.channels) / max(mse, 1e-12))
    bpp = (float(bits) + static_block_bits(cfg.channels) * grid.num_blocks) / n
    if pad:
        decoded = decoded[..., :nb]
    img = layout.unblockify(decoded.astype(jnp.uint8), grid, BLOCK_SIZE)
    return np.asarray(img), float(psnr), float(bpp)
