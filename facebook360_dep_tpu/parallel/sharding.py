"""Multi-chip parallelism for depth estimation.

The reference scales with an embarrassingly-parallel RabbitMQ farm over
(stage, frame-chunk) jobs (``scripts/render/pipeline.py:173-248``). On TPU the
axes map to a device mesh (SURVEY.md §2.10):

- **cameras** shard over ICI: each chip solves its destination cameras; the
  only cross-camera exchange is the disparity all-gather feeding mismatch
  handling (Derp.cpp:553-748), which rides `jax.lax.all_gather` over the
  ``cam`` axis.
- **frames** shard over additional mesh axes / hosts (pure data parallelism,
  no collectives) — the farm layer in ``facebook360_dep_tpu.farm``.

Source images are replicated (every camera matches against every source, as
in the reference where every worker loads the full rig's imagery).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..depth import solver


def camera_mesh(devices=None, axis_name: str = "cam") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _replicated_specs(ctx: solver.LevelContext):
    """PartitionSpecs: dst-indexed leaves sharded over 'cam', rest replicated."""
    dst_fields = {"dst_cams", "dst_fov_masks", "dst_fg_masks", "dst_bg_disp", "dst2src"}
    specs = {}
    for name in ctx._fields:
        leaf = getattr(ctx, name)
        if name in dst_fields:
            spec = jax.tree.map(lambda _: P("cam"), leaf)
        else:
            spec = jax.tree.map(lambda _: P(), leaf)
        specs[name] = spec
    return solver.LevelContext(**specs)


def process_level_sharded(ctx: solver.LevelContext, cfg: solver.SolverConfig, mesh: Mesh, init_disparity=None, key=None):
    """process_level with destination cameras sharded over the mesh.

    Each device runs the per-camera solve on its shard; mismatch handling
    all-gathers the disparity stack across ICI first. D must divide evenly by
    the mesh size.
    """
    d = int(np.asarray(ctx.dst2src).shape[0])
    n_dev = mesh.devices.size
    assert d % n_dev == 0, f"{d} dst cameras not divisible by {n_dev} devices"
    if key is None:
        key = jax.random.PRNGKey(cfg.level)

    h, w = ctx.src_imgs.shape[1:3]
    has_init = init_disparity is not None
    if not has_init:
        init_disparity = jnp.zeros((d, h, w), jnp.float32)

    ctx_specs = _replicated_specs(ctx)
    init_spec = P("cam")
    out_spec = {k: P("cam") for k in ("disparity", "cost", "confidence", "mismatches")}

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(ctx_specs, init_spec, P()),
        out_specs=out_spec,
        check_vma=False,
    )
    def run(local_ctx, local_init, key):
        coarsest = cfg.level == cfg.num_levels - 1
        d_local = local_ctx.dst_fov_masks.shape[0]

        if coarsest or not has_init:
            disp, costs, conf = solver.brute_force_all(local_ctx, cfg)
        else:
            disp = jnp.asarray(local_init, jnp.float32)
            costs = jnp.full((d_local, h, w), jnp.inf, jnp.float32)
            conf = jnp.zeros((d_local, h, w), jnp.float32)

        mismatch_mask = jnp.zeros((d_local, h, w), bool)
        if not coarsest:
            disp, costs, conf = solver.random_proposals(local_ctx, cfg, disp, costs, conf, key)
            disp, costs, conf = solver.ping_pong(local_ctx, cfg, disp, costs, conf)
            if 0 <= cfg.level <= cfg.mismatches_start_level:
                # the one cross-camera exchange: gather every shard's maps
                full = jax.lax.all_gather(disp, "cam").reshape(-1, h, w)
                disp, mismatch_mask = solver.handle_mismatches(local_ctx, cfg, disp, full)

        if cfg.do_bilateral_filter:
            disp = solver.spatial_bilateral(local_ctx, cfg, disp)
        if cfg.do_median_filter:
            disp = solver.median_filter(local_ctx, cfg, disp)
        disp = solver.mask_fov(local_ctx, disp)
        return {"disparity": disp, "cost": costs, "confidence": conf, "mismatches": mismatch_mask}

    args = (ctx, init_disparity, key)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), (ctx_specs, init_spec, P()),
        is_leaf=lambda x: isinstance(x, P),
    )
    args = jax.device_put(args, shardings)
    return jax.jit(run)(*args)


def frame_camera_mesh(devices=None, frame_axis: int = 2) -> Mesh:
    """2D mesh: data-parallel frames x model-parallel cameras.

    The reference farm's frame-chunk data parallelism (pipeline.py:173-248)
    becomes the 'frame' mesh axis (no collectives); the camera axis carries
    the mismatch-handling all-gather over ICI.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    assert n % frame_axis == 0, (n, frame_axis)
    grid = np.asarray(devices).reshape(frame_axis, n // frame_axis)
    return Mesh(grid, ("frame", "cam"))


def process_frames_sharded(
    base_ctx: solver.LevelContext,
    frame_imgs,  # (F, N, H, W, 3) color stacks, one per frame
    cfg: solver.SolverConfig,
    mesh: Mesh,
    init_disparity=None,  # (F, D, H, W) or None
    key=None,
):
    """Multi-frame, multi-camera sharded level solve on a ('frame', 'cam')
    mesh. Frames are pure data parallelism; cameras shard the per-frame
    solve with the all-gather exchange of process_level_sharded.

    ``base_ctx`` supplies the cameras/masks; per-frame image-dependent state
    (variance, planar sampling stack) is built on device.
    """
    from ..ops import cost, sampling, warp_pallas

    frame_imgs = jnp.asarray(frame_imgs, jnp.float32)
    f, n, h, w = frame_imgs.shape[:4]
    d = int(np.asarray(base_ctx.dst2src).shape[0])
    f_dev = mesh.shape["frame"]
    c_dev = mesh.shape["cam"]
    assert f % f_dev == 0, f"{f} frames not divisible by {f_dev}"
    assert d % c_dev == 0, f"{d} dst cameras not divisible by {c_dev}"
    if key is None:
        key = jax.random.PRNGKey(cfg.level)

    has_init = init_disparity is not None
    if not has_init:
        init_disparity = jnp.zeros((f, d, h, w), jnp.float32)
    use_pallas = base_ctx.src_imgs_t is not None

    ctx_specs = _replicated_specs(base_ctx)
    in_specs = (ctx_specs, P("frame"), P("frame", "cam"), P())
    out_spec = {k: P("frame", "cam") for k in ("disparity", "cost", "confidence", "mismatches")}

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_spec, check_vma=False)
    def run(local_ctx, local_imgs, local_init, key):
        coarsest = cfg.level == cfg.num_levels - 1

        def one_frame(args):
            imgs, init, fkey = args
            ctx = local_ctx._replace(
                src_imgs=imgs,
                src_variance=jax.vmap(sampling.rgb_variance)(imgs),
                src_imgs_t=(
                    # Must match solver.make_level_context exactly, including
                    # the k/256 quantization under cost.SRC_QUANT_EXACT and
                    # the (lossless) bf16 storage under cost.SRC_STACK_BF16;
                    # raw bf16 SAMPLES would corrupt the SSD (round-2 tail).
                    (
                        (lambda a: cost.quantize_src(a, dtype=cost.stack_dtype()))
                        if cost.SRC_QUANT_EXACT else (lambda a: a)
                    )(warp_pallas.planar_for_sampling(imgs[..., :3]).astype(jnp.float32))
                    if use_pallas
                    else None
                ),
            )
            d_local = ctx.dst_fov_masks.shape[0]
            if coarsest or not has_init:
                disp, costs, conf = solver.brute_force_all(ctx, cfg)
            else:
                disp = jnp.asarray(init, jnp.float32)
                costs = jnp.full((d_local, h, w), jnp.inf, jnp.float32)
                conf = jnp.zeros((d_local, h, w), jnp.float32)
            mismatch_mask = jnp.zeros((d_local, h, w), bool)
            if not coarsest:
                disp, costs, conf = solver.random_proposals(ctx, cfg, disp, costs, conf, fkey)
                disp, costs, conf = solver.ping_pong(ctx, cfg, disp, costs, conf)
                if 0 <= cfg.level <= cfg.mismatches_start_level:
                    full = jax.lax.all_gather(disp, "cam").reshape(-1, h, w)
                    disp, mismatch_mask = solver.handle_mismatches(ctx, cfg, disp, full)
            if cfg.do_bilateral_filter:
                disp = solver.spatial_bilateral(ctx, cfg, disp)
            if cfg.do_median_filter:
                disp = solver.median_filter(ctx, cfg, disp)
            disp = solver.mask_fov(ctx, disp)
            return {"disparity": disp, "cost": costs, "confidence": conf,
                    "mismatches": mismatch_mask}

        f_local = local_imgs.shape[0]
        fkeys = jax.random.split(jax.random.fold_in(key, jax.lax.axis_index("frame")), f_local)
        return jax.lax.map(one_frame, (local_imgs, local_init, fkeys))

    args = (base_ctx, frame_imgs, init_disparity, key)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), in_specs, is_leaf=lambda x: isinstance(x, P)
    )
    args = jax.device_put(args, shardings)
    return jax.jit(run)(*args)
