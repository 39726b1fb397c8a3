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
