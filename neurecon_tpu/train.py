"""Training entry point: `python -m neurecon_tpu.train --config configs/neus.yaml`.

Mirrors the reference loop (train.py:24-285) with a TPU-native body:
  * whole dataset preloaded to device HBM once; per-step image selection,
    pixel sampling, rendering, loss, grads and adam all inside one compiled
    step (zero per-step host work beyond dispatch)
  * multi-device: rays sharded over a 1-D mesh, params replicated, gradient
    psum by XLA (replaces DataParallel/DDP/SLURM, utils/dist_util.py)
  * periodic: full-image validation renders (chunked jitted renderer),
    marching-tetrahedra mesh extraction, time-based `latest` checkpoints,
    iteration-based numbered backups, KeyboardInterrupt save
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu import config as config_lib
from neurecon_tpu.dataio import get_data
from neurecon_tpu.models.base import count_parameters, make_optimizer
from neurecon_tpu.models.frameworks import get_model, get_ray_loss_fn
from neurecon_tpu.ops import get_rays, lin2img
from neurecon_tpu.training import (TrainState, init_train_state, make_train_step,
                                   render_full_image, sample_ray_batch)
from neurecon_tpu.utils import io as io_util
from neurecon_tpu.utils.checkpoints import CheckpointIO
from neurecon_tpu.utils.console import log
from neurecon_tpu.utils.logger import Logger
from neurecon_tpu.utils.mesh import extract_mesh


def _dataset_to_device(dataset):
    data = {
        "c2w": jnp.asarray(dataset.c2w_all),
        "intrinsics": jnp.asarray(dataset.intrinsics_all),
        "rgb": jnp.asarray(dataset.rgb_images),
    }
    if getattr(dataset, "object_masks", None) is not None:
        data["object_mask"] = jnp.asarray(dataset.object_masks)
    if getattr(dataset, "masks_ignore", None) is not None:
        data["mask_ignore"] = jnp.asarray(dataset.masks_ignore)
    return data


def _slice_image(data, idx):
    return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
            for k, v in data.items()}


def main_function(args):
    exp_dir = args.training.exp_dir
    mesh_dir = os.path.join(exp_dir, "meshes")
    io_util.cond_mkdir(exp_dir)

    # The config value is authoritative either way: a pre-exported
    # NEURECON_FUSED_* shell var (the old opt-in workflow) must not override
    # --training:fused_samplers false. Measured on v5e: NeuS step -9.6%,
    # VolSDF step 2.30x (docs/performance.md); UNISURF's kernel is neutral
    # and stays off. The samplers are gradient-free by construction.
    fused = args.training.get("fused_samplers", False)
    for k in ("NEURECON_FUSED_UPSAMPLE", "NEURECON_FUSED_FINESAMPLE"):
        os.environ[k] = "1" if fused else "0"
    # The TRAIN-PATH fused nablas kernel (custom VJP, ops/fused_nablas_vjp.py)
    # replaces the step's dominant grad-of-grad block; same authority rule.
    os.environ["NEURECON_FUSED_NABLAS_VJP"] = (
        "1" if args.training.get("fused_nablas_vjp", False) else "0")

    logger = Logger(log_dir=exp_dir,
                    img_dir=os.path.join(exp_dir, "imgs"),
                    monitoring=args.training.get("monitoring", "tensorboard"),
                    monitoring_dir=os.path.join(exp_dir, "events"))
    log.info(f"=> Experiments dir: {exp_dir}")

    io_util.backup(os.path.join(exp_dir, "backup"))
    config_lib.save_config(args, os.path.join(exp_dir, "config.yaml"))

    dataset, val_dataset = get_data(args, return_val=True,
                                    val_downscale=args.data.get("val_downscale", 4.0))

    model, trainer_factory, render_kwargs_train, render_kwargs_test, \
        render_factory = get_model(args)
    render_kwargs_train["H"], render_kwargs_train["W"] = dataset.H, dataset.W
    render_kwargs_test["H"], render_kwargs_test["W"] = val_dataset.H, val_dataset.W

    seed = int(args.get("seed", 42))
    root_key = jax.random.PRNGKey(seed)
    init_key, train_key = jax.random.split(root_key)
    params = model.init(init_key)
    log.info(f"=> Model params: {count_parameters(params)}")

    optimizer = make_optimizer(args, params)
    from neurecon_tpu.models.base import make_schedule
    lr_factor = make_schedule(args)
    lr_cfg = args.training.lr
    base_lr = float(lr_cfg["default"] if isinstance(lr_cfg, dict) else lr_cfg)

    # ---- checkpoints ----
    checkpoint_io = CheckpointIO(checkpoint_dir=os.path.join(exp_dir, "ckpts"))
    load_dict = checkpoint_io.load_file(
        args.training.get("ckpt_file", None),
        ignore_keys=args.training.get("ckpt_ignore_keys", []),
        only_use_keys=args.training.get("ckpt_only_use_keys", None))
    logger.load_stats("stats.p")
    it = int(load_dict.get("global_step", 0))
    epoch_idx = int(load_dict.get("epoch_idx", 0))
    if "model" in load_dict:
        params.update(load_dict["model"])
    opt_state = load_dict.get("opt_state", None)
    if opt_state is None:
        opt_state = optimizer.init(params)
        if it > 0:  # params-only checkpoint: resume the lr schedule at `it`
            from neurecon_tpu.training import fast_forward_schedule
            opt_state = fast_forward_schedule(opt_state, it)

    # ---- SIREN sphere pretrain (must come after checkpoint load) ----
    surf_mod = model.implicit_surface
    if (surf_mod.use_siren and surf_mod.geometric_init and it == 0
            and "model" not in load_dict):
        from neurecon_tpu.models.base import pretrain_siren_sdf
        log.info("=> pretraining SIREN sdf to a sphere ...")
        pre_key = jax.random.fold_in(root_key, 7)
        new_surf, pre_losses = pretrain_siren_sdf(
            surf_mod, params["implicit_surface"], pre_key,
            lr=float(args.training.get("lr_pretrain", 1e-4)),
            target_radius=surf_mod.radius_init,
            obj_bounding_size=surf_mod.obj_bounding_size)
        params["implicit_surface"] = new_surf
        log.info(f"   pretrain final l1: {float(pre_losses[-1]):.4f}")
        checkpoint_io.save("latest.pt", global_step=it, epoch_idx=epoch_idx,
                           model=params, opt_state=opt_state)

    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.asarray(it, jnp.int32))

    # ---- data to HBM, compiled step ----
    data_dev = _dataset_to_device(dataset)
    # keep only fields the framework's loss consumes — an unused program
    # parameter (e.g. object_mask for VolSDF) crashes this environment's
    # AOT compiler, and is dead weight everywhere else
    consumed = {"c2w", "intrinsics", "rgb"}
    fw = args.model.framework
    if fw == "NeuS" and bool(args.training.get("with_mask", False)):
        consumed.add("object_mask")
    if fw in ("NeuS", "VolSDF"):
        consumed.add("mask_ignore")
    data_dev = {k: v for k, v in data_dev.items() if k in consumed}
    n_images = int(data_dev["c2w"].shape[0])
    H, W = dataset.H, dataset.W
    N_rays = int(args.data.N_rays)

    n_devices = jax.local_device_count()
    overlap_sampler = bool(args.training.get("overlap_sampler", False))
    pipeline_fns = None
    if overlap_sampler:
        from neurecon_tpu.models.frameworks import get_pipeline_fns
        pipeline_fns = get_pipeline_fns(args, model, render_kwargs_train)
        if pipeline_fns is None:
            log.warn(f"training.overlap_sampler: not supported for "
                     f"{args.model.framework}, using the standard step")
    # the pipelined block lives in the sharded path; a 1-device mesh makes
    # its sharding constraints no-ops, so overlap_sampler routes single-chip
    # training through it too
    use_sharding = (n_devices > 1 or pipeline_fns is not None) \
        and N_rays % n_devices == 0
    steps_per_call = int(args.training.get("steps_per_call", 1))
    mesh = None
    if use_sharding:
        # K sharded steps per dispatch: ray sampling, sharding constraint,
        # grad psum and adam all inside one compiled scan
        from neurecon_tpu.parallel import make_mesh
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        log.info(f"=> sharding rays over {n_devices} devices"
                 + (" (pipelined sampler)" if pipeline_fns else ""))
        mesh = make_mesh()
        ray_loss = get_ray_loss_fn(args, model, render_kwargs_train)

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, _slice_image(data, idx), H, W, N_rays)

        block_fn = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                            pipeline_fns=pipeline_fns)

        def run_block(state, idxs, key):
            return block_fn(state, data_dev, idxs, key)

        def run_step(state, idx, key):
            return block_fn(state, data_dev, jnp.asarray([idx]), key)
    else:
        loss_fn_img = trainer_factory(render_kwargs_train)

        def loss_fn(params, batch, key, it_):
            data, idx = batch
            return loss_fn_img(params, _slice_image(data, idx), key, it_)

        step_fn = make_train_step(loss_fn, optimizer)

        def run_step(state, idx, key):
            return step_fn(state, (data_dev, idx), key)

        # K steps per dispatch: amortizes host/tunnel round-trips. One jitted
        # lax.scan over K image indices; metrics come from the last step.
        if steps_per_call > 1:
            inner_step = make_train_step(loss_fn, optimizer, jit=False)

            @jax.jit
            def run_block(state, idxs, key):
                def body(carry, xs):
                    idx, k = xs
                    st, metrics = inner_step(carry, (data_dev, idx), k)
                    return st, metrics
                keys = jax.random.split(key, idxs.shape[0])
                state, metrics = jax.lax.scan(body, state, (idxs, keys))
                last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
                return state, last

    # ---- validation renderer ----
    val_render_kwargs = {k: v for k, v in render_kwargs_test.items()
                         if k not in ("H", "W", "rayschunk")}
    render_fn_test = render_factory(detailed_output=False, calc_normal=True,
                                    **val_render_kwargs)
    val_rayschunk = int(args.data.get("val_rayschunk", 4096))

    def do_validation(state, it):
        # seeded by (run seed, it): runs are exactly reproducible
        val_idx = int(np.random.RandomState(seed + it).randint(len(val_dataset)))
        _, val_in, val_gt = val_dataset[val_idx]
        Hv, Wv = val_dataset.H, val_dataset.W
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(0), jnp.asarray(val_in["c2w"]),
            jnp.asarray(val_in["intrinsics"]), Hv, Wv, N_rays=-1)
        # render under the CURRENT training-step sampling schedule (e.g.
        # UNISURF's decayed interval Δ) — a distinct Δ recompiles the val
        # render, which is rare (i_val-spaced, and constant once Δ hits
        # delta_min)
        from neurecon_tpu.models.frameworks import checkpoint_render_kwargs
        ret = render_full_image(render_fn_test, state.params, rays_o, rays_d,
                                jax.random.fold_in(train_key, it),
                                rayschunk=val_rayschunk, mesh=mesh,
                                **checkpoint_render_kwargs(args, it))
        to_img = lambda t: np.asarray(lin2img(jnp.asarray(t), Hv, Wv))
        logger.add_imgs(to_img(val_gt["rgb"].reshape(-1, 3)), "val/gt_rgb", it)
        logger.add_imgs(to_img(ret["rgb"]), "val/predicted_rgb", it)
        depth = ret["depth_volume"][..., None]
        logger.add_imgs(to_img(depth / (depth.max() + 1e-10)),
                        "val/pred_depth_volume", it)
        logger.add_imgs(to_img(ret["mask_volume"][..., None]),
                        "val/pred_mask_volume", it)
        if "depth_surface" in ret:
            ds = ret["depth_surface"][..., None]
            logger.add_imgs(to_img(ds / (ds.max() + 1e-10)),
                            "val/pred_depth_surface", it)
        if "mask_surface" in ret:
            logger.add_imgs(to_img(ret["mask_surface"][..., None].astype(np.float32)),
                            "val/predicted_mask", it)
        if "normals_volume" in ret:
            logger.add_imgs(to_img(ret["normals_volume"] / 2.0 + 0.5),
                            "val/predicted_normals", it)
        if "beta_map" in ret:  # VolSDF diagnostics (ref volsdf.py:647-683)
            bm = ret["beta_map"][..., None]
            logger.add_imgs(to_img(bm / (bm.max() + 1e-10)), "val/beta_heat_map", it)
            iu = ret["iter_usage"][..., None].astype(np.float32)
            iu[iu == -1] = iu.max() + 1
            logger.add_imgs(to_img(iu / (iu.max() + 1e-10)),
                            "val/upsample_iters", it)

    def do_mesh(state, it):
        io_util.cond_mkdir(mesh_dir)
        surface_fn = lambda x: model.implicit_surface.forward_query(
            state.params["implicit_surface"], x)
        extract_mesh(surface_fn,
                     volume_size=args.data.get("volume_size", 2.0),
                     N=int(args.data.get("mesh_N", 256)),
                     filepath=os.path.join(mesh_dir, f"{it:08d}.ply"))

    # ---- loop ----
    i_save = args.training.get("i_save", 900)
    i_backup = int(args.training.get("i_backup", 50000))
    i_val = int(args.training.get("i_val", 500))
    i_val_mesh = int(args.training.get("i_val_mesh", 10000))
    i_log = int(args.training.get("i_log", 20))
    i_param_hist = int(args.training.get("i_param_hist", -1))
    # optional profiler capture (SURVEY §5.1: the reference only logs wall
    # time): NEURECON_PROFILE_STEPS='<start>:<stop>' (env var, or a
    # training.profile_steps yaml key) writes a jax.profiler trace under
    # exp_dir/profile for xprof/tensorboard
    profile_steps = os.environ.get(
        "NEURECON_PROFILE_STEPS", args.training.get("profile_steps", None))
    prof_start = prof_stop = -1
    prof_active = False
    if profile_steps:
        try:
            prof_start, prof_stop = (int(v) for v in str(profile_steps).split(":"))
            if prof_stop <= prof_start or prof_start < 0:
                raise ValueError(f"need 0 <= start < stop, got {profile_steps!r}")
        except ValueError as e:
            log.warning(f"ignoring malformed NEURECON_PROFILE_STEPS "
                        f"(want '<start>:<stop>'): {e}")
            prof_start = prof_stop = -1
    special_i_val_mesh = [3000, 5000, 7000]
    num_iters = int(args.training.num_iters)

    K = steps_per_call if steps_per_call > 1 else 1
    log.info(f"=> Start training..., it={it}, in {exp_dir} "
             f"({K} steps per dispatch)")
    t0 = time.time()
    t_last_log = time.time()
    it_last_log = it
    perm = np.random.RandomState(seed + epoch_idx).permutation(n_images)
    perm_pos = 0
    metrics = None

    def _next_multiple(x, m):
        return ((x // m) + (1 if x % m else 0)) * m if x > 0 else 0

    next_val = _next_multiple(it, i_val) if i_val > 0 else None
    mesh_its = sorted({m for m in special_i_val_mesh if m > it}
                      | ({m for m in range(i_val_mesh, num_iters + 1, i_val_mesh)
                          if m > it} if i_val_mesh > 0 else set()))
    next_log = it + i_log
    try:
        while it < num_iters:
            # ---- validation / mesh ----
            if next_val is not None and it >= next_val:
                do_validation(state, it)
                while next_val <= it:
                    next_val += i_val
            while mesh_its and it >= mesh_its[0]:
                do_mesh(state, mesh_its.pop(0))

            # ---- optional profiler window ----
            if prof_start >= 0 and it >= prof_start:
                try:
                    jax.profiler.start_trace(os.path.join(exp_dir, "profile"))
                    prof_active = True
                    log.info(f"=> profiler trace started at it={it}")
                except Exception as e:  # tunnel/backends without profiling
                    log.warning(f"profiler unavailable: {e}")
                prof_start = -1
            if prof_stop >= 0 and prof_active and it >= prof_stop:
                try:
                    jax.profiler.stop_trace()
                    log.info(f"=> profiler trace written to {exp_dir}/profile")
                except Exception:
                    pass
                prof_active = False
                prof_stop = -1

            # ---- K train steps in one dispatch ----
            K_eff = min(K, num_iters - it)
            idxs = []
            for _ in range(K_eff):
                if perm_pos >= n_images:
                    epoch_idx += 1
                    perm = np.random.RandomState(
                        seed + epoch_idx).permutation(n_images)
                    perm_pos = 0
                idxs.append(int(perm[perm_pos]))
                perm_pos += 1
            key = jax.random.fold_in(train_key, it)
            if K_eff == K and K > 1:
                state, metrics = run_block(state, jnp.asarray(idxs), key)
            else:
                # tail block (num_iters % K) runs step-by-step: a [K_eff]-
                # shaped block would trigger a one-off recompile of the full
                # program (minutes through the remote compile service)
                for j, idx in enumerate(idxs):
                    state, metrics = run_step(
                        state, jnp.asarray(idx),
                        key if K_eff == 1 else jax.random.fold_in(key, j))
            it += K_eff

            # ---- optional param histograms (ref logger.py:130-133) ----
            if i_param_hist > 0 and (it % i_param_hist) < K_eff and it >= i_param_hist:
                logger.add_module_param("model", state.params, it)

            # ---- logging (host fetch only every >= i_log steps) ----
            if it >= next_log and metrics is not None:
                next_log = it + i_log
                # ONE batched D2H for the whole metrics tree — per-leaf
                # float() would pay a tunnel round-trip per scalar (~9 ms/step
                # amortized at K=50 with ~30 logged scalars)
                m = jax.tree_util.tree_map(
                    float, jax.device_get(metrics))
                # NaN watchdog: on a non-finite loss, save a forensic
                # checkpoint (params + opt state AT the failure) and halt
                # instead of silently training a dead model for hours —
                # long-horizon failure detection the reference lacks
                # (its loop never checks, ref train.py:195-210)
                if not np.isfinite(m["losses"]["total"]):
                    log.error(f"non-finite loss at it={it}: "
                              f"{m['losses']} — saving nan_{it:08d}.pt")
                    checkpoint_io.save(f"nan_{it:08d}.pt", global_step=it,
                                       epoch_idx=epoch_idx, model=state.params,
                                       opt_state=state.opt_state)
                    logger.save_stats("stats.p")
                    if bool(args.training.get("halt_on_nan", True)):
                        raise RuntimeError(
                            f"training diverged (non-finite loss) at it={it}; "
                            f"forensic checkpoint saved")
                for k, v in m["losses"].items():
                    logger.add("losses", k, v, it)
                for k, v in m["grad_norms"].items():
                    logger.add("grad", k, v, it)
                for k, v in m.get("scalars", {}).items():
                    logger.add("scalars", k, v, it)
                # ref train.py:240,250-259: lr + intermediates' mean/min/max/norm
                logger.add("learning rates", "whole",
                           base_lr * float(lr_factor(it)), it)
                for k, v in m.get("extras_stats", {}).items():
                    name, stat = k.rsplit(".", 1)
                    logger.add(f"extras_{name}", f"whole.{stat}", v, it)
                dt = (time.time() - t_last_log) / max(it - it_last_log, 1)
                t_last_log, it_last_log = time.time(), it
                logger.add("perf", "sec_per_step", dt, it)
                log.info(f"it={it} loss={m['losses']['total']:.4f} "
                         f"({dt * 1000:.0f} ms/step, "
                         f"{N_rays / max(dt, 1e-9):.0f} rays/s)")

            # ---- checkpointing ----
            if i_save > 0 and time.time() - t0 > i_save:
                checkpoint_io.save("latest.pt", global_step=it, epoch_idx=epoch_idx,
                                   model=state.params, opt_state=state.opt_state)
                logger.save_stats("stats.p")
                t0 = time.time()
            if i_backup > 0 and (it % i_backup) < K_eff and it >= i_backup:
                checkpoint_io.save(f"{it:08d}.pt", global_step=it,
                                   epoch_idx=epoch_idx, model=state.params,
                                   opt_state=state.opt_state)
    except KeyboardInterrupt:
        checkpoint_io.save("latest.pt", global_step=it, epoch_idx=epoch_idx,
                           model=state.params, opt_state=state.opt_state)
        logger.save_stats("stats.p")
        sys.exit()
    finally:
        if prof_active:  # loop ended inside the capture window: flush it
            try:
                jax.profiler.stop_trace()
                log.info(f"=> profiler trace written to {exp_dir}/profile")
            except Exception:
                pass

    checkpoint_io.save(f"final_{it:08d}.pt", global_step=it, epoch_idx=epoch_idx,
                       model=state.params, opt_state=state.opt_state)
    logger.save_stats("stats.p")
    log.info("Everything done.")


if __name__ == "__main__":
    config, _args = config_lib.parse_cli()
    main_function(config)
