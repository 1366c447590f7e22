def get_model(args):
    """Dispatch on args.model.framework — returns
    (model, trainer, render_kwargs_train, render_kwargs_test, volume_render_fn)
    mirroring the reference contract (models/frameworks/__init__.py:1-10)."""
    framework = args.model.framework
    if framework == "NeuS":
        from neurecon_tpu.models.frameworks import neus
        return neus.get_model(args)
    elif framework == "VolSDF":
        from neurecon_tpu.models.frameworks import volsdf
        return volsdf.get_model(args)
    elif framework == "UNISURF":
        from neurecon_tpu.models.frameworks import unisurf
        return unisurf.get_model(args)
    else:
        raise NotImplementedError(framework)


def get_ray_loss_fn(args, model, render_kwargs_train):
    """Per-framework ray-batch loss (the shardable inner loss) — used by the
    multi-chip training path."""
    framework = args.model.framework
    if framework == "NeuS":
        from neurecon_tpu.models.frameworks.neus import make_ray_loss_fn
    elif framework == "VolSDF":
        from neurecon_tpu.models.frameworks.volsdf import make_ray_loss_fn
    elif framework == "UNISURF":
        from neurecon_tpu.models.frameworks.unisurf import make_ray_loss_fn
    else:
        raise NotImplementedError(framework)
    return make_ray_loss_fn(model, args, render_kwargs_train)


def get_pipeline_fns(args, model, render_kwargs_train):
    """Optional split of the train step into a gradient-free depth sampler +
    a loss-given-samples fn, for the software-pipelined (overlap_sampler)
    train block. Returns None for frameworks that don't support it yet."""
    if args.model.framework == "NeuS":
        from neurecon_tpu.models.frameworks.neus import make_pipeline_fns
        return make_pipeline_fns(model, args, render_kwargs_train)
    if args.model.framework == "VolSDF":
        from neurecon_tpu.models.frameworks.volsdf import make_pipeline_fns
        return make_pipeline_fns(model, args, render_kwargs_train)
    if args.model.framework == "UNISURF":
        from neurecon_tpu.models.frameworks.unisurf import make_pipeline_fns
        return make_pipeline_fns(model, args, render_kwargs_train)
    return None


def checkpoint_render_kwargs(args, step=None):
    """Framework-specific render kwargs that depend on the TRAINING STEP a
    checkpoint was saved at — pass the result into render calls (train-loop
    validation, eval_rgb/eval_staged/render_view) so a checkpoint is rendered
    under the sampling schedule it was actually trained with.

    UNISURF's sampling interval Δ decays over training (ref train loop /
    configs/unisurf.yaml delta_max/delta_min/delta_beta); rendering a
    checkpoint at the wrong Δ queries the radiance outside its supervised
    band. NeuS/VolSDF have no step-dependent render state (s and β live in
    the params pytree) and return {}.

    `step=None` (or a negative step from a checkpoint without global_step)
    falls back to the end-of-training schedule, the common case for
    final/latest checkpoints.
    """
    if args.model.framework != "UNISURF":
        return {}
    from neurecon_tpu.models.frameworks.unisurf import interval_at
    if step is None or step < 0:
        step = int(args.training.num_iters)
    return {"interval": interval_at(args, step)}
