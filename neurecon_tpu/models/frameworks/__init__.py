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
