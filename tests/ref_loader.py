"""Import machinery + weight-conversion helpers for DIRECT numeric parity
tests against the installed PyTorch reference at /root/reference.

The reference is treated as a read-only oracle: its modules are imported
in-process (with sys.path pointing at /root/reference and bytecode writing
disabled so nothing is written there), random reference weights are copied
into the JAX pytrees, and both sides are evaluated on identical inputs.
Nothing from the reference is vendored or persisted — this is measurement,
not reuse.

Missing-in-this-image reference deps (torchvision, addict) are satisfied with
minimal import-time stubs: the reference only touches them from code paths
these tests never call (Logger image grids, the addict-based config dict).
"""
from __future__ import annotations

import sys
import types

import numpy as np

REF_PATH = "/root/reference"

_loaded = {}


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")

        def _unavailable(*_a, **_k):  # Logger.add_imgs path — never used here
            raise RuntimeError("torchvision stub: not available in tests")

        tv_utils.make_grid = _unavailable
        tv_utils.save_image = _unavailable
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if "skimage" not in sys.modules:
        def _unavailable_sk(*_a, **_k):  # load_rgb rescale / marching_cubes
            raise RuntimeError("skimage stub: not available in tests")

        sk = types.ModuleType("skimage")
        sk_t = types.ModuleType("skimage.transform")
        sk_t.rescale = _unavailable_sk
        sk_m = types.ModuleType("skimage.measure")
        sk_m.marching_cubes = _unavailable_sk
        sk.transform, sk.measure = sk_t, sk_m
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk_t
        sys.modules["skimage.measure"] = sk_m
    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")

        class _Unavailable:  # mesh_util PLY writing — never used here
            def __init__(self, *_a, **_k):
                raise RuntimeError("plyfile stub: not available in tests")

        ply.PlyData = ply.PlyElement = _Unavailable
        sys.modules["plyfile"] = ply
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")

        class Dict(dict):
            """Attribute-access dict; enough for `class X(addict.Dict)` in
            utils/io_util.py to import (the config system is never used)."""

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        addict.Dict = Dict
        sys.modules["addict"] = addict


def load_reference():
    """Import and cache the reference modules. Returns a namespace with
    base / neus / volsdf / unisurf / rend_util / train_util / ray_casting."""
    if _loaded:
        return _loaded["ns"]
    _install_stubs()
    sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import matplotlib
    matplotlib.use("Agg")

    import models.base as ref_base                              # noqa: E402
    import models.frameworks.neus as ref_neus                   # noqa: E402
    import models.frameworks.volsdf as ref_volsdf               # noqa: E402
    import models.frameworks.unisurf as ref_unisurf             # noqa: E402
    import models.ray_casting as ref_ray_casting                # noqa: E402
    import utils.rend_util as ref_rend_util                     # noqa: E402
    import utils.train_util as ref_train_util                   # noqa: E402

    ns = types.SimpleNamespace(
        base=ref_base, neus=ref_neus, volsdf=ref_volsdf, unisurf=ref_unisurf,
        ray_casting=ref_ray_casting, rend_util=ref_rend_util,
        train_util=ref_train_util)
    _loaded["ns"] = ns
    return ns


# ---------------------------------------------------------------------------
# torch state_dict -> JAX pytree conversion
# ---------------------------------------------------------------------------

def t2n(t) -> np.ndarray:
    # COPY, not a view: .numpy() shares storage with the torch tensor, so a
    # later in-place torch update (optimizer.step()) would silently mutate
    # the converted JAX pytree mid-test (bit us in the trajectory test).
    return np.array(t.detach().cpu().numpy(), copy=True)


def convert_linear(sd: dict, prefix: str) -> dict:
    """One (possibly weight-normed) torch Linear -> {v,g,b} / {w,b}."""
    if f"{prefix}.weight_g" in sd:  # legacy nn.utils.weight_norm naming
        return {"v": t2n(sd[f"{prefix}.weight_v"]),
                "g": t2n(sd[f"{prefix}.weight_g"]),
                "b": t2n(sd[f"{prefix}.bias"])}
    if f"{prefix}.parametrizations.weight.original0" in sd:  # new API naming
        return {"g": t2n(sd[f"{prefix}.parametrizations.weight.original0"]),
                "v": t2n(sd[f"{prefix}.parametrizations.weight.original1"]),
                "b": t2n(sd[f"{prefix}.bias"])}
    return {"w": t2n(sd[f"{prefix}.weight"]),
            "b": t2n(sd[f"{prefix}.bias"])}


def convert_implicit_surface(ref_mod) -> dict:
    """Reference ImplicitSurface (base.py:131-282) -> neurecon_tpu pytree."""
    sd = ref_mod.state_dict()
    return {"layers": [convert_linear(sd, f"surface_fc_layers.{l}")
                       for l in range(ref_mod.D + 1)]}


def convert_radiance(ref_mod) -> dict:
    """Reference RadianceNet (base.py:312-391) -> neurecon_tpu pytree."""
    sd = ref_mod.state_dict()
    return {"layers": [convert_linear(sd, f"layers.{l}")
                       for l in range(ref_mod.D + 1)]}


def convert_nerf(ref_mod) -> dict:
    """Reference NeRF (base.py:395-453) -> neurecon_tpu pytree."""
    sd = ref_mod.state_dict()
    params = {"pts_linears": [convert_linear(sd, f"pts_linears.{i}")
                              for i in range(ref_mod.D)]}
    if ref_mod.use_view_dirs:
        params["views_linear"] = convert_linear(sd, "views_linears.0")
        params["feature_linear"] = convert_linear(sd, "feature_linear")
        params["alpha_linear"] = convert_linear(sd, "alpha_linear")
        params["rgb_linear"] = convert_linear(sd, "rgb_linear")
    else:
        params["output_linear"] = convert_linear(sd, "output_linear")
    return params


def convert_neus(ref_model) -> dict:
    """Reference NeuS nn.Module (neus.py:72-117) -> neurecon_tpu NeuS pytree."""
    params = {
        "ln_s": t2n(ref_model.ln_s),
        "implicit_surface": convert_implicit_surface(ref_model.implicit_surface),
        "radiance_net": convert_radiance(ref_model.radiance_net),
    }
    if hasattr(ref_model, "nerf_outside"):
        params["nerf_outside"] = convert_nerf(ref_model.nerf_outside)
    return params


def convert_volsdf(ref_model) -> dict:
    """Reference VolSDF nn.Module -> neurecon_tpu VolSDF pytree."""
    params = {
        "ln_beta": t2n(ref_model.ln_beta),
        "implicit_surface": convert_implicit_surface(ref_model.implicit_surface),
        "radiance_net": convert_radiance(ref_model.radiance_net),
    }
    if hasattr(ref_model, "nerf_outside"):
        params["nerf_outside"] = convert_nerf(ref_model.nerf_outside)
    return params


def convert_unisurf(ref_model) -> dict:
    """Reference UNISURF nn.Module -> neurecon_tpu UNISURF pytree."""
    params = {
        "implicit_surface": convert_implicit_surface(ref_model.implicit_surface),
        "radiance_net": convert_radiance(ref_model.radiance_net),
    }
    if hasattr(ref_model, "nerf_outside"):
        params["nerf_outside"] = convert_nerf(ref_model.nerf_outside)
    return params


def max_abs(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def rel_err(a, b, eps: float = 1e-8) -> float:
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b) / (np.abs(b) + eps)))
