"""DIRECT numeric parity vs the installed PyTorch reference (/root/reference).

Every other parity test in this suite checks the JAX build against re-derived
oracles; these load the ACTUAL reference modules (read-only, via
tests/ref_loader.py), copy reference weights into the JAX pytrees, and assert
agreement on identical inputs — forward passes, nablas, the sampler math, full
deterministic renders per framework, loss gradients, and a 20-step Adam
trajectory. This converts "parity by construction" into parity by measurement.

Reference targets (cited per test): models/base.py:131-453,
models/frameworks/neus.py:21-397, volsdf.py:16-500, unisurf.py:40-260,
models/ray_casting.py:35-160, utils/rend_util.py:167-326.

Measured tolerances are accumulated into docs/figures/ref_parity.json for the
parity.md table.
"""
import json
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_loader import (load_reference, convert_implicit_surface,
                        convert_radiance, convert_nerf, convert_neus,
                        convert_volsdf, convert_unisurf, convert_linear, t2n)

from neurecon_tpu.models import base as jbase
from neurecon_tpu.models import ray_casting as jrc
from neurecon_tpu.models.frameworks import neus as jneus
from neurecon_tpu.models.frameworks import volsdf as jvolsdf
from neurecon_tpu.models.frameworks import unisurf as junisurf
from neurecon_tpu.ops.sampling import sample_pdf as j_sample_pdf
from neurecon_tpu.ops.sampling import sample_cdf as j_sample_cdf

RNG = np.random.default_rng(0)

# measured-tolerance report, written once at session teardown
_REPORT = {}


def record(name: str, err: float, tol: float):
    _REPORT[name] = {"max_err": float(err), "tol": float(tol)}
    assert err < tol, f"{name}: max err {err:.3e} >= tol {tol:.1e}"


@pytest.fixture(scope="session", autouse=True)
def _write_report():
    yield
    out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "figures"
    if out.is_dir() and _REPORT:
        # merge-write: partial runs (-k, xdist workers) must not clobber
        # rows owned by tests that didn't run in this process
        p = out / "ref_parity.json"
        try:
            merged = json.loads(p.read_text())
        except Exception:
            merged = {}
        merged.update(_REPORT)
        p.write_text(json.dumps(merged, indent=1))


def maxdiff(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def pts_cloud(n, scale=1.5, seed=1):
    return np.random.default_rng(seed).uniform(-scale, scale, (n, 3)).astype(np.float32)


def unit_dirs(n, seed=2):
    d = np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# module-level forward parity (ref base.py:14-453)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("multires", [4, 6, 10])
def test_embedder_parity(multires):
    ns = load_reference()
    ref_emb, ref_dim = ns.base.get_embedder(multires)
    j_emb, j_dim = jbase.get_embedder(multires)
    assert ref_dim == j_dim
    x = pts_cloud(64)
    ref = ref_emb(torch.from_numpy(x)).numpy()
    got = np.asarray(j_emb(jnp.asarray(x)))
    record(f"embedder_m{multires}", maxdiff(ref, got), 1e-6)


@pytest.mark.parametrize("w_geo", [256, -1])
def test_implicit_surface_parity(w_geo):
    """ref base.py:131-282 — sdf, geometry feature, and autograd nablas, with
    geometric init + weight norm + skip concat, both geo-feature modes."""
    ns = load_reference()
    torch.manual_seed(0)
    ref = ns.base.ImplicitSurface(W=96, D=6, skips=[3], W_geo_feat=w_geo,
                                  embed_multires=6, weight_norm=True,
                                  geometric_init=True)
    surf = jbase.ImplicitSurface(W=96, D=6, skips=(3,), W_geo_feat=w_geo,
                                 embed_multires=6, weight_norm=True,
                                 geometric_init=True)
    params = convert_implicit_surface(ref)

    x = pts_cloud(256)
    with torch.no_grad():
        sdf_ref, h_ref = ref.forward(torch.from_numpy(x), return_h=True)
    sdf_j, h_j = surf.forward(params, jnp.asarray(x), return_h=True)
    record(f"implicit_sdf_geo{w_geo}", maxdiff(sdf_ref.numpy(), sdf_j), 2e-5)
    record(f"implicit_h_geo{w_geo}", maxdiff(h_ref.numpy(), h_j), 2e-5)

    sdf_ref2, nablas_ref, _ = ref.forward_with_nablas(torch.from_numpy(x))
    sdf_j2, nablas_j, _ = surf.forward_with_nablas(params, jnp.asarray(x))
    record(f"implicit_nablas_geo{w_geo}",
           maxdiff(nablas_ref.detach().numpy(), nablas_j), 5e-4)


def test_implicit_surface_siren_parity():
    """SIREN variant (ref base.py:84-115 + use_siren branches)."""
    ns = load_reference()
    torch.manual_seed(1)
    ref = ns.base.ImplicitSurface(W=64, D=4, skips=[], W_geo_feat=64,
                                  embed_multires=-1, weight_norm=True,
                                  use_siren=True, geometric_init=False)
    surf = jbase.ImplicitSurface(W=64, D=4, skips=(), W_geo_feat=64,
                                 embed_multires=-1, weight_norm=True,
                                 use_siren=True, geometric_init=False)
    params = convert_implicit_surface(ref)
    x = pts_cloud(256)
    with torch.no_grad():
        sdf_ref = ref.forward(torch.from_numpy(x))
    sdf_j = surf.forward(params, jnp.asarray(x))
    record("implicit_sdf_siren", maxdiff(sdf_ref.numpy(), sdf_j), 2e-5)


def test_radiance_net_parity():
    """ref base.py:312-391 — embed(x) ⊕ embed(v) ⊕ n ⊕ geo-feat -> sigmoid rgb."""
    ns = load_reference()
    torch.manual_seed(2)
    ref = ns.base.RadianceNet(D=4, W=96, skips=[], W_geo_feat=96,
                              embed_multires=6, embed_multires_view=4,
                              use_view_dirs=True, weight_norm=True)
    net = jbase.RadianceNet(D=4, W=96, skips=(), W_geo_feat=96,
                            embed_multires=6, embed_multires_view=4,
                            use_view_dirs=True, weight_norm=True)
    params = convert_radiance(ref)
    n = 256
    x, v = pts_cloud(n), unit_dirs(n)
    nrm, geo = unit_dirs(n, seed=3), pts_cloud(n, seed=4)[:, :1].repeat(96, -1)
    with torch.no_grad():
        rgb_ref = ref.forward(*map(torch.from_numpy, (x, v, nrm, geo)))
    rgb_j = net.forward(params, *map(jnp.asarray, (x, v, nrm, geo)))
    record("radiance_rgb", maxdiff(rgb_ref.numpy(), rgb_j), 1e-5)


def test_nerf_background_parity():
    """ref base.py:395-453 with NeRF++ config (input_ch=4, multires 10/4)."""
    ns = load_reference()
    torch.manual_seed(3)
    ref = ns.base.NeRF(input_ch=4, multires=10, multires_view=4,
                       use_view_dirs=True, W=96)
    net = jbase.NeRF(input_ch=4, multires=10, multires_view=4,
                     use_view_dirs=True, W=96)
    params = convert_nerf(ref)
    n = 256
    pts = pts_cloud(n, scale=0.9, seed=5)
    r = np.linalg.norm(pts, axis=-1, keepdims=True) + 1.0
    x4 = np.concatenate([pts / r, 1.0 / r], -1).astype(np.float32)
    v = unit_dirs(n)
    with torch.no_grad():
        sig_ref, rgb_ref = ref.forward(torch.from_numpy(x4), torch.from_numpy(v))
    sig_j, rgb_j = net.forward(params, jnp.asarray(x4), jnp.asarray(v))
    record("nerf_sigma", maxdiff(sig_ref.numpy(), sig_j), 2e-5)
    record("nerf_rgb", maxdiff(rgb_ref.numpy(), rgb_j), 1e-5)


# ---------------------------------------------------------------------------
# framework math parity (ref neus.py:21-68, volsdf.py:16-74, unisurf.py:40-62)
# ---------------------------------------------------------------------------

def test_neus_math_parity():
    ns = load_reference()
    sdf = RNG.normal(0, 0.4, (32, 65)).astype(np.float32)
    s = 87.3
    t_sdf = torch.from_numpy(sdf)
    record("cdf_Phi_s", maxdiff(ns.neus.cdf_Phi_s(t_sdf, s).numpy(),
                                jneus.cdf_Phi_s(jnp.asarray(sdf), s)), 1e-6)
    cdf_r, a_r = ns.neus.sdf_to_alpha(t_sdf, s)
    cdf_j, a_j = jneus.sdf_to_alpha(jnp.asarray(sdf), s)
    record("sdf_to_alpha", max(maxdiff(cdf_r.numpy(), cdf_j),
                               maxdiff(a_r.numpy(), a_j)), 1e-6)
    *_, w_r = ns.neus.sdf_to_w(t_sdf, s)
    *_, w_j = jneus.sdf_to_w(jnp.asarray(sdf), s)
    record("sdf_to_w", maxdiff(w_r.numpy(), w_j), 1e-6)
    alpha = RNG.uniform(0, 1, (32, 64)).astype(np.float32)
    record("alpha_to_w", maxdiff(ns.neus.alpha_to_w(torch.from_numpy(alpha)).numpy(),
                                 jneus.alpha_to_w(jnp.asarray(alpha))), 1e-6)


def test_volsdf_math_parity():
    ns = load_reference()
    sdf = RNG.normal(0, 0.5, (16, 128)).astype(np.float32)
    d = np.sort(RNG.uniform(0, 6, (16, 128)).astype(np.float32), -1)
    alpha, beta = 10.0, 0.1
    record("sdf_to_sigma",
           maxdiff(ns.volsdf.sdf_to_sigma(torch.from_numpy(sdf), alpha, beta).numpy(),
                   jvolsdf.sdf_to_sigma(jnp.asarray(sdf), alpha, beta)), 1e-5)
    b_r = ns.volsdf.error_bound(torch.from_numpy(d), torch.from_numpy(sdf),
                                alpha, beta).numpy()
    b_j = np.asarray(jvolsdf.error_bound(jnp.asarray(d), jnp.asarray(sdf),
                                         alpha, beta))
    finite = np.isfinite(b_r)
    assert (np.isfinite(b_j) == finite).all()
    record("error_bound", maxdiff(b_r[finite], b_j[finite]), 1e-2)

    # NaN->inf fixup (ref volsdf.py:73): tiny beta drives exp(errors_t) to inf
    b_r = ns.volsdf.error_bound(torch.from_numpy(d), torch.from_numpy(sdf),
                                1e4, 1e-4).numpy()
    b_j = np.asarray(jvolsdf.error_bound(jnp.asarray(d), jnp.asarray(sdf),
                                         1e4, 1e-4))
    assert np.isinf(b_r).any(), "fixture no longer triggers the inf fixup"
    assert (np.isinf(b_j) == np.isinf(b_r)).all()
    assert not np.isnan(b_j).any()


def test_unisurf_opacity_parity():
    ns = load_reference()
    logits = RNG.normal(0, 3, (512,)).astype(np.float32)
    record("uni_opacity",
           maxdiff(ns.unisurf.UNISURF.get_opacity_from_surface(
                       torch.from_numpy(logits)).numpy(),
                   junisurf.UNISURF.get_opacity_from_surface(jnp.asarray(logits))),
           1e-6)
    opa = RNG.uniform(0, 1, (512,)).astype(np.float32)
    record("uni_surface",
           maxdiff(ns.unisurf.UNISURF.get_surface_from_opacity(
                       torch.from_numpy(opa)).numpy(),
                   junisurf.UNISURF.get_surface_from_opacity(opa)), 2e-5)


def test_sample_pdf_cdf_parity():
    """det inverse-CDF sampling (ref rend_util.py:255-326)."""
    ns = load_reference()
    bins = np.sort(RNG.uniform(0, 6, (32, 65)).astype(np.float32), -1)
    w = RNG.uniform(0, 1, (32, 64)).astype(np.float32)
    ref = ns.rend_util.sample_pdf(torch.from_numpy(bins), torch.from_numpy(w),
                                  33, det=True).numpy()
    got = j_sample_pdf(None, jnp.asarray(bins), jnp.asarray(w), 33, det=True)
    record("sample_pdf_det", maxdiff(ref, got), 5e-5)

    cdf = np.cumsum(w, -1) / (w.sum(-1, keepdims=True) + 0.3)
    ref = ns.rend_util.sample_cdf(torch.from_numpy(bins), torch.from_numpy(cdf),
                                  33, det=True).numpy()
    got = j_sample_cdf(None, jnp.asarray(bins), jnp.asarray(cdf), 33, det=True)
    record("sample_cdf_det", maxdiff(ref, got), 5e-5)


def test_near_far_from_sphere_parity():
    ns = load_reference()
    from neurecon_tpu.ops import near_far_from_sphere as j_nf
    o = pts_cloud(64, scale=2.5, seed=7) + np.array([0, 0, -3], np.float32)
    d = unit_dirs(64, seed=8)
    n_r, f_r = ns.rend_util.near_far_from_sphere(torch.from_numpy(o),
                                                 torch.from_numpy(d), r=1.0)
    n_j, f_j = j_nf(jnp.asarray(o), jnp.asarray(d), r=1.0)
    record("near_far_sphere", max(maxdiff(n_r.numpy().squeeze(-1), n_j.squeeze(-1)),
                                  maxdiff(f_r.numpy().squeeze(-1), f_j.squeeze(-1))),
           1e-5)


def test_root_finding_parity():
    """cost-matrix sign-change + 8-step secant (ref ray_casting.py:35-160) on
    an analytic sphere occupancy, all-ray masked vs reference subset-indexed."""
    ns = load_reference()
    n = 64
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.0
    d = unit_dirs(n, seed=9) * np.array([0.25, 0.25, 1.0], np.float32)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    def f_torch(x):
        return x.norm(dim=-1) - 0.8

    def f_jax(x):
        return jnp.linalg.norm(x, axis=-1) - 0.8

    # reference path is written batched: add a leading batch dim
    d_r, pt_r, m_r, ms_r = ns.ray_casting.root_finding_surface_points(
        f_torch, torch.from_numpy(o[None]), torch.from_numpy(d[None]),
        near=0.0, far=6.0, N_steps=128, fill_inf=False)
    d_j, pt_j, m_j, ms_j = jrc.root_finding_surface_points(
        f_jax, jnp.asarray(o), jnp.asarray(d), near=0.0, far=6.0,
        N_steps=128, fill_inf=False)
    assert (m_r.numpy()[0] == np.asarray(m_j)).all()
    assert (ms_r.numpy()[0] == np.asarray(ms_j)).all()
    record("root_find_d", maxdiff(d_r.numpy()[0], d_j), 1e-4)
    hit = np.asarray(m_j)
    record("root_find_pt", maxdiff(pt_r.numpy()[0][hit], np.asarray(pt_j)[hit]),
           1e-4)


def test_volsdf_fine_sample_parity():
    """the §3.4 error-bounded sampler (ref volsdf.py:77-272): fixed-trip
    masked JAX vs the reference's boolean-indexed loop, analytic sphere SDF,
    deterministic. Exercises convergence bookkeeping, β bisection, and the
    final opacity inverse-CDF."""
    ns = load_reference()
    n = 32
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.0
    d = unit_dirs(n, seed=10) * np.array([0.3, 0.3, 1.0], np.float32)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    t = np.linspace(0, 1, 128, dtype=np.float32)
    d_init = (0.0 * (1 - t) + far * t).astype(np.float32)
    beta_net, alpha_net = 0.05, 1.0 / 0.05

    def sdf_torch(x):
        return x.norm(dim=-1) - 0.8

    def sdf_jax(x):
        return jnp.linalg.norm(x, axis=-1) - 0.8

    dv_r, beta_r, iu_r = ns.volsdf.fine_sample(
        sdf_torch, torch.from_numpy(d_init), torch.from_numpy(o),
        torch.from_numpy(d), alpha_net, beta_net, torch.from_numpy(far),
        eps=0.1, max_iter=5, max_bisection=10, final_N_importance=32,
        N_up=64, perturb=False)
    dv_j, beta_j, iu_j = jvolsdf.fine_sample(
        sdf_jax, jnp.asarray(d_init), jnp.asarray(o), jnp.asarray(d),
        alpha_net, beta_net, jnp.asarray(far), jax.random.PRNGKey(0),
        eps=0.1, max_iter=5, max_bisection=10, final_N_importance=32,
        N_up=64, perturb=False)
    assert (iu_r.numpy() == np.asarray(iu_j)).all(), "iteration usage differs"
    record("fine_sample_beta", maxdiff(beta_r.numpy(), beta_j), 1e-4)
    record("fine_sample_dvals", maxdiff(dv_r.numpy(), dv_j), 1e-3)


# ---------------------------------------------------------------------------
# full deterministic renders, reference weights (ref neus.py:118-397,
# volsdf.py:334-551, unisurf.py:64-260)
# ---------------------------------------------------------------------------

SURF_CFG = dict(W=64, D=8, skips=[4], embed_multires=6, radius_init=0.7,
                geometric_init=True, weight_norm=True)
RAD_CFG = dict(D=2, W=64, skips=[], embed_multires=6, embed_multires_view=4,
               use_view_dirs=True, weight_norm=True)


def camera_rays(n, spread=0.35, seed=11):
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.0
    d = unit_dirs(n, seed=seed) * np.array([spread, spread, 1.0], np.float32)
    # UNNORMALIZED on purpose: both renderers must normalize internally
    return o, (d * 1.3).astype(np.float32)


@pytest.mark.parametrize("n_outside", [0, 8])
def test_neus_render_parity(n_outside):
    ns = load_reference()
    torch.manual_seed(4)
    kw = dict(variance_init=0.05, speed_factor=10.0, W_geo_feat=-1,
              use_outside_nerf=n_outside > 0, obj_bounding_radius=1.0,
              surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.neus.NeuS(**kw)
    j_model = jneus.NeuS(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    params = convert_neus(ref_model)

    o, d = camera_rays(16)
    rkw = dict(obj_bounding_radius=1.0, perturb=False, N_samples=16,
               N_importance=16, N_upsample_iters=4, N_outside=n_outside,
               upsample_algo="official_solution")
    with torch.no_grad():
        rgb_r, dep_r, ex_r = ns.neus.volume_render(
            torch.from_numpy(o), torch.from_numpy(d), ref_model,
            batched=False, calc_normal=True, **rkw)
    ret = jneus.volume_render_rays(j_model, params, jnp.asarray(o),
                                   jnp.asarray(d), jax.random.PRNGKey(0),
                                   calc_normal=True, **rkw)
    record(f"neus_render_rgb_out{n_outside}", maxdiff(rgb_r.numpy(), ret["rgb"]), 2e-4)
    record(f"neus_render_depth_out{n_outside}",
           maxdiff(dep_r.numpy(), ret["depth_volume"]), 5e-4)
    record(f"neus_render_acc_out{n_outside}",
           maxdiff(ex_r["mask_volume"].numpy(), ret["mask_volume"]), 2e-4)
    record(f"neus_render_dfinal_out{n_outside}",
           maxdiff(ex_r["d_final"].numpy(), ret["d_final"]), 5e-4)
    record(f"neus_render_normals_out{n_outside}",
           maxdiff(ex_r["normals_volume"].numpy(), ret["normals_volume"]), 5e-4)


@pytest.mark.parametrize("nerfpp", [False, True])
def test_volsdf_render_parity(nerfpp):
    ns = load_reference()
    torch.manual_seed(5)
    kw = dict(beta_init=0.1, speed_factor=10.0, W_geo_feat=-1,
              obj_bounding_radius=3.0, use_nerfplusplus=nerfpp,
              surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.volsdf.VolSDF(**kw)
    j_model = jvolsdf.VolSDF(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    params = convert_volsdf(ref_model)

    o, d = camera_rays(16, seed=12)
    rkw = dict(near=0.0, far=6.0, obj_bounding_radius=3.0, perturb=False,
               N_samples=32, N_importance=16, N_outside=8,
               max_upsample_steps=5, max_bisection_steps=10, epsilon=0.1,
               use_nerfplusplus=nerfpp)
    with torch.no_grad():
        rgb_r, dep_r, ex_r = ns.volsdf.volume_render(
            torch.from_numpy(o), torch.from_numpy(d), ref_model,
            batched=False, **rkw)
    ret = jvolsdf.volume_render_rays(j_model, params, jnp.asarray(o),
                                     jnp.asarray(d), jax.random.PRNGKey(0),
                                     fine_sample_mul=4, **rkw)
    assert (ex_r["iter_usage"].numpy() == np.asarray(ret["iter_usage"])).all()
    record(f"volsdf_render_rgb_pp{nerfpp}", maxdiff(rgb_r.numpy(), ret["rgb"]), 5e-4)
    record(f"volsdf_render_depth_pp{nerfpp}",
           maxdiff(dep_r.numpy(), ret["depth_volume"]), 2e-3)
    record(f"volsdf_render_acc_pp{nerfpp}",
           maxdiff(ex_r["mask_volume"].numpy(), ret["mask_volume"]), 5e-4)
    record(f"volsdf_render_beta_pp{nerfpp}",
           maxdiff(ex_r["beta_map"].numpy(), ret["beta_map"]), 1e-4)


def test_unisurf_render_parity():
    """Two latent reference bugs force the call shape here (both verified
    live against /root/reference in round 5):

    1. batched=False + tensor far crashes (`far = far[mask == 0]` indexes a
       1-dim far with a 2-dim mask, ray_casting.py:150) — so the reference
       UNISURF render only RUNS in batched mode, and we call it that way
       (its own Trainer's mode, unisurf.py:299-300).
    2. In batched mode, `F.normalize(nablas)` in UNISURF.forward
       (unisurf.py:36) normalizes along default dim=1 — the POINTS axis of
       the [B, N_flat, 3] chunks batchify_query feeds it — not xyz. The JAX
       build normalizes along xyz (the intent per the adjacent comment).
       Measured gap from the bug at these weights: ~4e-3 rgb. The test pins
       the intended semantics by giving the ref model a dim=-1 forward.
    """
    import types

    import torch.nn.functional as F

    ns = load_reference()
    torch.manual_seed(6)
    kw = dict(W_geo_feat=-1, surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.unisurf.UNISURF(**kw)
    j_model = junisurf.UNISURF(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    params = convert_unisurf(ref_model)

    def fixed_forward(self, x, view_dirs):  # ref unisurf.py:34-38, dim fixed
        occ, nablas, geometry_feature = self.implicit_surface.forward_with_nablas(x)
        normals = F.normalize(nablas, dim=-1)
        radiances = self.radiance_net.forward(x, view_dirs, normals,
                                              geometry_feature)
        return radiances, occ, nablas

    ref_model.forward = types.MethodType(fixed_forward, ref_model)

    o, d = camera_rays(16, seed=13)
    with torch.no_grad():
        rgb_r, dep_r, ex_r = ns.unisurf.volume_render(
            torch.from_numpy(o[None]), torch.from_numpy(d[None]), ref_model,
            batched=True, perturb=False, N_query=16, N_freespace=8,
            N_steps=128, interval=0.5, calc_normal=True)
    rgb_r, dep_r = rgb_r[0], dep_r[0]
    ex_r = {k: v[0] for k, v in ex_r.items() if torch.is_tensor(v)}
    ret = junisurf.volume_render_rays(
        j_model, params, jnp.asarray(o), jnp.asarray(d),
        jax.random.PRNGKey(0), interval=0.5, perturb=False, N_query=16,
        N_freespace=8, N_steps=128, calc_normal=True)
    assert (ex_r["mask_surface"].numpy() == np.asarray(ret["mask_surface"])).all()
    record("unisurf_render_rgb", maxdiff(rgb_r.numpy(), ret["rgb"]), 5e-4)
    record("unisurf_render_depth", maxdiff(dep_r.numpy(), ret["depth_volume"]), 2e-3)
    record("unisurf_render_acc",
           maxdiff(ex_r["mask_volume"].numpy(), ret["mask_volume"]), 5e-4)
    record("unisurf_render_dsurf",
           maxdiff(ex_r["depth_surface"].numpy(), ret["depth_surface"]), 1e-3)


# ---------------------------------------------------------------------------
# training-path parity: loss value, full gradient pytree, 20-step trajectory
# (ref neus.py:408-486 Trainer loss assembly, torch.optim.Adam vs optax.adam)
# ---------------------------------------------------------------------------

W_EIK = 0.1
RENDER_KW = dict(obj_bounding_radius=1.0, perturb=False, N_samples=16,
                 N_importance=16, N_upsample_iters=4, N_outside=0,
                 upsample_algo="official_solution")


def _make_pair(seed=7):
    ns = load_reference()
    torch.manual_seed(seed)
    kw = dict(variance_init=0.05, speed_factor=10.0, W_geo_feat=-1,
              use_outside_nerf=False, obj_bounding_radius=1.0,
              surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.neus.NeuS(**kw)
    j_model = jneus.NeuS(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    return ns, ref_model, j_model, convert_neus(ref_model)


def _ref_loss(ns, ref_model, o, d, target):
    """NeuS loss without mask (ref neus.py:453-478): L1 rgb mean + w_eikonal ·
    mse(|nablas|, 1) over ALL render points."""
    rgb, _, extras = ns.neus.volume_render(
        torch.from_numpy(o), torch.from_numpy(d), ref_model, batched=False,
        detailed_output=True, **RENDER_KW)
    nablas_norm = torch.norm(extras["implicit_nablas"], dim=-1)
    loss_img = torch.nn.functional.l1_loss(rgb, torch.from_numpy(target))
    loss_eik = W_EIK * torch.nn.functional.mse_loss(
        nablas_norm, torch.ones_like(nablas_norm))
    return loss_img + loss_eik


def _jax_loss(j_model, params, o, d, target):
    ret = jneus.volume_render_rays(j_model, params, jnp.asarray(o),
                                   jnp.asarray(d), jax.random.PRNGKey(0),
                                   detailed_output=True, **RENDER_KW)
    nablas_norm = jnp.linalg.norm(ret["implicit_nablas"], axis=-1)
    return (jnp.mean(jnp.abs(ret["rgb"] - target))
            + W_EIK * jnp.mean((nablas_norm - 1.0) ** 2))


def _grads_as_pytree(ref_model):
    gd = {name: p.grad for name, p in ref_model.named_parameters()}
    tree = {
        "ln_s": t2n(gd["ln_s"]),
        "implicit_surface": {"layers": [
            convert_linear(gd, f"implicit_surface.surface_fc_layers.{l}")
            for l in range(ref_model.implicit_surface.D + 1)]},
        "radiance_net": {"layers": [
            convert_linear(gd, f"radiance_net.layers.{l}")
            for l in range(ref_model.radiance_net.D + 1)]},
    }
    return tree


def test_neus_loss_and_grad_parity():
    """Identical rays ⇒ identical loss AND identical ∂loss/∂params, including
    the eikonal grad-of-grad through weight norm — the strongest single-step
    statement of training parity."""
    ns, ref_model, j_model, params = _make_pair()
    o, d = camera_rays(16, seed=14)
    target = np.random.default_rng(15).uniform(0, 1, (16, 3)).astype(np.float32)

    loss_r = _ref_loss(ns, ref_model, o, d, target)
    loss_r.backward()
    ref_grads = _grads_as_pytree(ref_model)

    loss_j, j_grads = jax.value_and_grad(
        lambda p: _jax_loss(j_model, p, o, d, target))(params)
    record("neus_loss_value", abs(float(loss_r) - float(loss_j)), 1e-5)

    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_j = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(j_grads)}
    assert len(flat_r) == len(flat_j)
    worst = 0.0
    for k, v_ref in flat_r:
        key = jax.tree_util.keystr(k)
        v_ref = np.asarray(v_ref)
        scale = float(np.max(np.abs(v_ref))) + 1e-6
        err = maxdiff(v_ref, flat_j[key]) / scale
        assert err < 5e-3, f"grad mismatch at {key}: rel {err:.2e}"
        worst = max(worst, err)
    record("neus_grad_rel", worst, 5e-3)


@pytest.mark.slow
def test_neus_train_trajectory_parity():
    """20 Adam steps (lr 5e-4) on identical ray batches: per-step losses and
    the final parameters must track the reference trainer's trajectory."""
    import optax
    ns, ref_model, j_model, params = _make_pair(seed=8)
    params0 = jax.tree_util.tree_map(np.copy, params)
    opt_r = torch.optim.Adam(ref_model.parameters(), lr=5e-4)
    opt_j = optax.adam(5e-4)
    opt_state = opt_j.init(params)

    batches = []
    for i in range(20):
        o, d = camera_rays(16, seed=100 + i)
        tgt = np.random.default_rng(200 + i).uniform(0, 1, (16, 3)).astype(np.float32)
        batches.append((o, d, tgt))

    @jax.jit
    def step(params, opt_state, o, d, tgt):
        loss, grads = jax.value_and_grad(
            lambda p: _jax_loss(j_model, p, o, d, tgt))(params)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    worst = 0.0
    for it, (o, d, tgt) in enumerate(batches):
        loss_r = _ref_loss(ns, ref_model, o, d, tgt)
        opt_r.zero_grad()
        loss_r.backward()
        opt_r.step()
        params, opt_state, loss_j = step(params, opt_state, o, d, tgt)
        rel = abs(float(loss_r) - float(loss_j)) / (abs(float(loss_r)) + 1e-8)
        assert rel < 5e-3, f"step {it}: ref {float(loss_r):.6f} jax {float(loss_j):.6f}"
        worst = max(worst, rel)
    record("neus_traj20_loss_rel", worst, 5e-3)

    # final parameter agreement, measured against how far Adam actually moved
    # each leaf (torch-vs-XLA grad noise of ~1e-5 rel gets amplified by the
    # 1/sqrt(v) normalization in early steps, so param-scale-relative bounds
    # are the wrong yardstick; losses above track to <5e-3 every step)
    ref_final = convert_neus(ref_model)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_final)
    flat_j = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(params)}
    flat_0 = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(params0)}
    worst_abs, worst_vs_drift = 0.0, 0.0
    for k, v_ref in flat_r:
        key = jax.tree_util.keystr(k)
        v_ref = np.asarray(v_ref)
        dev = maxdiff(v_ref, flat_j[key])
        drift = maxdiff(v_ref, flat_0[key])  # how far training moved this leaf
        worst_abs = max(worst_abs, dev)
        worst_vs_drift = max(worst_vs_drift, dev / (drift + 1e-6))
    record("neus_traj20_param_absdiff", worst_abs, 3e-3)
    record("neus_traj20_param_vs_drift", worst_vs_drift, 0.35)


# ---------------------------------------------------------------------------
# VolSDF / UNISURF training-path gradient parity (ref volsdf.py:572-644,
# unisurf.py:303-352) — identical losses written manually on both sides
# (random eikonal box points / reg neighbors replaced by FIXED fixtures so
# the comparison is deterministic), gradients through the full renderers.
# ---------------------------------------------------------------------------

def _grads_pytree_generic(ref_model, names):
    gd = {name: p.grad for name, p in ref_model.named_parameters()}
    tree = {}
    for head, scalar in names.items():
        if scalar:
            tree[head] = t2n(gd[head])
        else:
            sub = getattr(ref_model, head)
            tree[head] = {"layers": [
                convert_linear(gd, f"{head}.{'surface_fc_layers' if head == 'implicit_surface' else 'layers'}.{l}")
                for l in range(sub.D + 1)]}
    return tree


def _compare_grad_trees(ref_grads, j_grads, label, tol=5e-3):
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_j = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(j_grads)}
    assert len(flat_r) == len(flat_j)
    worst = 0.0
    for k, v_ref in flat_r:
        key = jax.tree_util.keystr(k)
        v_ref = np.asarray(v_ref)
        scale = float(np.max(np.abs(v_ref))) + 1e-6
        err = maxdiff(v_ref, flat_j[key]) / scale
        assert err < tol, f"{label} grad mismatch at {key}: rel {err:.2e}"
        worst = max(worst, err)
    record(label, worst, tol)


@pytest.mark.slow
def test_volsdf_loss_and_grad_parity():
    """L1 + eikonal (argmax-visibility surface point ⊕ fixed box points, the
    ref volsdf.py:605-614 assembly) — gradients through fine_sample's
    stop_gradient boundary, the sphere-bg min-trick, and ln_beta."""
    ns = load_reference()
    torch.manual_seed(9)
    kw = dict(beta_init=0.1, speed_factor=10.0, W_geo_feat=-1,
              obj_bounding_radius=3.0, use_nerfplusplus=False,
              surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.volsdf.VolSDF(**kw)
    j_model = jvolsdf.VolSDF(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    params = convert_volsdf(ref_model)

    o, d = camera_rays(12, seed=21)
    target = np.random.default_rng(22).uniform(0, 1, (12, 3)).astype(np.float32)
    eik_pts = np.random.default_rng(23).uniform(-3, 3, (12, 1, 3)).astype(np.float32)
    rkw = dict(near=0.0, far=6.0, obj_bounding_radius=3.0, perturb=False,
               N_samples=24, N_importance=16, max_upsample_steps=4,
               max_bisection_steps=10, epsilon=0.1, use_nerfplusplus=False)
    w_eik = 0.1

    # ---- reference side (manual Trainer.forward, fixed eik points) ----
    rgb_r, _, ex_r = ns.volsdf.volume_render(
        torch.from_numpy(o), torch.from_numpy(d), ref_model, batched=False,
        detailed_output=True, **rkw)
    nablas = ex_r["implicit_nablas"]
    _, ind = ex_r["visibility_weights"][..., :nablas.shape[-2]].max(dim=-1)
    nab_surf = torch.gather(
        nablas, dim=-2,
        index=ind[..., None, None].repeat([*(len(nablas.shape) - 1) * [1], 3]))
    _, nab_eik, _ = ref_model.implicit_surface.forward_with_nablas(
        torch.from_numpy(eik_pts))
    nab_all = torch.cat([nab_surf, nab_eik], dim=-2)
    nn_r = torch.norm(nab_all, dim=-1)
    loss_r = (torch.nn.functional.l1_loss(rgb_r, torch.from_numpy(target))
              + w_eik * torch.nn.functional.mse_loss(nn_r, torch.ones_like(nn_r)))
    loss_r.backward()
    ref_grads = _grads_pytree_generic(
        ref_model, {"ln_beta": True, "implicit_surface": False,
                    "radiance_net": False})

    # ---- jax side (same assembly; eik points ride the render query) ----
    def loss_fn(p):
        ret = jvolsdf.volume_render_rays(
            j_model, p, jnp.asarray(o), jnp.asarray(d), jax.random.PRNGKey(0),
            detailed_output=True, eik_pts=jnp.asarray(eik_pts), **rkw)
        nab = ret["implicit_nablas"]
        ind = jnp.argmax(ret["visibility_weights"][..., :nab.shape[-2]], -1)
        nab_surf = jnp.take_along_axis(
            nab, ind[..., None, None].repeat(3, -1), axis=-2)
        nab_all = jnp.concatenate([nab_surf, ret["eik_nablas"]], axis=-2)
        nn = jnp.linalg.norm(nab_all, axis=-1)
        return (jnp.mean(jnp.abs(ret["rgb"] - target))
                + w_eik * jnp.mean((nn - 1.0) ** 2))

    loss_j, j_grads = jax.value_and_grad(loss_fn)(params)
    record("volsdf_loss_value", abs(float(loss_r) - float(loss_j)), 2e-5)
    _compare_grad_trees(ref_grads, j_grads, "volsdf_grad_rel")


@pytest.mark.slow
def test_unisurf_loss_and_grad_parity():
    """L1 + normal-smoothness reg at (surface point, fixed neighbor) — the
    ref unisurf.py:326-341 assembly with the intended dim=-1 normals (see
    test_unisurf_render_parity for the reference's dim bug) — gradients
    through the root-finder's stop_gradient boundary."""
    import types

    import torch.nn.functional as F

    ns = load_reference()
    torch.manual_seed(10)
    kw = dict(W_geo_feat=-1, surface_cfg=SURF_CFG, radiance_cfg=RAD_CFG)
    ref_model = ns.unisurf.UNISURF(**kw)
    j_model = junisurf.UNISURF(**{**kw, "surface_cfg": {**SURF_CFG, "skips": (4,)}})
    params = convert_unisurf(ref_model)

    def fixed_forward(self, x, view_dirs):  # dim=-1 (ref unisurf.py:34-38)
        occ, nablas, geometry_feature = self.implicit_surface.forward_with_nablas(x)
        normals = F.normalize(nablas, dim=-1)
        return (self.radiance_net.forward(x, view_dirs, normals,
                                          geometry_feature), occ, nablas)

    ref_model.forward = types.MethodType(fixed_forward, ref_model)

    o, d = camera_rays(12, seed=24)
    target = np.random.default_rng(25).uniform(0, 1, (12, 3)).astype(np.float32)
    offsets = (np.random.default_rng(26).uniform(-1, 1, (12, 3)) * 0.01
               ).astype(np.float32)
    w_reg = 0.01

    def _unit_t(v):
        return v / (v.norm(dim=-1, keepdim=True) + 1e-10)

    # ---- reference side ----
    rgb_r, _, ex_r = ns.unisurf.volume_render(
        torch.from_numpy(o[None]), torch.from_numpy(d[None]), ref_model,
        batched=True, perturb=False, N_query=16, N_freespace=8,
        interval=0.5, detailed_output=True)
    pt_surf = ex_r["surface_points"][0].detach()
    _, nab_s, _ = ref_model.implicit_surface.forward_with_nablas(pt_surf)
    _, nab_p, _ = ref_model.implicit_surface.forward_with_nablas(
        pt_surf + torch.from_numpy(offsets))
    loss_r = (F.l1_loss(rgb_r[0], torch.from_numpy(target))
              + w_reg * ((_unit_t(nab_p) - _unit_t(nab_s)) ** 2).mean())
    loss_r.backward()
    ref_grads = _grads_pytree_generic(
        ref_model, {"implicit_surface": False, "radiance_net": False})

    # ---- jax side ----
    def _unit_j(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    def loss_fn(p):
        ret = junisurf.volume_render_rays(
            j_model, p, jnp.asarray(o), jnp.asarray(d), jax.random.PRNGKey(0),
            interval=0.5, perturb=False, N_query=16, N_freespace=8,
            detailed_output=True)
        pt = jax.lax.stop_gradient(ret["surface_points"])
        _, nab_s, _ = j_model.forward_with_nablas(p, pt)
        _, nab_p, _ = j_model.forward_with_nablas(p, pt + offsets)
        return (jnp.mean(jnp.abs(ret["rgb"] - target))
                + w_reg * jnp.mean((_unit_j(nab_p) - _unit_j(nab_s)) ** 2))

    loss_j, j_grads = jax.value_and_grad(loss_fn)(params)
    record("unisurf_loss_value", abs(float(loss_r) - float(loss_j)), 2e-5)
    _compare_grad_trees(ref_grads, j_grads, "unisurf_grad_rel")
