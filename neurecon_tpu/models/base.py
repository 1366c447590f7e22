"""Network primitives — pure-functional JAX MLPs with exact init parity to the
reference (models/base.py in /root/reference):

  * positional Embedder (base.py:14-81): [x, sin(f0 x), cos(f0 x), ...] order
  * SIREN layers (base.py:84-115): w0=30, first-layer std 1/dim else sqrt(6/dim)/w0
  * ImplicitSurface (base.py:131-282): D+1 layers, skip concat [h, x]/sqrt(2),
    IDR geometric sphere init (base.py:207-224), weight-norm reparameterization,
    Softplus(beta=100), IDR-like (W_geo_feat>0) vs NeRF-like (-1) geometry feature
  * RadianceNet (base.py:312-391), background NeRF MLP (base.py:395-453)

Parameters are plain pytrees (lists of dicts); forward passes are pure
functions of (params, inputs), so `jax.grad` gives SDF nablas (replacing
torch autograd.grad with create_graph) and composes with the outer loss grad.
Weight norm is an explicit reparameterization w = g * v / ||v||_row applied at
call time — XLA fuses/CSEs it, and the geometric init is applied to v BEFORE g
is initialized to the row norms (so w == v_init at step 0, matching torch).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


# ---------------------------------------------------------------------------
# Positional embedding
# ---------------------------------------------------------------------------

class Embedder:
    """NeRF-style sin/cos frequency encoding; include_input=True, log-spaced.

    Output feature order matches the reference exactly (raw input first, then
    per-frequency sin, cos) — the geometric init of layer 0 relies on the raw
    xyz occupying the first 3 channels.
    """

    def __init__(self, input_dim: int, multires: int):
        self.input_dim = input_dim
        self.multires = multires
        if multires < 0:
            self.out_dim = input_dim
            self.freq_bands = None
        else:
            N_freqs = multires
            max_freq_log2 = multires - 1
            self.freq_bands = np.asarray(
                2.0 ** np.linspace(0.0, max_freq_log2, N_freqs), np.float32)
            self.out_dim = input_dim + input_dim * N_freqs * 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.freq_bands is None:
            return x
        # [..., F, C] phases
        phases = x[..., None, :] * self.freq_bands[:, None]
        # interleave per frequency: sin(f_i * x), cos(f_i * x)
        sc = jnp.stack([jnp.sin(phases), jnp.cos(phases)], axis=-2)
        sc = sc.reshape(*x.shape[:-1], -1)
        return jnp.concatenate([x, sc], axis=-1)


def get_embedder(multires: int, input_dim: int = 3) -> Tuple[Embedder, int]:
    emb = Embedder(input_dim, multires)
    return emb, emb.out_dim


# ---------------------------------------------------------------------------
# Layer init / apply
# ---------------------------------------------------------------------------

def _torch_linear_default(key, in_dim: int, out_dim: int):
    """PyTorch nn.Linear default init: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    for the weight, U(±1/sqrt(fan_in)) for the bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return w, b


def init_dense(key, in_dim: int, out_dim: int, weight_norm: bool = False,
               w_init: Optional[jnp.ndarray] = None,
               b_init: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    w, b = _torch_linear_default(key, in_dim, out_dim)
    if w_init is not None:
        w = w_init
    if b_init is not None:
        b = b_init
    if weight_norm:
        g = jnp.linalg.norm(w, axis=1, keepdims=True)  # [out, 1]
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def init_siren(key, in_dim: int, out_dim: int, is_first: bool,
               weight_norm: bool = False, w0: float = 30.0, c: float = 6.0):
    kw, k2 = jax.random.split(key)
    _, b = _torch_linear_default(k2, in_dim, out_dim)  # bias: torch default
    w_std = (1.0 / in_dim) if is_first else (math.sqrt(c / in_dim) / w0)
    w = jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -w_std, w_std)
    if weight_norm:
        g = jnp.linalg.norm(w, axis=1, keepdims=True)
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def effective_weight(p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if "v" in p:
        v = p["v"]
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        return p["g"] * v / norm
    return p["w"]


def apply_linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    w = effective_weight(p)
    return x @ w.T + p["b"]


def slice_linear_rows(p: Dict[str, jnp.ndarray], start: int,
                      stop: Optional[int]) -> Dict[str, jnp.ndarray]:
    """Row-slice of a linear layer's params: the affine map restricted to
    output channels [start:stop]. Exact also under weight-norm (g·v/‖v‖ is
    per-row, so slicing rows of v/g commutes with the normalization)."""
    sl = slice(start, stop)
    out = {"b": p["b"][sl]}
    if "v" in p:
        out["v"], out["g"] = p["v"][sl], p["g"][sl]
    else:
        out["w"] = p["w"][sl]
    return out


def softplus100(x):
    """Softplus(beta=100) — critical for the initial sphere (ref base.py:201-202)."""
    return jax.nn.softplus(100.0 * x) / 100.0


def sine_w0(x, w0: float = 30.0):
    return jnp.sin(w0 * x)


# ---------------------------------------------------------------------------
# ImplicitSurface (SDF / occupancy MLP)
# ---------------------------------------------------------------------------

class ImplicitSurface:
    """Stateless module: holds static config + embedder; params are pytrees.

    init(key) -> params; forward(params, x[, return_h]); forward_with_nablas.
    """

    def __init__(self,
                 W: int = 256,
                 D: int = 8,
                 skips: Sequence[int] = (4,),
                 W_geo_feat: int = 256,
                 input_ch: int = 3,
                 radius_init: float = 1.0,
                 obj_bounding_size: float = 2.0,
                 geometric_init: bool = True,
                 embed_multires: int = 6,
                 weight_norm: bool = True,
                 use_siren: bool = False,
                 sphere_residual: bool = False):
        if use_siren:
            assert len(skips) == 0, "do not use skips for siren"
        # Surface-existence prior (docs/quality.md SIREN forensics): the net
        # learns a RESIDUAL on the analytic sphere, sdf(x) = (|x| - r) + f(x).
        # Unlike the pretrained-sphere approach (ref base.py:284-310), the
        # zero-level set cannot be destroyed by early rgb gradients unless f
        # learns to cancel the sphere everywhere — the degenerate constant
        # basins stop being reachable by small moves. No reference analogue
        # (the reference ships no working SIREN recipe).
        self.sphere_residual = sphere_residual
        self.W, self.D = W, D
        self.skips = tuple(skips)
        self.W_geo_feat = W_geo_feat
        self.radius_init = radius_init
        self.obj_bounding_size = obj_bounding_size
        self.geometric_init = geometric_init
        self.embed_multires = embed_multires
        self.weight_norm = weight_norm
        self.use_siren = use_siren
        self.embed_fn, self.input_ch = get_embedder(embed_multires, input_ch)

        # layer dims: D+1 layers as in IDR/NeuS
        self.dims = []
        for l in range(D + 1):
            if l == D:
                out_dim = 1 + W_geo_feat if W_geo_feat > 0 else 1
            elif (l + 1) in self.skips:
                out_dim = W - self.input_ch  # reduce before skip concat
            else:
                out_dim = W
            in_dim = self.input_ch if l == 0 else W
            self.dims.append((in_dim, out_dim))

    def init(self, key: jax.Array) -> Params:
        layers: List[Dict[str, jnp.ndarray]] = []
        keys = jax.random.split(key, self.D + 1)
        for l, (in_dim, out_dim) in enumerate(self.dims):
            if self.use_siren and l != self.D:
                layers.append(init_siren(keys[l], in_dim, out_dim,
                                         is_first=(l == 0),
                                         weight_norm=self.weight_norm))
                continue

            w_init = b_init = None
            if self.geometric_init and not self.use_siren:
                # IDR/SAL geometric sphere init (ref base.py:207-224)
                if l == self.D:
                    w_init = (np.sqrt(np.pi) / np.sqrt(in_dim)
                              + 1e-4 * jax.random.normal(keys[l], (out_dim, in_dim)))
                    b_init = jnp.full((out_dim,), -self.radius_init)
                elif self.embed_multires > 0 and l == 0:
                    w = np.sqrt(2) / np.sqrt(out_dim) * jax.random.normal(
                        keys[l], (out_dim, in_dim))
                    # octave channels start at zero weight
                    w_init = w.at[:, 3:].set(0.0)
                    b_init = jnp.zeros((out_dim,))
                elif self.embed_multires > 0 and l in self.skips:
                    w = np.sqrt(2) / np.sqrt(out_dim) * jax.random.normal(
                        keys[l], (out_dim, in_dim))
                    # concat order is [h, x_embed]: zero the octave tail
                    w_init = w.at[:, -(self.input_ch - 3):].set(0.0)
                    b_init = jnp.zeros((out_dim,))
                else:
                    w_init = np.sqrt(2) / np.sqrt(out_dim) * jax.random.normal(
                        keys[l], (out_dim, in_dim))
                    b_init = jnp.zeros((out_dim,))

            layers.append(init_dense(keys[l], in_dim, out_dim,
                                     weight_norm=self.weight_norm,
                                     w_init=w_init, b_init=b_init))
        return {"layers": layers}

    def forward(self, params: Params, x: jnp.ndarray, return_h: bool = False):
        # flatten leading dims: identical math, and degenerate middle dims
        # (e.g. [N, 1, 3]) trip this environment's TPU compiler
        prefix = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        x_raw = x
        x = self.embed_fn(x)
        h = x
        for i in range(self.D):
            if i in self.skips:
                h = jnp.concatenate([h, x], axis=-1) / np.sqrt(2)
            h = apply_linear(params["layers"][i], h)
            h = sine_w0(h) if self.use_siren else softplus100(h)
        out_p = params["layers"][self.D]
        if self.W_geo_feat > 0:
            # final layer as two row-sliced matmuls (identical affine map):
            # slicing the fused 1+W_geo_feat output under the inner jax.grad
            # SIGILLs this environment's TPU compiler fusion pass
            sdf = apply_linear(slice_linear_rows(out_p, 0, 1), h)[..., 0]
            h_out = apply_linear(slice_linear_rows(out_p, 1, None), h)
        else:
            h_out = h  # NeRF-like: last hidden features
            sdf = apply_linear(out_p, h)[..., 0]
        if self.sphere_residual:
            sdf = sdf + self._sphere_sdf(x_raw)
        sdf = sdf.reshape(prefix)
        h_out = h_out.reshape(prefix + h_out.shape[-1:])
        return (sdf, h_out) if return_h else sdf

    def _sphere_sdf(self, x_raw: jnp.ndarray) -> jnp.ndarray:
        """Analytic |x| - radius_init term of the sphere_residual prior.
        eps keeps the gradient finite at the origin (grad -> 0 there, which
        only underestimates |nablas| on a measure-zero point)."""
        return jnp.sqrt(jnp.sum(x_raw * x_raw, -1) + 1e-12) - self.radius_init

    def _sphere_nablas(self, x_raw: jnp.ndarray) -> jnp.ndarray:
        r = jnp.sqrt(jnp.sum(x_raw * x_raw, -1, keepdims=True) + 1e-12)
        return x_raw / r

    def forward_with_nablas(self, params: Params, x: jnp.ndarray):
        """(sdf, nablas, h). Differentiable wrt params AND x (grad-of-grad for
        the eikonal term works because this is jax.grad, not a detached pass).

        The inner grad runs on a flat [M, C] input so the whole autodiff graph
        is rank-2 (degenerate middle dims crash this environment's TPU
        compiler); outputs are reshaped back to the caller's prefix.

        NEURECON_FUSED_NABLAS=1 (eval tools only): route through the fused
        forward+input-gradient Pallas kernel — one VMEM pass instead of the
        jax.grad reverse sweep with HBM-resident residuals. The kernel has
        no VJP, so a differentiated caller (training) errors loudly rather
        than silently misbehaving; the gate is off by default.
        """
        from neurecon_tpu.ops.fused_nablas import (fused_forward_with_nablas,
                                                   fused_nablas_enabled)
        from neurecon_tpu.ops.fused_nablas_vjp import (
            fused_forward_with_nablas_vjp, fused_nablas_vjp_enabled)
        if fused_nablas_vjp_enabled() and self.W_geo_feat > 0:
            # TRAIN-SAFE: hand-derived custom VJP (ops/fused_nablas_vjp.py)
            # — composes with the outer loss grad including the eikonal
            # grad-of-grad. Gate: NEURECON_FUSED_NABLAS_VJP /
            # training.fused_nablas_vjp.
            out = fused_forward_with_nablas_vjp(self, params, x)
            return self._add_sphere_terms(out, x)
        if fused_nablas_enabled() and self.W_geo_feat > 0:
            out = fused_forward_with_nablas(self, params, x)
            return self._add_sphere_terms(out, x)
        prefix = x.shape[:-1]
        x_flat = x.reshape(-1, x.shape[-1])

        def scalar_sum(x_):
            sdf, h = self.forward(params, x_, return_h=True)
            return jnp.sum(sdf), (sdf, h)

        grads, (sdf, h) = jax.grad(scalar_sum, has_aux=True)(x_flat)
        return (sdf.reshape(prefix), grads.reshape(prefix + x.shape[-1:]),
                h.reshape(prefix + h.shape[-1:]))

    def _add_sphere_terms(self, out, x):
        """Apply the sphere_residual prior outside a fused kernel: the
        analytic term is params-free traced XLA, so autodiff through it
        composes with the kernel's custom VJP for free."""
        if not self.sphere_residual:
            return out
        sdf, nablas, h = out
        return (sdf + self._sphere_sdf(x), nablas + self._sphere_nablas(x), h)

    def forward_fast(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Forward-only sdf query through the fused Pallas MLP kernel
        (keeps activations in VMEM across all layers). For gradient-free
        contexts only — samplers, ray casting, mesh grids."""
        from neurecon_tpu.ops.fused_mlp import fused_sdf_forward
        sdf = fused_sdf_forward(self, params, x)
        if self.sphere_residual:
            sdf = sdf + self._sphere_sdf(x)
        return sdf

    def forward_query(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Gradient-free sdf query: the fused Pallas kernel on TPU, the plain
        jnp forward elsewhere (the kernel's interpreter mode is debug-only).
        Used by the upsamplers, ray casters, and mesh grids — all of which
        sit under stop_gradient, so the missing VJP is irrelevant."""
        from neurecon_tpu.ops.fused_mlp import fused_mlp_enabled
        if fused_mlp_enabled():
            return self.forward_fast(params, x)
        return self.forward(params, x)


def pretrain_siren_sdf(surface: ImplicitSurface, params: Params, key: jax.Array,
                       num_iters: int = 5000, lr: float = 1.0e-4,
                       batch_points: int = 5000,
                       target_radius: float = 0.5,
                       obj_bounding_size: float = 3.0) -> Params:
    """Pretrain a SIREN SDF to a sphere (ref base.py:284-310): L1 to |x| - r,
    Adam, fixed iterations — a single lax.scan compiled once."""
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, pts):
        sdf_gt = jnp.linalg.norm(pts, axis=-1) - target_radius
        sdf_pred = surface.forward(p, pts)
        return jnp.mean(jnp.abs(sdf_pred - sdf_gt))

    def step(carry, k):
        p, s = carry
        pts = jax.random.uniform(k, (batch_points, 3), jnp.float32,
                                 -obj_bounding_size, obj_bounding_size)
        loss, grads = jax.value_and_grad(loss_fn)(p, pts)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    keys = jax.random.split(key, num_iters)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, losses


# ---------------------------------------------------------------------------
# RadianceNet
# ---------------------------------------------------------------------------

class RadianceNet:
    def __init__(self,
                 D: int = 4,
                 W: int = 256,
                 skips: Sequence[int] = (),
                 W_geo_feat: int = 256,
                 embed_multires: int = 6,
                 embed_multires_view: int = 4,
                 use_view_dirs: bool = True,
                 weight_norm: bool = True,
                 use_siren: bool = False):
        if use_siren:
            assert len(skips) == 0, "do not use skips for siren"
        self.D, self.W = D, W
        self.skips = tuple(skips)
        self.use_view_dirs = use_view_dirs
        self.use_siren = use_siren
        self.weight_norm = weight_norm
        self.embed_fn, input_ch_pts = get_embedder(embed_multires, 3)
        if use_view_dirs:
            self.embed_fn_view, input_ch_views = get_embedder(embed_multires_view, 3)
            self.in_dim_0 = input_ch_pts + input_ch_views + 3 + W_geo_feat
        else:
            self.embed_fn_view = None
            self.in_dim_0 = input_ch_pts + W_geo_feat

        self.dims = []
        for l in range(D + 1):
            out_dim = 3 if l == D else W
            if l == 0:
                in_dim = self.in_dim_0
            elif l in self.skips:
                in_dim = self.in_dim_0 + W
            else:
                in_dim = W
            self.dims.append((in_dim, out_dim))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.D + 1)
        layers = []
        for l, (in_dim, out_dim) in enumerate(self.dims):
            if self.use_siren and l != self.D:
                layers.append(init_siren(keys[l], in_dim, out_dim,
                                         is_first=(l == 0),
                                         weight_norm=self.weight_norm))
            else:
                layers.append(init_dense(keys[l], in_dim, out_dim,
                                         weight_norm=self.weight_norm))
        return {"layers": layers}

    def forward(self, params: Params, x, view_dirs, normals, geometry_feature):
        prefix = x.shape[:-1]
        x = x.reshape(-1, x.shape[-1])
        x = self.embed_fn(x)
        if self.use_view_dirs:
            view_dirs = self.embed_fn_view(view_dirs.reshape(-1, view_dirs.shape[-1]))
            radiance_input = jnp.concatenate(
                [x, view_dirs, normals.reshape(-1, normals.shape[-1]),
                 geometry_feature.reshape(-1, geometry_feature.shape[-1])], axis=-1)
        else:
            radiance_input = jnp.concatenate(
                [x, geometry_feature.reshape(-1, geometry_feature.shape[-1])],
                axis=-1)

        h = radiance_input
        for i in range(self.D + 1):
            if i in self.skips:
                h = jnp.concatenate([h, radiance_input], axis=-1)
            h = apply_linear(params["layers"][i], h)
            if i == self.D:
                h = jax.nn.sigmoid(h)
            elif self.use_siren:
                h = sine_w0(h)
            else:
                h = jax.nn.relu(h)
        return h.reshape(prefix + (3,))


# ---------------------------------------------------------------------------
# Background NeRF MLP (NeRF++ inverted-sphere parameterization)
# ---------------------------------------------------------------------------

class NeRF:
    """Vanilla NeRF MLP used as the NeRF++ background (ref base.py:395-453):
    input_ch=4 for (x/r, 1/r), multires 10 / view multires 4, skip at 4 that
    concatenates [input_pts, h] AFTER the skip layer."""

    def __init__(self, D: int = 8, W: int = 256, input_ch: int = 3,
                 input_ch_view: int = 3, multires: int = -1,
                 multires_view: int = -1, output_ch: int = 4,
                 skips: Sequence[int] = (4,), use_view_dirs: bool = False):
        self.D, self.W = D, W
        self.skips = tuple(skips)
        self.use_view_dirs = use_view_dirs
        self.embed_fn, self.input_ch = get_embedder(multires, input_ch)
        self.embed_fn_view, self.input_ch_view = get_embedder(multires_view, input_ch_view)
        self.output_ch = output_ch

        self.pts_dims = [(self.input_ch, W)]
        for i in range(D - 1):
            in_dim = W + self.input_ch if i in self.skips else W
            self.pts_dims.append((in_dim, W))

    def init(self, key: jax.Array) -> Params:
        n_extra = 4 if self.use_view_dirs else 1
        keys = jax.random.split(key, self.D + n_extra)
        params = {"pts_linears": [
            init_dense(keys[i], in_d, out_d) for i, (in_d, out_d)
            in enumerate(self.pts_dims)]}
        if self.use_view_dirs:
            params["views_linear"] = init_dense(
                keys[self.D], self.input_ch_view + self.W, self.W // 2)
            params["feature_linear"] = init_dense(keys[self.D + 1], self.W, self.W)
            params["alpha_linear"] = init_dense(keys[self.D + 2], self.W, 1)
            params["rgb_linear"] = init_dense(keys[self.D + 3], self.W // 2, 3)
        else:
            params["output_linear"] = init_dense(keys[self.D], self.W, self.output_ch)
        return params

    def forward(self, params: Params, input_pts, input_views):
        input_pts = self.embed_fn(input_pts)
        if input_views is not None:
            input_views = self.embed_fn_view(input_views)

        h = input_pts
        for i in range(self.D):
            h = jax.nn.relu(apply_linear(params["pts_linears"][i], h))
            if i in self.skips:
                h = jnp.concatenate([input_pts, h], axis=-1)

        if self.use_view_dirs:
            sigma = apply_linear(params["alpha_linear"], h)
            feature = apply_linear(params["feature_linear"], h)
            h = jnp.concatenate([feature, input_views], axis=-1)
            h = jax.nn.relu(apply_linear(params["views_linear"], h))
            rgb = apply_linear(params["rgb_linear"], h)
        else:
            out = apply_linear(params["output_linear"], h)
            rgb, sigma = out[..., :3], out[..., 3:]

        return sigma[..., 0], jax.nn.sigmoid(rgb)


# ---------------------------------------------------------------------------
# ScalarField (small learnable scalar field MLP; ref base.py:456-483)
# ---------------------------------------------------------------------------

class ScalarField:
    """ReLU MLP -> scalar, zero-init output layer with constant bias so the
    field starts at init_val everywhere."""

    def __init__(self, input_ch: int = 3, W: int = 128, D: int = 4,
                 skips: Sequence[int] = (), init_val: float = -2.0):
        self.input_ch, self.W, self.D = input_ch, W, D
        self.skips = tuple(skips)
        self.init_val = init_val
        self.dims = [(input_ch, W)]
        for i in range(D - 1):
            in_dim = W + input_ch if i in self.skips else W
            self.dims.append((in_dim, W))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.D + 1)
        layers = []
        for i, (in_dim, out_dim) in enumerate(self.dims):
            # kaiming-uniform fan_in relu ≡ U(±sqrt(6/fan_in)), zero bias
            bound = math.sqrt(6.0 / in_dim)
            w = jax.random.uniform(keys[i], (out_dim, in_dim), jnp.float32,
                                   -bound, bound)
            layers.append({"w": w, "b": jnp.zeros((out_dim,))})
        out = {"w": jnp.zeros((1, self.W)),
               "b": jnp.full((1,), self.init_val)}
        return {"pts_linears": layers, "output_linear": out}

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(self.D):
            h = jax.nn.relu(apply_linear(params["pts_linears"][i], h))
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)
        return apply_linear(params["output_linear"], h)[..., 0]


# ---------------------------------------------------------------------------
# LR schedules & optimizer factory
# ---------------------------------------------------------------------------

def make_schedule(args):
    """Returns factor(step) in [0, 1] multiplying the base lr — semantics of
    reference get_scheduler (base.py:524-584), stepped per-iteration."""
    stype = args.training.scheduler.type
    total = int(args.training.num_iters)
    if stype == "multistep":
        milestones = np.asarray(sorted(args.training.scheduler.milestones))
        gamma = float(args.training.scheduler.gamma)

        def factor(step):
            n = jnp.sum(step >= milestones)
            return gamma ** n
    elif stype == "warmupcosine":
        warmup = int(args.training.scheduler.warmup_steps)
        min_factor = float(args.training.scheduler.setdefault("min_factor", 0.1))

        def factor(step):
            step = jnp.asarray(step, jnp.float32)
            warm = step / warmup
            cos = (jnp.cos(jnp.pi * (step - warmup) / (total - warmup)) + 1.0) \
                * 0.5 * (1 - min_factor) + min_factor
            return jnp.where(step < warmup, warm, cos)
    elif stype == "exponential_step":
        min_factor = float(args.training.scheduler.setdefault("min_factor", 0.1))

        def factor(step):
            t = jnp.clip(jnp.asarray(step, jnp.float32) / total, 0, 1)
            return jnp.exp(t * jnp.log(min_factor))
    else:
        raise NotImplementedError(stype)
    return factor


def make_optimizer(args, params):
    """Adam with per-iteration schedule; supports scalar lr or a per-top-level
    module lr dict with a 'default' entry (ref base.py:486-521)."""
    import optax

    factor = make_schedule(args)
    lr_cfg = args.training.lr

    if isinstance(lr_cfg, dict):
        lr_dict = dict(lr_cfg)
        default_lr = lr_dict.pop("default")

        def label_fn(p):
            return {k: (k if k in lr_dict else "default") for k in p.keys()}

        transforms = {"default": optax.adam(lambda s: default_lr * factor(s))}
        for name, lr in lr_dict.items():
            transforms[name] = optax.adam(lambda s, lr=lr: lr * factor(s))
        opt = optax.multi_transform(transforms, label_fn)
    else:
        base_lr = float(lr_cfg)
        opt = optax.adam(lambda s: base_lr * factor(s))
    return opt


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
