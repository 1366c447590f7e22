from neurecon_tpu.ops.ray import (
    get_rays,
    get_rays_at,
    get_sphere_intersection,
    get_dvals_from_radius,
    lift,
    lin2img,
    near_far_from_sphere,
)
from neurecon_tpu.ops.sampling import sample_cdf, sample_pdf, searchsorted

# merge_sorted stays importable from neurecon_tpu.ops.sampling for bench /
# wide-row workloads, but is deliberately NOT part of the package surface: the
# production upsamplers kept concat+sort after it benchmarked slower
# (models/frameworks/neus.py:147, docs/performance.md).
__all__ = [
    "get_rays", "get_rays_at", "get_sphere_intersection", "get_dvals_from_radius",
    "lift", "lin2img", "near_far_from_sphere",
    "sample_cdf", "sample_pdf", "searchsorted",
]
