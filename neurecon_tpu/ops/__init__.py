from neurecon_tpu.ops.ray import (
    get_rays,
    get_rays_at,
    get_sphere_intersection,
    get_dvals_from_radius,
    lift,
    lin2img,
    near_far_from_sphere,
)
from neurecon_tpu.ops.sampling import (merge_sorted, sample_cdf, sample_pdf,
                                       searchsorted)

__all__ = [
    "get_rays", "get_rays_at", "get_sphere_intersection", "get_dvals_from_radius",
    "lift", "lin2img", "near_far_from_sphere",
    "merge_sorted", "sample_cdf", "sample_pdf", "searchsorted",
]
