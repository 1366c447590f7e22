"""Camera-path generation for free-viewpoint rendering — pure numpy/scipy.

The five paths of the reference tools/render_view.py:
  * spiral            (:280-285): NeRF-like spiral about the average pose
  * spherical_spiral  (:290-331): spherical spiral through 3 small-circle views
  * small_circle      (:337-366): smoothed interpolation along a small circle
  * interpolation     (:371-386): Slerp + lerp through all input views
  * great_circle      (:391-426): smoothed interpolation along a great circle
plus smoothed_motion_interpolation (:88-105) for accel/decel pacing.
"""
from __future__ import annotations

import math

import numpy as np
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp

from neurecon_tpu.utils.camera import look_at, normalize, view_matrix


def poses_avg(poses: np.ndarray) -> np.ndarray:
    center = poses[:, :3, 3].mean(0)
    forward = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    return view_matrix(forward, up, center)


def c2w_track_spiral(c2w, up_vec, rads, focus: float, zrate: float, rots: int,
                     N: int):
    """Spiral track looking at the point [0, 0, focus] in (center) camera
    coordinates; OpenCV convention."""
    c2w_tracks = []
    rads = np.array(list(rads) + [1.0])
    focus_in_cam = np.array([0, 0, focus, 1.0])
    focus_in_world = np.dot(c2w[:3, :4], focus_in_cam)

    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        cam_location = np.dot(
            c2w[:3, :4],
            np.array([np.cos(theta), np.sin(theta), np.sin(theta * zrate), 1.0])
            * rads)
        c2w_tracks.append(look_at(cam_location, focus_in_world, up=up_vec))
    return np.stack(c2w_tracks)


def smoothed_motion_interpolation(full_range, num_samples,
                                  uniform_proportion=1 / 3.0):
    """Angle sequence with uniform acceleration, cruise, deceleration."""
    half_acc_proportion = (1 - uniform_proportion) / 2.0
    num_uniform_acc = max(math.ceil(num_samples * half_acc_proportion), 2)
    num_uniform = max(math.ceil(num_samples * uniform_proportion), 2)
    seg_velocity = np.arange(num_uniform_acc)
    seg_angle = np.cumsum(seg_velocity)
    # full angle = 2*k*x_max + k*v_max*num_uniform
    ratio = full_range / (2.0 * seg_angle.max() + seg_velocity.max() * num_uniform)
    seg_acc = seg_angle * ratio
    acc_angle = seg_acc.max()
    seg_uniform = np.linspace(acc_angle, full_range - acc_angle,
                              num_uniform + 2)[1:-1]
    return np.concatenate([seg_acc, seg_uniform, full_range - np.flip(seg_acc)])


def path_spiral(c2ws: np.ndarray, num_views: int):
    c2w_center = poses_avg(c2ws)
    up = c2ws[:, :3, 1].sum(0)
    rads = np.percentile(np.abs(c2ws[:, :3, 3]), 30, 0)
    focus_distance = np.mean(np.linalg.norm(c2ws[:, :3, 3], axis=-1))
    return c2w_track_spiral(c2w_center, up, rads, focus_distance * 0.8,
                            zrate=0.0, rots=1, N=num_views)


def path_spherical_spiral(c2ws: np.ndarray, num_views: int, view_ids,
                          up_angle: float = np.pi / 3.0, n_rots: float = 2.2):
    """3 views assumed on a small circle (CCW from above) -> spherical spiral."""
    assert len(view_ids) == 3
    centers = c2ws[list(view_ids), :3, 3]
    centers_norm = np.linalg.norm(centers, axis=-1)
    radius = np.max(centers_norm)
    centers = centers * radius / centers_norm[:, None]
    up_vec = normalize(np.cross(centers[1] - centers[0], centers[2] - centers[0]))

    sphere_thetas = np.linspace(0, np.pi * 2.0 * n_rots, num_views)
    sphere_phis = np.linspace(0, up_angle, num_views)
    focus_center = np.zeros([3])

    rots_theta = R.from_rotvec(sphere_thetas[:, None] * up_vec[None, :])
    render_centers = rots_theta.apply(centers[0])
    horizontal_vec = normalize(np.cross(render_centers - focus_center[None, :],
                                        up_vec[None, :], axis=-1))
    rots_phi = R.from_rotvec(sphere_phis[:, None] * horizontal_vec)
    render_centers = rots_phi.apply(render_centers)
    return look_at(render_centers, focus_center[None, :], up=-up_vec)


def path_small_circle(c2ws: np.ndarray, num_views: int, view_ids):
    """3 views on a small circle -> smoothed interpolation along it."""
    assert len(view_ids) == 3
    centers = c2ws[list(view_ids), :3, 3]
    centers_norm = np.linalg.norm(centers, axis=-1)
    radius = np.max(centers_norm)
    centers = centers * radius / centers_norm[:, None]
    vec0 = centers[1] - centers[0]
    vec1 = centers[2] - centers[0]
    up_vec = normalize(np.cross(vec0, vec1))
    len_chord = np.linalg.norm(vec1, axis=-1)
    full_angle = np.arcsin(len_chord / 2 / radius) * 2.0
    all_angles = smoothed_motion_interpolation(full_angle, num_views)
    rots = R.from_rotvec(all_angles[:, None] * up_vec[None, :])
    centers = rots.apply(centers[0])
    return look_at(centers, np.zeros_like(centers), up=-up_vec)


def path_interpolation(c2ws: np.ndarray, num_views: int):
    key_rots = R.from_matrix(c2ws[:, :3, :3])
    key_times = list(range(len(key_rots)))
    slerp = Slerp(key_times, key_rots)
    interp = interp1d(key_times, c2ws[:, :3, 3], axis=0)
    render_c2ws = []
    for i in range(num_views):
        time = float(i) / num_views * (len(c2ws) - 1)
        c2w = np.eye(4)
        c2w[:3, :3] = slerp(time).as_matrix()
        c2w[:3, 3] = interp(time)
        render_c2ws.append(c2w)
    return np.stack(render_c2ws)


def path_great_circle(c2ws: np.ndarray, num_views: int, view01):
    """2 views on a great circle -> smoothed interpolation along it."""
    assert len(view01) == 2
    view0, view1 = view01
    c0 = c2ws[view0, :3, 3]
    c1 = c2ws[view1, :3, 3]
    radius = max(np.linalg.norm(c0), np.linalg.norm(c1))
    c0 = c0 * radius / np.linalg.norm(c0)
    c1 = c1 * radius / np.linalg.norm(c1)
    up_vec = normalize(np.cross(c0, c1))
    len_chord = np.linalg.norm(c0 - c1, axis=-1)
    full_angle = np.arcsin(len_chord / 2 / radius) * 2.0
    all_angles = smoothed_motion_interpolation(full_angle, num_views)
    rots = R.from_rotvec(all_angles[:, None] * up_vec[None, :])
    centers = rots.apply(c0)
    return look_at(centers, np.zeros_like(centers), up=-up_vec)


def generate_camera_path(camera_path: str, c2ws: np.ndarray, num_views: int,
                         camera_inds: str = "11,15"):
    """Dispatch mirroring render_view's --camera_path choices."""
    if camera_path == "spiral":
        return path_spiral(c2ws, num_views)
    ids = [int(v) for v in str(camera_inds).split(",")]
    if camera_path == "spherical_spiral":
        return path_spherical_spiral(c2ws, num_views, ids)
    if camera_path == "small_circle":
        return path_small_circle(c2ws, num_views, ids)
    if camera_path == "interpolation":
        return path_interpolation(c2ws, num_views)
    if camera_path == "great_circle":
        return path_great_circle(c2ws, num_views, ids[:2])
    raise RuntimeError(
        "choose render type between [spiral, interpolation, small_circle, "
        "great_circle, spherical_spiral]")
