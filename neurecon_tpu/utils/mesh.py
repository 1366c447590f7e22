"""Level-set mesh extraction: device-side SDF grid query + host marching
tetrahedra + PLY writer.

Replaces the reference's utils/mesh_util.py:13-113 (skimage.marching_cubes +
plyfile, neither available here). The N^3 grid query runs as a jitted, chunked
batch on the accelerator (the reference's 134M-MLP-eval hot loop,
mesh_util.py:102-110); the triangulation is vectorized numpy marching
TETRAHEDRA (6-tet Kuhn split per cube) — same level-set contract as marching
cubes, slightly denser triangles, with exact vertex dedup on grid-edge ids.
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

from neurecon_tpu.utils.console import log

# 6-tetrahedra decomposition of the unit cube, all sharing diagonal 0-7.
# Cube corners indexed by binary (x, y, z) bits: corner = x<<2 | y<<1 | z.
_TETS = np.array([
    (0, 5, 1, 7), (0, 1, 3, 7), (0, 3, 2, 7),
    (0, 2, 6, 7), (0, 6, 4, 7), (0, 4, 5, 7),
], dtype=np.int64)

_CORNER_OFFSETS = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=np.int64)


def _case_tables():
    """For each of the 16 inside-masks of a tet, the triangles to emit; each
    triangle is 3 crossing edges, each edge a (corner, corner) pair."""
    cases = []
    for case in range(16):
        inside = [i for i in range(4) if (case >> i) & 1]
        outside = [i for i in range(4) if not (case >> i) & 1]
        if len(inside) == 1:
            i = inside[0]
            a, b, c = outside
            tris = [[(i, a), (i, b), (i, c)]]
        elif len(inside) == 3:
            i = outside[0]
            a, b, c = inside
            tris = [[(a, i), (b, i), (c, i)]]
        elif len(inside) == 2:
            i, j = inside
            k, l = outside
            tris = [[(i, k), (i, l), (j, k)], [(j, k), (i, l), (j, l)]]
        else:
            tris = []
        cases.append(tris)
    return cases


_CASES = _case_tables()


def marching_tetrahedra(values: np.ndarray, level: float = 0.0):
    """Triangulate the `level` iso-surface of a dense scalar grid.

    values: [Nx, Ny, Nz]; returns (verts [V, 3] in grid-index coordinates,
    faces [F, 3] int32), with triangle winding such that normals point toward
    values > level.
    """
    Nx, Ny, Nz = values.shape
    flat = values.reshape(-1)

    def node_id(i, j, k):
        return (i * Ny + j) * Nz + k

    # crossing cubes only (huge sparsity win: O(N^2) of O(N^3) cubes cross)
    v000 = values[:-1, :-1, :-1]
    cmin = v000.copy(); cmax = v000.copy()
    for dx, dy, dz in _CORNER_OFFSETS[1:]:
        c = values[dx:Nx - 1 + dx, dy:Ny - 1 + dy, dz:Nz - 1 + dz]
        np.minimum(cmin, c, out=cmin)
        np.maximum(cmax, c, out=cmax)
    ci, cj, ck = np.nonzero((cmin < level) & (cmax >= level))
    if ci.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    corner_ids = np.stack([node_id(ci + dx, cj + dy, ck + dz)
                           for dx, dy, dz in _CORNER_OFFSETS], axis=-1)  # [M, 8]

    # per emitted triangle vertex: the inside-corner and outside-corner node
    # ids of the grid edge it sits on
    tri_a, tri_b = [], []
    for tet in _TETS:
        tet_ids = corner_ids[:, tet]
        tet_vals = flat[tet_ids]
        inside = tet_vals < level
        case = (inside * np.array([1, 2, 4, 8])).sum(-1)
        for c in range(1, 15):
            tris = _CASES[c]
            sel = np.nonzero(case == c)[0]
            if sel.size == 0:
                continue
            ids = tet_ids[sel]
            for tri in tris:
                a3 = np.stack([ids[:, p] for (p, q) in tri], -1)  # [S, 3]
                b3 = np.stack([ids[:, q] for (p, q) in tri], -1)
                tri_a.append(a3)
                tri_b.append(b3)
    if not tri_a:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri_a = np.concatenate(tri_a, 0)  # [T, 3] inside-corner node id per vertex
    tri_b = np.concatenate(tri_b, 0)  # [T, 3] outside-corner node id

    # dedup vertices on undirected grid edges
    lo = np.minimum(tri_a, tri_b)
    hi = np.maximum(tri_a, tri_b)
    keys = lo.astype(np.int64) * (Nx * Ny * Nz) + hi
    uniq, faces = np.unique(keys, return_inverse=True)
    faces = faces.reshape(-1, 3).astype(np.int32)

    ua = (uniq // (Nx * Ny * Nz)).astype(np.int64)
    ub = (uniq % (Nx * Ny * Nz)).astype(np.int64)
    va, vb = flat[ua], flat[ub]
    t = (level - va) / (vb - va)
    t = np.clip(np.nan_to_num(t, nan=0.5), 0.0, 1.0)[:, None]

    def coords(ids):
        k = ids % Nz
        j = (ids // Nz) % Ny
        i = ids // (Ny * Nz)
        return np.stack([i, j, k], -1).astype(np.float64)

    verts = coords(ua) + t * (coords(ub) - coords(ua))

    # consistent winding: normal toward values > level (outside). The unique
    # keys lost the inside/outside distinction (min/max), so the reference
    # direction comes from the original tri_a (inside) / tri_b (outside) pairs.
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(b - a, c - a)
    ref = (coords(tri_b.reshape(-1)).reshape(-1, 3, 3).mean(1)
           - coords(tri_a.reshape(-1)).reshape(-1, 3, 3).mean(1))
    flip = (n * ref).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    return verts.astype(np.float32), faces


def write_ply(filepath: str, verts: np.ndarray, faces: np.ndarray):
    """Binary little-endian PLY (replaces plyfile)."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n")
    face_rec = np.empty(len(faces),
                        dtype=[("n", "u1"), ("idx", "<i4", (3,))])
    face_rec["n"] = 3
    face_rec["idx"] = faces
    with open(filepath, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        f.write(face_rec.tobytes())


def read_ply(filepath: str):
    """Minimal reader for the files write_ply produces (tests/tools)."""
    with open(filepath, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n_v = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
        n_f = int([l for l in lines if l.startswith("element face")][0].split()[-1])
        verts = np.frombuffer(f.read(n_v * 12), "<f4").reshape(n_v, 3)
        rec = np.frombuffer(f.read(n_f * 13),
                            dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        return verts.copy(), rec["idx"].copy()


def query_grid(surface_fn: Callable, N: int, volume_size: float,
               chunk: int = 256 * 1024, show_progress: bool = False) -> np.ndarray:
    """Evaluate surface_fn on an N^3 grid centered at the origin.

    TPU-native shape of the reference's GPU hot loop (mesh_util.py:102-110):
    grid coordinates are generated ON DEVICE from the x-plane index (the only
    host->device traffic is one scalar per call), a `lax.map` walks
    `chunk`-sized point blocks inside one compiled program, and values come
    back one x-slab at a time — a handful of dispatches instead of one
    round-trip per 256k-point chunk through the TPU tunnel. One-shot CLI wall
    time is dominated by the program compile either way; repeat invocations
    hit the persistent compilation cache (see neurecon_tpu/__init__.py)."""
    import jax
    import jax.numpy as jnp

    s = float(volume_size)
    step = s / (N - 1)
    # x-slab height: ~8 blocks of `chunk` points per dispatch
    rows = max(1, min(N, (8 * chunk) // (N * N)))
    while N % rows:  # static shapes: every slab identical
        rows -= 1
    pts_per_slab = rows * N * N
    n_blocks = -(-pts_per_slab // chunk)
    pad = n_blocks * chunk - pts_per_slab

    @jax.jit
    def slab_vals(x0):
        axis = jnp.arange(N, dtype=jnp.float32) * step - s / 2.0
        xs = (x0 + jnp.arange(rows, dtype=jnp.float32)) * step - s / 2.0
        xi, yi, zi = jnp.meshgrid(xs, axis, axis, indexing="ij")
        pts = jnp.stack([xi, yi, zi], -1).reshape(-1, 3)
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        vals = jax.lax.map(surface_fn, pts.reshape(n_blocks, chunk, 3))
        return vals.reshape(-1)[:pts_per_slab]

    out = np.empty((N * N * N,), np.float32)
    for i, x0 in enumerate(range(0, N, rows)):
        out[x0 * N * N:(x0 + rows) * N * N] = np.asarray(slab_vals(x0))
        if show_progress and i % 8 == 0:
            log.info(f"  grid query slab {x0}/{N}")
    return out.reshape(N, N, N)


def extract_mesh(surface_fn: Callable, volume_size: float = 2.0,
                 level: float = 0.0, N: int = 512,
                 filepath: str = "./surface.ply", chunk: int = 256 * 1024,
                 show_progress: bool = False) -> dict:
    """Full pipeline: grid query -> marching tetrahedra -> .ply.

    surface_fn: pts [M, 3] -> values [M] (e.g. a bound ImplicitSurface.forward).
    Mirrors the reference extract_mesh contract (mesh_util.py:82-113).
    """
    t0 = time.time()
    values = query_grid(surface_fn, N, volume_size, chunk, show_progress)
    verts, faces = marching_tetrahedra(values.astype(np.float64), level)
    # grid-index -> world coordinates
    s = float(volume_size)
    verts = verts * (s / (N - 1)) - s / 2.0
    write_ply(filepath, verts, faces)
    log.info(f"extract_mesh: {len(verts)} verts / {len(faces)} faces "
             f"-> {filepath} in {time.time() - t0:.1f}s")
    return {"n_verts": len(verts), "n_faces": len(faces), "filepath": filepath}
