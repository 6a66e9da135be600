"""Mesh extraction from the NGP density field (export_mesh capability).

Replaces ``renderer_df.py:121-309`` (CUDA-adjacent mcubes/xatlas export)
with a dependency-free **marching tetrahedra** extractor: each grid cube
splits into 6 tetrahedra; each tet with a sign change on the iso-surface
emits 1-2 triangles with linear edge interpolation.  Simpler tables than
marching cubes, watertight on shared faces, and fully vectorized numpy.

The density field is evaluated on the grid with the jitted NGP apply in
chunks; output is a wavefront .obj (+ optional per-vertex albedo colors).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

# 6-tet decomposition of the unit cube (corner indices, consistent
# orientation).  Corners are numbered bit-wise: c = x | y<<1 | z<<2.
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 4, 5, 3],
    [4, 7, 5, 3],
    [4, 6, 7, 3],
    [0, 3, 2, 6],
    [0, 6, 4, 3],
], np.int32)

_CORNERS = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                     for x in (0, 1)], np.int32)
# note: corner c = x + 2y + 4z ordering
_CORNERS = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1]
                     for c in range(8)], np.int32)


def _tet_triangles(inside: np.ndarray):
    """For one sign pattern (4 bools), the triangles as edge-index pairs.

    Edges are (i, j) vertex-index pairs within the tet; interpolated
    crossing points become triangle vertices.
    """
    ins = [i for i in range(4) if inside[i]]
    outs = [i for i in range(4) if not inside[i]]
    if len(ins) == 0 or len(ins) == 4:
        return []
    if len(ins) == 1:
        a = ins[0]
        b, c, d = outs
        return [((a, b), (a, c), (a, d))]
    if len(ins) == 3:
        a = outs[0]
        b, c, d = ins
        return [((b, a), (d, a), (c, a))]
    # two in, two out -> quad -> two triangles
    a, b = ins
    c, d = outs
    return [((a, c), (b, c), (b, d)), ((a, c), (b, d), (a, d))]


_CASES = [_tet_triangles(np.array([(m >> i) & 1 for i in range(4)],
                                  bool))
          for m in range(16)]


def marching_tetrahedra(values: np.ndarray, iso: float,
                        origin: np.ndarray, spacing: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a (X, Y, Z) scalar grid.

    Returns (vertices (V, 3), faces (F, 3)); vertices de-duplicated.
    """
    gx, gy, gz = values.shape
    # all cube base coords
    bx, by, bz = np.meshgrid(np.arange(gx - 1), np.arange(gy - 1),
                             np.arange(gz - 1), indexing="ij")
    base = np.stack([bx, by, bz], axis=-1).reshape(-1, 3)  # (C, 3)

    corner_vals = np.stack([
        values[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz]
        for dx, dy, dz in _CORNERS], axis=-1)              # (C, 8)

    tris = []
    for tet in _TETS:
        tv = corner_vals[:, tet]                           # (C, 4)
        inside = tv > iso
        case = (inside[:, 0].astype(int) | (inside[:, 1].astype(int) << 1)
                | (inside[:, 2].astype(int) << 2)
                | (inside[:, 3].astype(int) << 3))
        for m in range(1, 15):
            sel = np.nonzero(case == m)[0]
            if len(sel) == 0:
                continue
            for tri in _CASES[m]:
                pts = []
                for (i, j) in tri:
                    vi = tv[sel, i]
                    vj = tv[sel, j]
                    t = (iso - vi) / np.where(
                        np.abs(vj - vi) < 1e-12, 1e-12, vj - vi)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pi = (base[sel] + _CORNERS[tet[i]]).astype(np.float64)
                    pj = (base[sel] + _CORNERS[tet[j]]).astype(np.float64)
                    pts.append(pi + t * (pj - pi))
                tris.append(np.stack(pts, axis=1))         # (S, 3, 3)
    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tri_pts = np.concatenate(tris, axis=0)                 # (T, 3, 3)
    flat = tri_pts.reshape(-1, 3)
    # dedupe vertices on a quantized key
    key = np.round(flat * 1e5).astype(np.int64)
    _, idx, inv = np.unique(key, axis=0, return_index=True,
                            return_inverse=True)
    verts = flat[idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[good]
    verts_world = origin[None] + verts * spacing[None]
    return verts_world.astype(np.float32), faces


def export_mesh(field_fn: Callable, path: str, bound: float = 4.0,
                resolution: int = 128, density_thresh: float = 10.0,
                chunk: int = 65536, color_fn: Optional[Callable] = None):
    """Evaluate the density field on a grid and write an .obj mesh."""
    import jax
    import jax.numpy as jnp

    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    f = jax.jit(field_fn)
    vals = []
    for i in range(0, grid.shape[0], chunk):
        sigma = f(jnp.asarray(grid[i:i + chunk]))
        vals.append(np.asarray(sigma))
    values = np.concatenate(vals).reshape(resolution, resolution, resolution)

    spacing = np.full(3, xs[1] - xs[0], np.float64)
    origin = np.full(3, -bound, np.float64)
    verts, faces = marching_tetrahedra(values, density_thresh, origin,
                                       spacing)

    colors = None
    if color_fn is not None and len(verts):
        colors = []
        for i in range(0, len(verts), chunk):
            colors.append(np.asarray(color_fn(jnp.asarray(verts[i:i + chunk]))))
        colors = np.concatenate(colors)

    with open(path, "w") as fp:
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                fp.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                fp.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f_ in faces:
            fp.write(f"f {f_[0] + 1} {f_[1] + 1} {f_[2] + 1}\n")
    return verts, faces
