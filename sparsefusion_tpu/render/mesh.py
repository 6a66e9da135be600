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


def _face_uv_layout(n_faces: int, block: int, atlas: int):
    """Per-face chart packing: two triangles per (block x block) cell.

    Returns (uvs (F, 3, 2) in [0, 1], cell origin (F, 2) texels, lower (F,)
    bool — whether the face is the lower-left triangle of its cell).
    UV corners keep a half-texel inset so bilinear taps stay inside the
    triangle's own chart.
    """
    cells_per_row = atlas // block
    face_idx = np.arange(n_faces)
    cell = face_idx // 2
    lower = (face_idx % 2) == 0
    cx = (cell % cells_per_row) * block
    cy = (cell // cells_per_row) * block
    inset = 1.0
    b = float(block)
    # lower triangle: (i, i), (i+b, i), (i, i+b); upper: reflected
    lo = np.array([[inset, inset], [b - inset, inset], [inset, b - inset]])
    up = np.array([[b - inset, b - inset], [inset, b - inset],
                   [b - inset, inset]])
    corners = np.where(lower[:, None, None], lo[None], up[None])  # (F, 3, 2)
    origin = np.stack([cx, cy], axis=-1).astype(np.float64)       # (F, 2)
    uvs = (origin[:, None, :] + corners) / float(atlas)
    return uvs, origin, lower


def bake_texture(verts: np.ndarray, faces: np.ndarray, color_fn,
                 block: int = 8, chunk: int = 65536):
    """Bake per-face charts into a texture atlas.

    The reference bakes an xatlas-parameterized texture by rasterizing
    the mesh per view (``renderer_df.py:121-309``); here each face gets
    its own chart cell — no parameterization solve, watertight seams are
    traded for chart borders (standard lightmap-style packing), and the
    bake is one batched ``color_fn`` evaluation over every texel's
    barycentric 3D position.

    Returns (texture (A, A, 3) float in [0,1], uvs (F, 3, 2)).
    """
    n_faces = len(faces)
    cells = (n_faces + 1) // 2
    cells_per_row = int(np.ceil(np.sqrt(cells)))
    atlas = 1 << int(np.ceil(np.log2(max(cells_per_row * block, block))))
    uvs, origin, lower = _face_uv_layout(n_faces, block, atlas)

    tex = np.zeros((atlas, atlas, 3), np.float32)
    wsum = np.zeros((atlas, atlas, 1), np.float32)

    # texel centers of one cell
    ty, tx = np.meshgrid(np.arange(block), np.arange(block), indexing="ij")
    tx = tx.reshape(-1).astype(np.float64) + 0.5
    ty = ty.reshape(-1).astype(np.float64) + 0.5
    b = float(block)
    # barycentric coords of each texel w.r.t. the lower / upper triangle
    # lower tri verts (0,0), (b,0), (0,b); upper (b,b), (0,b), (b,0)
    w1_lo = tx / b
    w2_lo = ty / b
    w0_lo = 1.0 - w1_lo - w2_lo
    w1_up = 1.0 - tx / b
    w2_up = 1.0 - ty / b
    w0_up = 1.0 - w1_up - w2_up
    bary_lo = np.stack([w0_lo, w1_lo, w2_lo], axis=-1)   # (T, 3)
    bary_up = np.stack([w0_up, w1_up, w2_up], axis=-1)

    tri = verts[faces]                                    # (F, 3, 3)
    for fstart in range(0, n_faces, max(1, chunk // (block * block))):
        fend = min(n_faces, fstart + max(1, chunk // (block * block)))
        fsl = slice(fstart, fend)
        bary = np.where(lower[fsl, None, None], bary_lo[None],
                        bary_up[None])                    # (f, T, 3)
        # clamp texels outside the triangle to its closest interior bary
        bary_cl = np.clip(bary, 0.0, 1.0)
        bary_cl = bary_cl / np.maximum(bary_cl.sum(-1, keepdims=True), 1e-8)
        pts = np.einsum("ftk,fkc->ftc", bary_cl, tri[fsl])  # (f, T, 3)
        cols = np.asarray(color_fn(pts.reshape(-1, 3))).reshape(
            pts.shape[0], -1, 3)
        ox = origin[fsl, 0].astype(int)
        oy = origin[fsl, 1].astype(int)
        for i in range(fend - fstart):
            cell_img = cols[i].reshape(block, block, 3)
            tex[oy[i]:oy[i] + block, ox[i]:ox[i] + block] += cell_img
            wsum[oy[i]:oy[i] + block, ox[i]:ox[i] + block] += 1.0
    tex = tex / np.maximum(wsum, 1.0)
    return np.clip(tex, 0.0, 1.0), uvs


def export_mesh_textured(field_fn: Callable, color_fn: Callable, path: str,
                         bound: float = 4.0, resolution: int = 128,
                         density_thresh: float = 10.0, chunk: int = 65536,
                         block: int = 8):
    """Textured export: .obj + .mtl + baked .png atlas.

    Parity target: the reference's ``export_mesh`` (mcubes + xatlas UV
    atlas + per-view rasterized bake, ``renderer_df.py:121-309``); here
    the field is queried directly at chart texel positions instead of
    rasterizing training views.
    """
    import jax
    import jax.numpy as jnp

    base = path[:-4] if path.endswith(".obj") else path
    name = base.split("/")[-1]
    verts, faces = export_mesh(field_fn, base + ".obj", bound=bound,
                               resolution=resolution,
                               density_thresh=density_thresh, chunk=chunk)
    if not len(faces):
        return verts, faces, None

    cfn = jax.jit(color_fn)
    tex, uvs = bake_texture(
        verts, faces, lambda p: cfn(jnp.asarray(p, jnp.float32)),
        block=block, chunk=chunk)

    import imageio

    # PNG row 0 is top; OBJ v-coordinate 0 is bottom
    imageio.imwrite(base + ".png",
                    (tex[::-1] * 255).astype(np.uint8))

    with open(base + ".mtl", "w") as fp:
        fp.write(f"newmtl {name}\nKd 1.0 1.0 1.0\nmap_Kd {name}.png\n")

    with open(base + ".obj", "w") as fp:
        fp.write(f"mtllib {name}.mtl\nusemtl {name}\n")
        for v in verts:
            fp.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f_uv in uvs.reshape(-1, 2):
            fp.write(f"vt {f_uv[0]} {f_uv[1]}\n")
        for i, f_ in enumerate(faces):
            a, b_, c = (int(x) + 1 for x in f_)
            t = 3 * i + 1
            fp.write(f"f {a}/{t} {b_}/{t + 1} {c}/{t + 2}\n")
    return verts, faces, tex
