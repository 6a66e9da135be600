"""Perspective cameras with PyTorch3D-compatible conventions, as a JAX pytree.

The reference pipeline leans on PyTorch3D ``PerspectiveCameras`` everywhere
(see ``/root/reference/utils/camera_utils.py``, ``sparsefusion/eft.py:239-257``).
Getting these conventions wrong breaks everything silently, so this module
re-derives them explicitly:

Row-vector convention (points are rows, transforms multiply on the right):

    x_view = x_world @ R + T                      # world-to-view
    C      = -T @ R^T                             # camera center in world

Screen/NDC convention: the camera looks down +Z, +X is *left*, +Y is *up*.
For cameras defined in NDC space (``in_ndc=True``, the only mode the
reference uses), projection of a view-space point (x, y, z) is

    x_ndc = fx * x / z + px
    y_ndc = fy * y / z + py
    w_ndc = 1 / z                                  # returned 3rd coordinate

and unprojection of (x_ndc, y_ndc, depth) is

    x = (x_ndc - px) * depth / fx
    y = (y_ndc - py) * depth / fy
    z = depth

For non-square images the NDC span of the longer side is scaled by
(long/short), matching PyTorch3D's convention; the reference only ever
renders square crops (256x256) so this is mostly future-proofing.

Everything here is shape-static and jit-friendly; host-side helpers for
camera-path fitting live in :mod:`sparsefusion_tpu.core.paths`.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cameras:
    """A batch of perspective cameras (NDC-space intrinsics).

    Fields mirror the constructor arguments of PyTorch3D PerspectiveCameras
    that the reference passes around (``demo.py:72``):

    Attributes:
        R: (N, 3, 3) world-to-view rotations (row-vector convention).
        T: (N, 3) world-to-view translations.
        focal_length: (N, 2) NDC focal lengths (fx, fy).
        principal_point: (N, 2) NDC principal points (px, py).
        image_size: (N, 2) image sizes in pixels as (H, W).
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray
    image_size: jnp.ndarray

    def __len__(self) -> int:
        return self.R.shape[0]

    @staticmethod
    def create(R, T, focal_length, principal_point, image_size) -> "Cameras":
        R = jnp.asarray(R, jnp.float32)
        T = jnp.asarray(T, jnp.float32)
        n = R.shape[0]
        focal_length = jnp.broadcast_to(
            jnp.asarray(focal_length, jnp.float32).reshape(-1, 2), (n, 2))
        principal_point = jnp.broadcast_to(
            jnp.asarray(principal_point, jnp.float32).reshape(-1, 2), (n, 2))
        image_size = jnp.broadcast_to(
            jnp.asarray(image_size, jnp.float32).reshape(-1, 2), (n, 2))
        return Cameras(R, T, focal_length, principal_point, image_size)


# ---------------------------------------------------------------------------
# Basic transforms
# ---------------------------------------------------------------------------

def world_to_view(cameras: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """Transform world points into each camera's view space.

    Args:
        cameras: N cameras.
        points: (P, 3) or (N, P, 3) world points.

    Returns:
        (N, P, 3) view-space points.
    """
    if points.ndim == 2:
        points = points[None]
    # x_view = x_world @ R + T   (row-vector convention)
    return jnp.einsum("npi,nij->npj", points, cameras.R) + cameras.T[:, None, :]


def view_to_world(cameras: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`world_to_view`: x_world = (x_view - T) @ R^T."""
    if points.ndim == 2:
        points = points[None]
    return jnp.einsum(
        "npi,nji->npj", points - cameras.T[:, None, :], cameras.R)


def camera_centers(cameras: Cameras) -> jnp.ndarray:
    """Camera centers in world coordinates: C = -T @ R^T.  (N, 3)."""
    return -jnp.einsum("ni,nji->nj", cameras.T, cameras.R)


def _ndc_scale(cameras: Cameras) -> jnp.ndarray:
    """Per-camera (sx, sy) NDC half-span correction for non-square images.

    PyTorch3D fixes the NDC range of the *shorter* side to [-1, 1] and
    scales the longer side's range by (long / short).  Projection divides
    by this factor per axis; for square images it is (1, 1).
    """
    h = cameras.image_size[:, 0]
    w = cameras.image_size[:, 1]
    short = jnp.minimum(h, w)
    sx = w / short
    sy = h / short
    return jnp.stack([sx, sy], axis=-1)  # (N, 2)


def transform_points_ndc(cameras: Cameras, points: jnp.ndarray,
                         eps: float = 1e-8) -> jnp.ndarray:
    """Project world points to NDC, matching PerspectiveCameras.transform_points_ndc.

    Used by the EFT epipolar feature lookup (``sparsefusion/eft.py:239``).

    Args:
        points: (P, 3) or (N, P, 3) world points.

    Returns:
        (N, P, 3): (x_ndc, y_ndc, 1/z).
    """
    xv = world_to_view(cameras, points)
    z = xv[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z >= 0, eps, -eps), z)
    f = cameras.focal_length[:, None, :]
    c = cameras.principal_point[:, None, :]
    xy = f * xv[..., :2] / z + c
    return jnp.concatenate([xy, 1.0 / z], axis=-1)


def unproject_ndc_points(cameras: Cameras, xy_depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject (x_ndc, y_ndc, depth) to world coordinates.

    Mirrors PerspectiveCameras.unproject_points(..., from_ndc=True,
    world_coordinates=True), used by PyTorch3D's ``_xy_to_ray_bundle`` which
    the reference ray samplers are built from (``utils/render_utils.py:43``).

    Args:
        xy_depth: (N, P, 3) with the 3rd coordinate the view-space depth z.

    Returns:
        (N, P, 3) world points.
    """
    f = cameras.focal_length[:, None, :]
    c = cameras.principal_point[:, None, :]
    depth = xy_depth[..., 2:3]
    xy_view = (xy_depth[..., :2] - c) * depth / f
    xv = jnp.concatenate([xy_view, depth], axis=-1)
    return view_to_world(cameras, xv)


# ---------------------------------------------------------------------------
# Slicing / concatenation (RelativeCameraLoader.get_camera_slice/concat_cameras)
# ---------------------------------------------------------------------------

def get_camera_slice(cameras: Cameras, indices) -> Cameras:
    """Subset of cameras by indices (``utils/camera_utils.py:76``)."""
    idx = jnp.asarray(indices)
    return Cameras(
        R=cameras.R[idx],
        T=cameras.T[idx],
        focal_length=cameras.focal_length[idx],
        principal_point=cameras.principal_point[idx],
        image_size=cameras.image_size[idx],
    )


def concat_cameras(camera_list: Sequence[Cameras]) -> Cameras:
    """Concatenate camera batches (``utils/camera_utils.py:51``)."""
    return Cameras(
        R=jnp.concatenate([c.R for c in camera_list]),
        T=jnp.concatenate([c.T for c in camera_list]),
        focal_length=jnp.concatenate([c.focal_length for c in camera_list]),
        principal_point=jnp.concatenate([c.principal_point for c in camera_list]),
        image_size=jnp.concatenate([c.image_size for c in camera_list]),
    )


# ---------------------------------------------------------------------------
# Relative cameras (RelativeCameraLoader.get_relative_camera)
# ---------------------------------------------------------------------------

def _w2v_matrix(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """4x4 world-to-view matrices, row-vector convention: [[R, 0], [T, 1]]."""
    n = R.shape[0]
    M = jnp.zeros((n, 4, 4), R.dtype)
    M = M.at[:, :3, :3].set(R)
    M = M.at[:, 3, :3].set(T)
    M = M.at[:, 3, 3].set(1.0)
    return M


def get_relative_cameras(cameras: Cameras, query_idx,
                         center_at_origin: bool = False) -> Cameras:
    """Re-express all cameras relative to a base query camera.

    Replicates ``utils/camera_utils.py:98-135``: the relative world-to-view
    transform is g_q^{-1} o g_i where g_q uses the query rotation and either
    the query translation (``center_at_origin=True``) or zero translation.

    Args:
        query_idx: length-1 index sequence of the query camera.

    Returns:
        Cameras with transformed R/T; intrinsics are passed through.
    """
    q = jnp.asarray(query_idx).reshape(-1)[0]
    Rq = cameras.R[q][None]
    if center_at_origin:
        Tq = cameras.T[q][None]
    else:
        Tq = jnp.zeros_like(cameras.T[q][None])
    # identity_cam world2view, inverted:  M_id^{-1} @ M_all
    M_id = _w2v_matrix(Rq, Tq)
    M_id_inv = jnp.linalg.inv(M_id)
    M_all = _w2v_matrix(cameras.R, cameras.T)
    M_rel = jnp.einsum("bij,njk->nik", M_id_inv, M_all)
    return Cameras(
        R=M_rel[:, :3, :3],
        T=M_rel[:, 3, :3],
        focal_length=cameras.focal_length,
        principal_point=cameras.principal_point,
        image_size=cameras.image_size,
    )


# ---------------------------------------------------------------------------
# look_at (PyTorch3D cameras.look_at_view_transform semantics)
# ---------------------------------------------------------------------------

def look_at_rotation(eye: jnp.ndarray, at: jnp.ndarray,
                     up: jnp.ndarray) -> jnp.ndarray:
    """Rotation for a camera at ``eye`` looking at ``at`` with up-vector ``up``.

    Matches pytorch3d.renderer.cameras.look_at_rotation, including the
    degenerate case where ``up`` is (anti)parallel to the view direction.
    All inputs broadcast to (N, 3); returns (N, 3, 3).
    """
    eye, at, up = jnp.broadcast_arrays(
        jnp.atleast_2d(eye), jnp.atleast_2d(at), jnp.atleast_2d(up))

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-5)

    z_axis = _norm(at - eye)
    x_axis = _norm(jnp.cross(up, z_axis))
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    # handle degenerate up || z: PyTorch3D's fallback (cross(y, z)) is itself
    # degenerate when up is exactly parallel, so fall back to an arbitrary
    # axis orthogonal to z instead.
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    arbitrary = jnp.where(
        jnp.abs(z_axis[..., :1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), z_axis.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), z_axis.shape))
    replacement = _norm(jnp.cross(z_axis, arbitrary))
    x_axis = jnp.where(is_close, replacement, x_axis)
    y_axis = jnp.where(is_close, _norm(jnp.cross(z_axis, x_axis)), y_axis)
    R = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # rows = axes
    return jnp.swapaxes(R, 1, 2)


def look_at_view_transform(eye: jnp.ndarray, at: jnp.ndarray,
                           up: jnp.ndarray):
    """(R, T) such that x_view = x_world @ R + T puts ``eye`` at the origin."""
    R = look_at_rotation(eye, at, up)
    eye2 = jnp.broadcast_to(jnp.atleast_2d(eye), (R.shape[0], 3))
    T = -jnp.einsum("ni,nij->nj", eye2, R)
    return R, T
