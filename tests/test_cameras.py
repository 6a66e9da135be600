"""First-principles invariants for the PyTorch3D-convention camera math."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparsefusion_tpu.core import cameras as cam
from sparsefusion_tpu.core import rays as raylib


def random_cameras(rng, n=4, image_size=(256, 256)):
    # random rotations via QR
    Rs = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Rs.append(q)
    R = np.stack(Rs).astype(np.float32)
    T = rng.randn(n, 3).astype(np.float32) * 0.5 + np.array([0, 0, 3], np.float32)
    f = rng.uniform(1.5, 3.5, (n, 2)).astype(np.float32)
    c = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    size = np.tile(np.array(image_size, np.float32), (n, 1))
    return cam.Cameras.create(R, T, f, c, size)


def test_world_view_roundtrip(rng):
    cs = random_cameras(rng)
    pts = rng.randn(10, 3).astype(np.float32)
    pv = cam.world_to_view(cs, jnp.asarray(pts))
    pw = cam.view_to_world(cs, pv)
    np.testing.assert_allclose(pw, np.broadcast_to(pts, pw.shape), atol=1e-5)


def test_camera_center_maps_to_origin(rng):
    cs = random_cameras(rng)
    centers = cam.camera_centers(cs)
    pv = jnp.einsum("ni,nij->nj", centers, cs.R) + cs.T
    np.testing.assert_allclose(pv, np.zeros_like(pv), atol=1e-5)


def test_project_unproject_roundtrip(rng):
    cs = random_cameras(rng)
    pts = rng.randn(1, 20, 3).astype(np.float32)
    pts = np.broadcast_to(pts, (4, 20, 3))
    ndc = cam.transform_points_ndc(cs, jnp.asarray(pts))
    depth = cam.world_to_view(cs, jnp.asarray(pts))[..., 2:3]
    xy_depth = jnp.concatenate([ndc[..., :2], depth], axis=-1)
    back = cam.unproject_ndc_points(cs, xy_depth)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_ndc_third_coord_is_inverse_depth(rng):
    cs = random_cameras(rng)
    pts = rng.randn(4, 7, 3).astype(np.float32)
    ndc = cam.transform_points_ndc(cs, jnp.asarray(pts))
    z = cam.world_to_view(cs, jnp.asarray(pts))[..., 2]
    np.testing.assert_allclose(ndc[..., 2], 1.0 / z, rtol=1e-4)


def test_optical_axis_projects_to_principal_point(rng):
    cs = random_cameras(rng)
    centers = cam.camera_centers(cs)
    # world point 2 units along each camera's +z view axis
    z_axis_world = cs.R[:, :, 2]  # row-vector: view z maps back via R^T rows
    pt = centers + 2.0 * z_axis_world
    ndc = cam.transform_points_ndc(cs, pt[:, None, :])
    # project with own camera: diag entries
    own = jnp.stack([ndc[i, 0] for i in range(4)])
    np.testing.assert_allclose(own[:, :2], cs.principal_point, atol=1e-4)


def test_look_at(rng):
    eye = rng.randn(5, 3).astype(np.float32) * 2
    at = rng.randn(5, 3).astype(np.float32) * 0.1
    up = np.tile(np.array([0, 1, 0], np.float32), (5, 1))
    R, T = cam.look_at_view_transform(eye, at, up)
    # orthonormal, det +1
    RtR = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-5)
    assert np.all(np.linalg.det(np.asarray(R)) > 0.99)
    # eye maps to origin
    pv = jnp.einsum("ni,nij->nj", jnp.asarray(eye), R) + T
    np.testing.assert_allclose(pv, np.zeros_like(pv), atol=1e-5)
    # at maps to +z axis
    pv_at = jnp.einsum("ni,nij->nj", jnp.asarray(at), R) + T
    np.testing.assert_allclose(pv_at[:, 0], np.zeros(5), atol=1e-5)
    np.testing.assert_allclose(pv_at[:, 1], np.zeros(5), atol=1e-5)
    assert np.all(np.asarray(pv_at[:, 2]) > 0)


def test_look_at_degenerate_up(rng):
    # up parallel to view direction must not produce NaNs
    eye = np.array([[0.0, 2.0, 0.0]], np.float32)
    at = np.zeros((1, 3), np.float32)
    up = np.array([[0.0, 1.0, 0.0]], np.float32)
    R, T = cam.look_at_view_transform(eye, at, up)
    assert np.all(np.isfinite(np.asarray(R)))
    RtR = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(RtR[0], np.eye(3), atol=1e-4)


def test_grid_rays_geometry(rng):
    cs = random_cameras(rng, n=2)
    bundle = raylib.grid_ray_bundle(cs, 8, 8, n_pts_per_ray=5,
                                    min_depth=1.0, max_depth=3.0)
    assert bundle.origins.shape == (2, 8, 8, 3)
    assert bundle.lengths.shape == (2, 8, 8, 5)
    # origins equal the camera centers
    centers = cam.camera_centers(cs)
    np.testing.assert_allclose(
        bundle.origins, np.broadcast_to(np.asarray(centers)[:, None, None, :],
                                        (2, 8, 8, 3)), atol=1e-4)
    # directions have unit z in view space
    dview = jnp.einsum("nhwi,nij->nhwj", bundle.directions, cs.R)
    np.testing.assert_allclose(dview[..., 2], np.ones((2, 8, 8)), atol=1e-4)
    # point at length t has view depth t
    pts = raylib.ray_points(bundle)  # (2,8,8,5,3)
    pts_flat = pts.reshape(2, -1, 3)
    pv = cam.world_to_view(cs, pts_flat)
    # world_to_view broadcast: only diagonal (camera i with its own points)
    z0 = jnp.einsum("hwpi,ij->hwpj", pts[0], cs.R[0]) + cs.T[0]
    np.testing.assert_allclose(
        z0[..., 2], np.broadcast_to(np.linspace(1, 3, 5), (8, 8, 5)), atol=1e-4)


def test_grid_rays_reproject_to_same_xy(rng):
    cs = random_cameras(rng, n=1)
    bundle = raylib.grid_ray_bundle(cs, 4, 4, n_pts_per_ray=3,
                                    min_depth=1.5, max_depth=2.5)
    pts = raylib.ray_points(bundle).reshape(1, -1, 3)
    ndc = cam.transform_points_ndc(cs, pts).reshape(1, 4, 4, 3, 3)
    xys = np.asarray(bundle.xys)
    for p in range(3):
        np.testing.assert_allclose(np.asarray(ndc[..., p, :2]), xys, atol=1e-4)


def test_grid_xy_ordering():
    # first pixel (top-left) must be (+x, +y) = (1-1/W, 1-1/H)
    xy = raylib.grid_xys(4, 8, 1 - 1 / 8, -1 + 1 / 8, 1 - 1 / 4, -1 + 1 / 4)
    assert xy.shape == (4, 8, 2)
    np.testing.assert_allclose(xy[0, 0], [1 - 1 / 8, 1 - 1 / 4], atol=1e-6)
    np.testing.assert_allclose(xy[-1, -1], [-1 + 1 / 8, -1 + 1 / 4], atol=1e-6)
    # x varies along width, y along height
    assert np.allclose(xy[0, :, 1], xy[0, 0, 1])
    assert np.allclose(xy[:, 0, 0], xy[0, 0, 0])


def test_relative_cameras_identity_query(rng):
    cs = random_cameras(rng)
    rel = cam.get_relative_cameras(cs, [1], center_at_origin=True)
    np.testing.assert_allclose(rel.R[1], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(rel.T[1], np.zeros(3), atol=1e-5)


def test_relative_cameras_preserve_pairwise_geometry(rng):
    cs = random_cameras(rng)
    rel = cam.get_relative_cameras(cs, [0], center_at_origin=True)
    # pairwise distances between camera centers are preserved
    c_orig = np.asarray(cam.camera_centers(cs))
    c_rel = np.asarray(cam.camera_centers(rel))
    d_orig = np.linalg.norm(c_orig[:, None] - c_orig[None], axis=-1)
    d_rel = np.linalg.norm(c_rel[:, None] - c_rel[None], axis=-1)
    np.testing.assert_allclose(d_rel, d_orig, atol=1e-4)
    # relative pose i->j (view-space offset of j's center in i) preserved
    for i in range(4):
        for j in range(4):
            vij_orig = c_orig[j] @ np.asarray(cs.R[i]) + np.asarray(cs.T[i])
            vij_rel = c_rel[j] @ np.asarray(rel.R[i]) + np.asarray(rel.T[i])
            np.testing.assert_allclose(vij_rel, vij_orig, atol=1e-4)


def test_relative_cameras_no_origin_keeps_centers_relationship(rng):
    cs = random_cameras(rng)
    rel = cam.get_relative_cameras(cs, [0], center_at_origin=False)
    # query camera keeps its translation magnitude (identity cam has T=0)
    np.testing.assert_allclose(rel.R[0], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(rel.T[0], cs.T[0], atol=1e-5)


def test_slice_and_concat(rng):
    cs = random_cameras(rng)
    sl = cam.get_camera_slice(cs, [2, 0])
    assert len(sl) == 2
    np.testing.assert_allclose(sl.R[0], cs.R[2])
    cc = cam.concat_cameras([sl, cs])
    assert len(cc) == 6


def test_harmonic_embedding():
    from sparsefusion_tpu.core.harmonics import HarmonicEmbedding
    he = HarmonicEmbedding(n_harmonic_functions=6, omega_0=1.0)
    x = jnp.array([[0.5, -0.3, 0.2]])
    out = he(x)
    assert out.shape == (1, he.get_output_dim(3))
    assert he.get_output_dim(3) == 3 * 13
    # first entries are sin(f_i * x_0)
    freqs = he.frequencies
    np.testing.assert_allclose(out[0, :6], np.sin(freqs * 0.5), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:12], np.sin(freqs * -0.3), atol=1e-6)
    # appended input at the end
    np.testing.assert_allclose(out[0, -3:], [0.5, -0.3, 0.2], atol=1e-6)
