"""Tests for camera-path fitting (circle fit, nearest centroid, orbits)."""
import math

import numpy as np

from sparsefusion_tpu.core import paths
from sparsefusion_tpu.core.cameras import Cameras, camera_centers, look_at_view_transform


def make_orbit_cameras(n=10, radius=3.0, height=1.0, jitter=0.0, rng=None):
    """Cameras on a circle in the y=height plane, looking at the origin."""
    rng = rng or np.random.RandomState(0)
    t = np.linspace(0, 2 * math.pi, n, endpoint=False)
    eye = np.stack([radius * np.cos(t), np.full(n, height),
                    radius * np.sin(t)], axis=1).astype(np.float32)
    if jitter:
        eye += rng.randn(n, 3).astype(np.float32) * jitter
    at = np.zeros((1, 3), np.float32)
    up = np.array([[0, 1, 0]], np.float32)
    R, T = look_at_view_transform(eye, at, up)
    return Cameras.create(R, T, np.full((n, 2), 2.0), np.zeros((n, 2)),
                          np.full((n, 2), 256.0)), eye


def test_fit_circle_2d():
    t = np.linspace(0, 2 * math.pi, 50)
    x = 1.5 + 2.0 * np.cos(t)
    y = -0.5 + 2.0 * np.sin(t)
    xc, yc, r = paths.fit_circle_2d(x, y)
    np.testing.assert_allclose([xc, yc, r], [1.5, -0.5, 2.0], atol=1e-5)


def test_rodrigues_rot():
    P = np.array([[1.0, 0.0, 0.0]])
    out = paths.rodrigues_rot(P, np.array([0.0, 0.0, 1.0]),
                              np.array([0.0, 1.0, 0.0]))
    # rotating frame z->y maps x->x
    np.testing.assert_allclose(out, [[1, 0, 0]], atol=1e-6)
    out2 = paths.rodrigues_rot(np.array([[0.0, 0.0, 1.0]]),
                               np.array([0.0, 0.0, 1.0]),
                               np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(out2, [[0, 1, 0]], atol=1e-6)


def test_nearest_centroid_of_orbit_is_origin():
    cams, _ = make_orbit_cameras()
    centroid = paths.get_nearest_centroid(cams)
    np.testing.assert_allclose(centroid, np.zeros(3), atol=1e-3)


def test_interpolated_path_recovers_orbit():
    cams, eye = make_orbit_cameras()
    path = paths.get_interpolated_path(cams, n=20)
    centers = np.asarray(camera_centers(path))
    # new centers lie on the same circle: radius 3 around (0, 1, 0)
    d = np.linalg.norm(centers - np.array([0, 1.0, 0]), axis=1)
    np.testing.assert_allclose(d, np.full(20, 3.0), atol=1e-2)
    # and in the y=1 plane
    np.testing.assert_allclose(centers[:, 1], np.ones(20), atol=1e-2)
    # intrinsics inherited
    np.testing.assert_allclose(np.asarray(path.focal_length),
                               np.full((20, 2), 2.0))


def test_interpolated_path_with_jitter_stays_finite():
    cams, _ = make_orbit_cameras(jitter=0.05)
    path = paths.get_interpolated_path(cams, n=15, theta_offset_max=0.17,
                                       rng=np.random.RandomState(3))
    assert np.all(np.isfinite(np.asarray(path.R)))
    assert np.all(np.isfinite(np.asarray(path.T)))


def test_get_angles():
    cams, _ = make_orbit_cameras(n=4)  # cameras at 0/90/180/270 degrees
    target = Cameras.create(cams.R[:1], cams.T[:1], cams.focal_length[:1],
                            cams.principal_point[:1], cams.image_size[:1])
    ang = paths.get_angles(target, cams, np.array([0.0, 1.0, 0.0],
                                                  np.float32))
    np.testing.assert_allclose(ang, [0, 90, 180, 90], atol=0.5)
