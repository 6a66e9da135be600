"""Tests for the NGP volume renderer (near/far, sample_pdf, compositing)."""
import jax
import jax.numpy as jnp
import numpy as np

from sparsefusion_tpu.render.volume import (
    VolumeRendererConfig,
    near_far_from_aabb,
    render_rays,
    render_rays_chunked,
    sample_pdf,
)


def test_near_far_basic():
    o = jnp.array([[0.0, 0.0, -10.0], [0.0, 0.0, -10.0], [20.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    near, far = near_far_from_aabb(o, d, bound=4.0, min_near=0.1)
    # ray 0: enters z=-4 at t=6, exits z=4 at t=14
    np.testing.assert_allclose(near[0], 6.0, atol=1e-5)
    np.testing.assert_allclose(far[0], 14.0, atol=1e-5)
    # ray 1 misses (parallel, outside slab)
    assert float(near[1]) > 1e9
    # ray 2 points away: box is behind -> near clamps to min_near, far < 0
    # (matches raymarching.cu which only flags slab-disjoint rays as miss)
    np.testing.assert_allclose(near[2], 0.1, atol=1e-6)
    np.testing.assert_allclose(far[2], -16.0, atol=1e-5)
    assert float(near[2]) > float(far[2])  # -> mask False downstream


def test_near_far_min_near_clamp():
    o = jnp.array([[0.0, 0.0, 0.0]])  # inside the box
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, bound=4.0, min_near=0.1)
    np.testing.assert_allclose(near[0], 0.1, atol=1e-6)
    np.testing.assert_allclose(far[0], 4.0, atol=1e-5)


def test_sample_pdf_uniform_and_peaked():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    uniform_w = jnp.ones((2, 8))
    s = sample_pdf(bins, uniform_w, 16, det=True)
    assert s.shape == (2, 16)
    assert np.all(np.diff(np.asarray(s), axis=-1) > 0)  # monotonic
    np.testing.assert_allclose(np.asarray(s[0]).mean(), 0.5, atol=0.05)

    peaked_w = jnp.zeros((2, 8)).at[:, 3].set(100.0)
    s2 = sample_pdf(bins, peaked_w, 16, det=True)
    # nearly all mass in bin [3/8, 4/8]
    frac_in = np.mean((np.asarray(s2) >= 3 / 8) & (np.asarray(s2) <= 4 / 8))
    assert frac_in > 0.9


def test_sample_pdf_stochastic_in_range():
    bins = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 5), (4, 5))
    w = jnp.ones((4, 4))
    s = sample_pdf(bins, w, 8, det=False, rng=jax.random.PRNGKey(0))
    assert np.all(np.asarray(s) >= 1.0) and np.all(np.asarray(s) <= 3.0)


def constant_field(sigma_val, color):
    def fn(x):
        s = jnp.full(x.shape[:-1], sigma_val)
        c = jnp.broadcast_to(jnp.asarray(color), (*x.shape[:-1], 3))
        return s, c
    return fn


def make_rays(n=4):
    o = jnp.tile(jnp.array([[0.0, 0.0, -8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    return o, d


def test_render_opaque_hits_albedo():
    cfg = VolumeRendererConfig(num_steps=32, upsample_steps=32, bound=4.0)
    o, d = make_rays()
    out = render_rays(constant_field(50.0, [0.2, 0.5, 0.8]), o, d, cfg,
                      det_importance=True, bg_color=0.0)
    np.testing.assert_allclose(out["image"],
                               np.tile([[0.2, 0.5, 0.8]], (4, 1)), atol=1e-3)
    np.testing.assert_allclose(out["weights_sum"], np.ones(4), atol=1e-4)
    assert np.all(np.asarray(out["mask"]))


def test_render_empty_shows_background():
    cfg = VolumeRendererConfig(num_steps=16, upsample_steps=16, bound=4.0)
    o, d = make_rays()
    out = render_rays(constant_field(0.0, [1.0, 0.0, 0.0]), o, d, cfg,
                      det_importance=True, bg_color=0.25)
    np.testing.assert_allclose(out["image"], np.full((4, 3), 0.25), atol=1e-5)
    np.testing.assert_allclose(out["weights_sum"], np.zeros(4), atol=1e-6)


def test_render_transmittance_matches_analytic():
    sigma = 0.3
    cfg = VolumeRendererConfig(num_steps=256, upsample_steps=0, bound=4.0)
    o, d = make_rays(1)
    out = render_rays(constant_field(sigma, [1.0, 1.0, 1.0]), o, d, cfg,
                      det_importance=True)
    # segment length through the box = 8; opacity = 1 - exp(-sigma * 8)
    # (discretization adds one trailing sample_dist delta)
    seg = 8.0 + 8.0 / cfg.num_steps
    expected = 1 - np.exp(-sigma * seg)
    np.testing.assert_allclose(float(out["weights_sum"][0]), expected,
                               atol=0.01)


def test_render_gradients_flow():
    cfg = VolumeRendererConfig(num_steps=8, upsample_steps=8, bound=4.0)
    o, d = make_rays(2)

    def loss(log_sigma):
        def field(x):
            s = jnp.exp(log_sigma) * jnp.ones(x.shape[:-1])
            c = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]),
                                 (*x.shape[:-1], 3))
            return s, c
        out = render_rays(field, o, d, cfg, rng=jax.random.PRNGKey(0),
                          perturb=True, det_importance=False)
        return jnp.sum(out["image"])

    g = jax.grad(loss)(jnp.asarray(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_chunked_matches_unchunked():
    cfg = VolumeRendererConfig(num_steps=8, upsample_steps=8, bound=4.0,
                               max_ray_batch=4)
    o, d = make_rays(8)
    f = constant_field(1.0, [0.3, 0.6, 0.9])
    a = render_rays(f, o, d, cfg, det_importance=True)
    b = render_rays_chunked(f, o, d, cfg, det_importance=True)
    np.testing.assert_allclose(a["image"], b["image"], atol=1e-5)
    np.testing.assert_allclose(a["weights_sum"], b["weights_sum"], atol=1e-5)


def test_march_mode_opaque_hits_albedo():
    """Single-pass marching must agree with two-phase on simple fields."""
    cfg = VolumeRendererConfig(num_steps=0, upsample_steps=0, bound=4.0,
                               march_steps=64)
    o, d = make_rays()
    out = render_rays(constant_field(50.0, [0.2, 0.5, 0.8]), o, d, cfg,
                      det_importance=True, bg_color=0.0)
    np.testing.assert_allclose(out["image"],
                               np.tile([[0.2, 0.5, 0.8]], (4, 1)), atol=1e-3)
    np.testing.assert_allclose(out["weights_sum"], np.ones(4), atol=1e-4)


def test_march_mode_transmittance_matches_analytic():
    sigma = 0.3
    cfg = VolumeRendererConfig(bound=4.0, march_steps=256)
    o, d = make_rays(1)
    out = render_rays(constant_field(sigma, [1.0, 1.0, 1.0]), o, d, cfg,
                      det_importance=True)
    seg = 8.0 + 8.0 / cfg.march_steps
    expected = 1 - np.exp(-sigma * seg)
    np.testing.assert_allclose(float(out["weights_sum"][0]), expected,
                               atol=0.01)


def test_march_mode_respects_near_far_fn():
    """The march budget must land inside the tightened [near, far] span."""
    cfg = VolumeRendererConfig(bound=4.0, march_steps=32)
    o, d = make_rays(2)

    # density only in z within [1, 2] (world t in [9, 10] from o.z=-8)
    def field(x):
        s = jnp.where((x[..., 2] > 1.0) & (x[..., 2] < 2.0), 80.0, 0.0)
        c = jnp.broadcast_to(jnp.array([0.1, 0.9, 0.4]), (*x.shape[:-1], 3))
        return s, c

    def tighten(o_, d_, near, far):
        return jnp.full_like(near, 8.8), jnp.full_like(far, 10.2)

    loose = render_rays(field, o, d, cfg, det_importance=True)
    tight = render_rays(field, o, d, cfg, det_importance=True,
                        near_far_fn=tighten)
    # 32 samples over the [9,10] slab hit the 1-unit occupied span ~always;
    # over the full [4,12] span they straddle it more coarsely — the
    # tightened render must be at least as opaque and match the albedo
    assert float(tight["weights_sum"][0]) >= \
        float(loose["weights_sum"][0]) - 1e-5
    np.testing.assert_allclose(tight["image"][0],
                               [0.1, 0.9, 0.4], atol=2e-2)


def test_march_mode_gradients_flow():
    cfg = VolumeRendererConfig(bound=4.0, march_steps=16)
    o, d = make_rays(2)

    def loss(log_sigma):
        def field(x):
            s = jnp.exp(log_sigma) * jnp.ones(x.shape[:-1])
            c = jnp.broadcast_to(jnp.array([0.5, 0.5, 0.5]),
                                 (*x.shape[:-1], 3))
            return s, c
        out = render_rays(field, o, d, cfg, rng=jax.random.PRNGKey(0),
                          perturb=True, det_importance=False)
        return jnp.sum(out["image"])

    g = jax.grad(loss)(jnp.asarray(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_march_mode_chunked_matches_unchunked():
    cfg = VolumeRendererConfig(bound=4.0, march_steps=16, max_ray_batch=4)
    o, d = make_rays(8)
    f = constant_field(1.0, [0.3, 0.6, 0.9])
    a = render_rays(f, o, d, cfg, det_importance=True)
    b = render_rays_chunked(f, o, d, cfg, det_importance=True)
    np.testing.assert_allclose(a["image"], b["image"], atol=1e-5)
    np.testing.assert_allclose(a["weights_sum"], b["weights_sum"], atol=1e-5)


def test_light_field_render_shapes():
    from sparsefusion_tpu.render.lightfield import render_light_field
    from tests.test_cameras import random_cameras
    cams = random_cameras(np.random.RandomState(0), n=1)

    def mock_eft(o, d, l):
        n = o.shape[0]
        return jnp.ones((n, 3)) * 0.5, jnp.ones((n, 16))

    rgb, feat = render_light_field(mock_eft, cams, 8, 8, 1.0, 5.0,
                                   n_pts_per_ray=4, n_batches=4)
    assert rgb.shape == (1, 8, 8, 3)
    assert feat.shape == (1, 8, 8, 16)
