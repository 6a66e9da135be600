"""PLMS / PNDM fast sampler as a fixed-shape ``lax.scan``.

Re-design of the reference's ``PLMSSampler`` (``external/plms.py:13-214``)
for XLA: the Python list of previous epsilons becomes a carried (3, ...)
ring buffer, the Adams-Bashforth order selection becomes ``lax.switch``,
and the *variable* step count (n_steps = min(int(max_thres * 100), 50),
``plms.py:87``) becomes a fixed 50-iteration scan with per-step
``lax.cond`` masking — so one compiled executable serves every randomly
drawn ``max_thres`` in the distillation loop with no retraces.

Semantics preserved from the reference:
  * step 0 runs a pseudo improved-Euler bootstrap (3 UNet evals),
  * steps 1 / 2 use 2nd / 3rd-order AB, steps >= 3 use AB4,
  * each x_prev adds posterior noise except when t_next == 0,
  * ``max_thres >= 0.99`` starts from the raw input as "noise" over the
    full schedule; otherwise the input is q_sampled to max_thres.
"""
from __future__ import annotations

import dataclasses
import weakref
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sparsefusion_tpu.diffusion.ddpm import DDPM, clip_x_start
from sparsefusion_tpu.diffusion.schedule import right_pad_dims_to


def _x_prev_from_eps(ddpm: DDPM, rng, x, t, t_next, eps):
    """x_start from eps -> clip -> q_posterior -> noisy step.

    Mirrors the tail of ``get_model_output`` (``plms.py:182-213``).
    """
    sched = ddpm.schedule
    x_start = sched.predict_start_from_noise(x, t, eps)
    x_start = clip_x_start(x_start, ddpm.config)
    mean, _, log_var = sched.q_posterior(x_start, x, t, t_next)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    is_last = (t_next == 0).astype(x.dtype)
    nonzero = right_pad_dims_to(x, 1.0 - is_last)
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise, x_start


def plms_sample(
    ddpm: DDPM,
    denoise_fn: Callable,
    rng: jax.Array,
    image: jnp.ndarray,
    max_thres: jnp.ndarray,
    cond_images: Optional[jnp.ndarray] = None,
    cond_scale: float = 1.0,
    plms_steps: int = 50,
):
    """Partial-noise PLMS sampling used by the fusion loss.

    Args:
        image: (B, H, W, C) clean latents to start from.
        max_thres: scalar in [0, 0.99] (traced OK) — noise level to start at.

    Returns:
        (img, x_noisy, noise, alpha_cumprod) matching ``plms.py:114-119``.
    """
    cfg = ddpm.config
    sched = ddpm.schedule
    batch = image.shape[0]
    max_thres = jnp.asarray(max_thres, jnp.float32)

    full_start = max_thres >= 0.99
    n_steps = jnp.where(
        full_start, plms_steps,
        jnp.minimum((max_thres * plms_steps * 2).astype(jnp.int32),
                    plms_steps))
    denom = jnp.maximum(n_steps, 1).astype(jnp.float32)

    # t_i = start * (n - i) / n for i <= n else 0; start = 1.0 for full_start
    start_t = jnp.where(full_start, 1.0, max_thres)
    i_idx = jnp.arange(plms_steps + 1, dtype=jnp.float32)
    times_all = start_t * jnp.clip(denom - i_idx, min=0.0) / denom
    t_pairs = jnp.stack([times_all[:-1], times_all[1:]], axis=1)  # (S, 2)

    k_init, k_loop = jax.random.split(rng)
    init_noise = jax.random.normal(k_init, image.shape, image.dtype)
    x_noisy, log_snr = sched.q_sample(image, max_thres, init_noise)
    img0 = jnp.where(full_start, image, x_noisy)

    def eval_eps(x, t):
        return ddpm.forward_with_cond_scale(
            denoise_fn, x, sched.get_condition(jnp.full((batch,), t)),
            cond_images, cond_scale)

    def tfull(t):
        return jnp.full((batch,), t)

    # ---- step 0: pseudo improved Euler (plms.py:137-143) -----------------
    def step0(img, key, t, t_next):
        k1, k2, k3 = jax.random.split(key, 3)
        e_t = eval_eps(img, t)
        x_prev1, _ = _x_prev_from_eps(ddpm, k1, img, tfull(t), tfull(t_next),
                                      e_t)
        e_t_next = eval_eps(x_prev1, t_next)
        e_prime = (e_t + e_t_next) / 2
        x_prev, _ = _x_prev_from_eps(ddpm, k2, img, tfull(t), tfull(t_next),
                                     e_prime)
        return x_prev, e_t

    def run_step0(carry):
        img, key = carry
        key, sub = jax.random.split(key)
        t, t_next = t_pairs[0, 0], t_pairs[0, 1]
        x_prev, e_t = step0(img, sub, t, t_next)
        hist = jnp.stack([e_t, jnp.zeros_like(e_t), jnp.zeros_like(e_t)])
        return x_prev, hist, jnp.int32(1), key

    def skip_step0(carry):
        img, key = carry
        z = jnp.zeros_like(img)
        return img, jnp.stack([z, z, z]), jnp.int32(0), key

    img1, hist, count, key = jax.lax.cond(
        n_steps > 0, run_step0, skip_step0, (img0, k_loop))

    # ---- steps 1..S-1: Adams-Bashforth multistep --------------------------
    def ab_combine(order_idx, e_t, hist):
        # hist[0] = most recent, hist[1] older, hist[2] oldest
        def ab2(_):
            return (3 * e_t - hist[0]) / 2
        def ab3(_):
            return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12
        def ab4(_):
            return (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24
        return jax.lax.switch(order_idx, [ab2, ab3, ab4], None)

    def body(carry, inp):
        img, hist, count, key = carry
        i, t, t_next = inp

        def do(_):
            k1, key2 = jax.random.split(key)
            e_t = eval_eps(img, t)
            e_prime = ab_combine(jnp.minimum(count, 3) - 1, e_t, hist)
            x_prev, _ = _x_prev_from_eps(
                ddpm, k1, img, tfull(t), tfull(t_next), e_prime)
            new_hist = jnp.stack([e_t, hist[0], hist[1]])
            return x_prev, new_hist, jnp.minimum(count + 1, 4), key2

        def skip(_):
            return img, hist, count, key

        return jax.lax.cond(i < n_steps, do, skip, None), None

    idxs = jnp.arange(1, plms_steps, dtype=jnp.int32)
    inps = (idxs, t_pairs[1:, 0], t_pairs[1:, 1])
    (img, _, _, _), _ = jax.lax.scan(body, (img1, hist, count, key), inps)

    if cfg.clip_output:
        img = jnp.clip(img, -cfg.clip_value, cfg.clip_value)
    alpha_cumprod = jax.nn.sigmoid(log_snr)
    return img, x_noisy, init_noise, alpha_cumprod


_XPREV_JIT_CACHE: dict = {}


def _xprev_jit(ddpm: DDPM):
    key = ddpm.config
    if key not in _XPREV_JIT_CACHE:
        _XPREV_JIT_CACHE[key] = jax.jit(
            lambda rng, x, t, t_next, eps:
            _x_prev_from_eps(ddpm, rng, x, t, t_next, eps)[0])
    return _XPREV_JIT_CACHE[key]


_EVAL_EPS_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _eval_eps_jit(ddpm: DDPM, denoise_fn: Callable, cond_scale: float,
                  batch: int, with_params: bool = False):
    """One jitted CFG epsilon evaluation for the host loop.

    Fuses get_condition + two denoiser applies + the cond-scale combine
    into a single dispatch (t is a traced weak-typed scalar, so every
    sampler step hits the same executable).  Keyed weakly on
    ``denoise_fn`` so a freed closure cannot alias a recycled ``id``.

    ``with_params=True``: ``denoise_fn(params, x, log_snr, cond, keep)``
    and the jitted program takes params as its leading ARGUMENT — a
    closed-over full-size UNet would be embedded in the HLO as ~GBs of
    literal constants, which a remote-compile relay cannot ingest.
    """
    per_fn = _EVAL_EPS_JIT_CACHE.setdefault(denoise_fn, {})
    key = (ddpm.config, float(cond_scale), batch, with_params)
    if key not in per_fn:
        sched = ddpm.schedule

        if with_params:

            @jax.jit
            def f(params, x, t, cond_images):
                cond = sched.get_condition(jnp.full((batch,), t))
                dn = lambda *a: denoise_fn(params, *a)
                return ddpm.forward_with_cond_scale(dn, x, cond,
                                                    cond_images, cond_scale)
        else:

            @jax.jit
            def f(x, t, cond_images):
                cond = sched.get_condition(jnp.full((batch,), t))
                return ddpm.forward_with_cond_scale(denoise_fn, x, cond,
                                                    cond_images, cond_scale)

        per_fn[key] = f
    return per_fn[key]


_SCAN_TAIL_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _scan_tail_jit(ddpm: DDPM, denoise_fn: Callable, cond_scale: float,
                   batch: int, plms_steps: int, with_params: bool = False):
    """Steps 1..plms_steps-1 as ONE jitted masked ``lax.scan``.

    The scan body holds a single CFG epsilon eval (2 UNet applies) + the
    AB combine — the same compile footprint as ``_eval_eps_jit`` — but
    replaces ~2 dispatches x ~49 steps with one dispatch per fusion
    iteration.  Bit-parity with :func:`plms_sample`'s scan: identical
    body code and key chain (asserted in tests/test_plms_host.py).
    ``with_params`` as in :func:`_eval_eps_jit`.
    """
    per_fn = _SCAN_TAIL_JIT_CACHE.setdefault(denoise_fn, {})
    key = (ddpm.config, float(cond_scale), batch, plms_steps, with_params)
    if key not in per_fn:
        sched = ddpm.schedule

        def tail(dn_fn, carry_key, img1, hist, count, n_steps, t_pairs,
                 cond_images):
            def eval_eps(x, t):
                return ddpm.forward_with_cond_scale(
                    dn_fn, x, sched.get_condition(jnp.full((batch,), t)),
                    cond_images, cond_scale)

            def tfull(t):
                return jnp.full((batch,), t)

            def ab_combine(order_idx, e_t, hist):
                def ab2(_):
                    return (3 * e_t - hist[0]) / 2

                def ab3(_):
                    return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12

                def ab4(_):
                    return (55 * e_t - 59 * hist[0] + 37 * hist[1]
                            - 9 * hist[2]) / 24

                return jax.lax.switch(order_idx, [ab2, ab3, ab4], None)

            def body(carry, inp):
                img, hist, count, k = carry
                i, t, t_next = inp

                def do(_):
                    k1, k2 = jax.random.split(k)
                    e_t = eval_eps(img, t)
                    e_prime = ab_combine(jnp.minimum(count, 3) - 1, e_t,
                                         hist)
                    x_prev, _ = _x_prev_from_eps(
                        ddpm, k1, img, tfull(t), tfull(t_next), e_prime)
                    new_hist = jnp.stack([e_t, hist[0], hist[1]])
                    return x_prev, new_hist, jnp.minimum(count + 1, 4), k2

                def skip(_):
                    return img, hist, count, k

                return jax.lax.cond(i < n_steps, do, skip, None), None

            idxs = jnp.arange(1, plms_steps, dtype=jnp.int32)
            inps = (idxs, t_pairs[1:, 0], t_pairs[1:, 1])
            (img, _, _, _), _ = jax.lax.scan(
                body, (img1, hist, count, carry_key), inps)
            return img

        if with_params:

            @jax.jit
            def f(params, carry_key, img1, hist, count, n_steps, t_pairs,
                  cond_images):
                return tail(lambda *a: denoise_fn(params, *a), carry_key,
                            img1, hist, count, n_steps, t_pairs,
                            cond_images)
        else:
            f = jax.jit(lambda *a: tail(denoise_fn, *a))

        per_fn[key] = f
    return per_fn[key]


_STEP0_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _step0_jit(ddpm: DDPM, denoise_fn: Callable, cond_scale: float,
               batch: int, with_params: bool = False):
    """The pseudo improved-Euler bootstrap (plms.py:137-143) as ONE
    jitted program (2 CFG evals + 2 x_prev) — replaces ~9 host
    dispatches.  Key chain identical to the eager pieces (asserted via
    the scan_tail parity test)."""
    per_fn = _STEP0_JIT_CACHE.setdefault(denoise_fn, {})
    key = (ddpm.config, float(cond_scale), batch, with_params)
    if key not in per_fn:
        sched = ddpm.schedule

        def step0(dn_fn, key_in, img, t, t_next, cond_images):
            def eval_eps(x, tv):
                return ddpm.forward_with_cond_scale(
                    dn_fn, x, sched.get_condition(jnp.full((batch,), tv)),
                    cond_images, cond_scale)

            def tfull(tv):
                return jnp.full((batch,), tv)

            key_out, sub = jax.random.split(key_in)
            k1, k2, k3 = jax.random.split(sub, 3)
            e_t = eval_eps(img, t)
            x_prev1, _ = _x_prev_from_eps(ddpm, k1, img, tfull(t),
                                          tfull(t_next), e_t)
            e_t_next = eval_eps(x_prev1, t_next)
            e_prime = (e_t + e_t_next) / 2
            x_prev, _ = _x_prev_from_eps(ddpm, k2, img, tfull(t),
                                         tfull(t_next), e_prime)
            z = jnp.zeros_like(e_t)
            return x_prev, jnp.stack([e_t, z, z]), key_out

        if with_params:

            @jax.jit
            def f(params, key_in, img, t, t_next, cond_images):
                return step0(lambda *a: denoise_fn(params, *a), key_in,
                             img, t, t_next, cond_images)
        else:
            f = jax.jit(lambda *a: step0(denoise_fn, *a))

        per_fn[key] = f
    return per_fn[key]


_COMBINE_JIT_CACHE: dict = {}


def _combine_step_jit(ddpm: DDPM, batch: int):
    """One jitted AB-combine + x_prev step for the host loop (steps >= 1).

    lax.switch on the AB order keeps it a single program for all steps —
    the host loop otherwise dispatches ~15 small eager ops per sampler
    step, which through a remote-dispatch relay dominates the UNet eval.
    The per-step key split lives inside (same chain as the scan body, so
    bit-parity with :func:`plms_sample` is preserved); t/t_next are
    traced weak-typed scalars, so one executable serves every step.
    """
    key = (ddpm.config, batch)
    if key not in _COMBINE_JIT_CACHE:

        @jax.jit
        def f(rng, x, t, t_next, e_t, hist, count):
            def ab2(_):
                return (3 * e_t - hist[0]) / 2

            def ab3(_):
                return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12

            def ab4(_):
                return (55 * e_t - 59 * hist[0] + 37 * hist[1]
                        - 9 * hist[2]) / 24

            k1, rng_next = jax.random.split(rng)
            e_prime = jax.lax.switch(jnp.minimum(count, 3) - 1,
                                     [ab2, ab3, ab4], None)
            tf = jnp.full((batch,), t)
            tnf = jnp.full((batch,), t_next)
            x_prev, _ = _x_prev_from_eps(ddpm, k1, x, tf, tnf, e_prime)
            new_hist = jnp.stack([e_t, hist[0], hist[1]])
            return x_prev, new_hist, jnp.minimum(count + 1, 4), rng_next

        _COMBINE_JIT_CACHE[key] = f
    return _COMBINE_JIT_CACHE[key]


def host_schedule(max_thres: float, plms_steps: int):
    """The host-known part of the partial-denoise schedule.

    Mirrors ``external/plms.py:81-93``: a fresh short cosine schedule from
    ``start_t`` with ``n_steps = min(int(max_thres * plms_steps * 2),
    plms_steps)`` steps (``plms.py:87``).  ``max_thres`` must be a host
    float (drawn on host per fusion iteration, ``distillation.py:303``).
    Returns ``(full_start, n_steps, times_all)`` with ``times_all`` of
    length ``plms_steps + 1``.
    """
    max_thres = float(max_thres)
    full_start = max_thres >= 0.99
    n_steps = plms_steps if full_start else min(
        int(max_thres * plms_steps * 2), plms_steps)
    denom = float(max(n_steps, 1))
    start_t = 1.0 if full_start else max_thres
    times_all = [start_t * max(denom - i, 0.0) / denom
                 for i in range(plms_steps + 1)]
    return full_start, n_steps, times_all


def plms_sample_host(
    ddpm: DDPM,
    denoise_fn: Callable,
    rng: jax.Array,
    image: jnp.ndarray,
    max_thres: float,
    cond_images: Optional[jnp.ndarray] = None,
    cond_scale: float = 1.0,
    plms_steps: int = 50,
    scan_tail: Optional[bool] = None,
    unet_params=None,
):
    """Host-driven PLMS: a Python loop over one small jitted x_prev
    program and per-step denoiser calls.

    With ``unet_params`` set, ``denoise_fn`` must take params as its
    leading argument (``models.unet_apply``) and the jitted programs
    receive them as arguments — never close a full-size UNet into a jit
    on a remote-compile backend (the params become HLO literals).

    Numerically identical to :func:`plms_sample` (same key-splitting
    structure; asserted in tests) but compiles only tiny programs — the
    scan version inlines 4 UNet bodies into one program, which the
    axon remote-compile relay cannot digest for the full-size model.
    ``max_thres`` must be a host float here (drawn on host per fusion
    iteration, mirroring ``distillation.py:303``).
    """
    cfg = ddpm.config
    sched = ddpm.schedule
    batch = image.shape[0]
    max_thres = float(max_thres)

    full_start, n_steps, times_all = host_schedule(max_thres, plms_steps)

    xprev = _xprev_jit(ddpm)
    with_params = unet_params is not None
    eps_fn = _eval_eps_jit(ddpm, denoise_fn, cond_scale, batch,
                           with_params=with_params)

    def tfull(t):
        return jnp.full((batch,), t)

    def eval_eps(x, t):
        if with_params:
            return eps_fn(unet_params, x, float(t), cond_images)
        return eps_fn(x, float(t), cond_images)

    k_init, key = jax.random.split(rng)
    init_noise = jax.random.normal(k_init, image.shape, image.dtype)
    x_noisy, log_snr = sched.q_sample(image, max_thres, init_noise)
    img = image if full_start else x_noisy

    if scan_tail is None:
        import os

        # "0"/"false"/"off" disable; any other non-empty value enables
        scan_tail = os.environ.get("SF_PLMS_SCAN_TAIL", "").lower() \
            not in ("", "0", "false", "off")

    combine = _combine_step_jit(ddpm, batch)
    hist = count = None
    if n_steps > 0:
        t, t_next = times_all[0], times_all[1]
        if scan_tail:
            # one dispatch for the whole improved-Euler bootstrap
            step0 = _step0_jit(ddpm, denoise_fn, cond_scale, batch,
                               with_params=with_params)
            s0args = (key, img, float(t), float(t_next), cond_images)
            img, hist, key = (step0(unet_params, *s0args) if with_params
                              else step0(*s0args))
        else:
            key, sub = jax.random.split(key)
            k1, k2, k3 = jax.random.split(sub, 3)
            e_t = eval_eps(img, t)
            x_prev1 = xprev(k1, img, tfull(t), tfull(t_next), e_t)
            e_t_next = eval_eps(x_prev1, t_next)
            e_prime = (e_t + e_t_next) / 2
            img = xprev(k2, img, tfull(t), tfull(t_next), e_prime)
            z = jnp.zeros_like(e_t)
            hist = jnp.stack([e_t, z, z])
        count = jnp.int32(1)

    if scan_tail and n_steps > 1:
        # one jitted masked scan for steps 1..S-1 (one dispatch instead
        # of ~2 x 49); body code identical to plms_sample's -> bit-parity
        tail = _scan_tail_jit(ddpm, denoise_fn, cond_scale, batch,
                              plms_steps, with_params=with_params)
        t_pairs = jnp.asarray(
            [[times_all[i], times_all[i + 1]]
             for i in range(plms_steps)], jnp.float32)
        targs = (key, img, hist, count, jnp.int32(n_steps), t_pairs,
                 cond_images)
        img = tail(unet_params, *targs) if with_params else tail(*targs)
    else:
        for i in range(1, plms_steps):
            if i >= n_steps:
                continue
            t, t_next = times_all[i], times_all[i + 1]
            e_t = eval_eps(img, t)
            # two dispatches per step: eps eval + AB-combine/x_prev (the
            # key split rides inside combine; device-scalar count — a
            # Python int would retrace per order)
            img, hist, count, key = combine(
                key, img, float(t), float(t_next), e_t, hist, count)

    if cfg.clip_output:
        img = jnp.clip(img, -cfg.clip_value, cfg.clip_value)
    return img, x_noisy, init_noise, jax.nn.sigmoid(log_snr)


@dataclasses.dataclass(frozen=True)
class PLMSSampler:
    """OO convenience mirroring ``external/plms.py:13`` call sites."""

    ddpm: DDPM
    plms_steps: int = 50

    def sample(self, denoise_fn, rng, image, max_thres, cond_images=None,
               cond_scale: float = 1.0, return_noise: bool = False):
        out = plms_sample(self.ddpm, denoise_fn, rng, image, max_thres,
                          cond_images, cond_scale, self.plms_steps)
        img, x_noisy, noise, alpha_cumprod = out
        if not return_noise:
            return img
        return img, x_noisy, noise, alpha_cumprod
