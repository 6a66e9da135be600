"""Image sampling / resizing ops with exact torch semantics.

The reference leans on three torch ops whose coordinate conventions are
easy to get subtly wrong; each is re-implemented here for NHWC layout
(TPU-native) and parity-tested against torch CPU in
``tests/test_image_ops.py``:

* ``F.grid_sample(..., align_corners=True, padding_mode='border')`` —
  epipolar feature lookup (``sparsefusion/eft.py:251-296``),
* ``F.interpolate(mode='bilinear')`` with both align_corners settings —
  EFT latent pyramid (``eft.py:197-202``) and render upsampling
  (``distillation.py:119``),
* ``F.interpolate(mode='nearest')`` — imagen ``resize_image_to``
  (``imagen_pytorch.py:151-166``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(image: jnp.ndarray, coords: jnp.ndarray,
                         align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sampling with border padding.

    Args:
        image: (B, H, W, C).
        coords: (B, N, 2) in [-1, 1], last dim (x, y): x indexes width.

    Returns:
        (B, N, C) sampled values.
    """
    b, h, w, c = image.shape
    x, y = coords[..., 0], coords[..., 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (w - 1)
        iy = (y + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) * 0.5
        iy = ((y + 1.0) * h - 1.0) * 0.5
    # border padding: clamp the *coordinates*
    ix = jnp.clip(ix, 0.0, w - 1)
    iy = jnp.clip(iy, 0.0, h - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)

    def gather(iy_, ix_):
        # (B, N, C) gather per batch
        return jax.vmap(lambda img, yy, xx: img[yy, xx])(image, iy_, ix_)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _source_coords(out_size: int, in_size: int, align_corners: bool):
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    return jnp.clip((i + 0.5) * scale - 0.5, 0.0, in_size - 1)


def resize_bilinear(image: jnp.ndarray, out_hw, align_corners: bool = False
                    ) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') for NHWC images."""
    b, h, w, c = image.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return image
    sy = _source_coords(oh, h, align_corners)
    sx = _source_coords(ow, w, align_corners)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[None, :, None, None]
    fx = (sx - x0)[None, None, :, None]
    top = image[:, y0][:, :, x0] * (1 - fx) + image[:, y0][:, :, x1] * fx
    bot = image[:, y1][:, :, x0] * (1 - fx) + image[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def resize_nearest(image: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out)."""
    b, h, w, c = image.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return image
    ys = jnp.minimum((jnp.arange(oh) * h // oh), h - 1)
    xs = jnp.minimum((jnp.arange(ow) * w // ow), w - 1)
    return image[:, ys][:, :, xs]
