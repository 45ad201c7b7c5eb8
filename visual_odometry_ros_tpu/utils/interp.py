"""Bilinear image sampling with validity masks — batched, gather-based.

Capability parity with the reference `image_processing::` namespace
(core/util/image_processing.{h,cpp}: interpImage at image_processing.cpp:28-77,
interpImageSameRatio at :79-118, interpImage3/interpImage3SameRatio, calcZNCC),
re-expressed as one vectorized gather + fused lerp over a whole batch of sample
points instead of a per-point scalar loop. The shared-subpixel-ratio variants
(the KLT inner primitive) become a special case: pass an integer grid plus one
fractional offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, pts: jax.Array, valid_border: float = 0.0):
    """Sample `img` ([H, W]) at `pts` ([..., 2], (u, v) = (x, y) pixel coords).

    Returns (values [...,], mask [...]) — mask is False where the 2x2 support
    leaves the image (reference semantics: mask-false samples return garbage in
    the C++ too; callers gate on the mask).
    """
    H, W = img.shape[-2], img.shape[-1]
    u = pts[..., 0]
    v = pts[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    iu0 = u0.astype(jnp.int32)
    iv0 = v0.astype(jnp.int32)

    mask = (
        (u >= valid_border)
        & (v >= valid_border)
        & (u <= W - 1 - valid_border)
        & (v <= H - 1 - valid_border)
    )

    iu0c = jnp.clip(iu0, 0, W - 2)
    iv0c = jnp.clip(iv0, 0, H - 2)

    I00 = img[iv0c, iu0c]
    I01 = img[iv0c, iu0c + 1]
    I10 = img[iv0c + 1, iu0c]
    I11 = img[iv0c + 1, iu0c + 1]

    top = I00 + du * (I01 - I00)
    bot = I10 + du * (I11 - I10)
    val = top + dv * (bot - top)
    return val, mask


def bilinear_sample_stack(imgs: jax.Array, pts: jax.Array, valid_border: float = 0.0):
    """Sample C images sharing one coordinate set (interpImage3 analog).

    imgs: [C, H, W]; pts: [..., 2] -> values [C, ...], mask [...].
    One gather of index arithmetic shared across channels.
    """
    vals, masks = jax.vmap(lambda im: bilinear_sample(im, pts, valid_border))(imgs)
    return vals, masks[0]


def sample_patches(img: jax.Array, centers: jax.Array, offsets: jax.Array):
    """Gather P-point patches around N centers with a shared offset pattern.

    img: [H, W]; centers: [N, 2]; offsets: [P, 2] (e.g. the reference's shared
    checkerboard patch, landmark.h:65-86). Returns (patches [N, P], mask [N, P]).
    The sub-pixel ratio is shared per center — the interpImageSameRatio trick
    (image_processing.cpp:79-118) falls out automatically because centers'
    fractional parts broadcast over the integer offset grid.
    """
    pts = centers[:, None, :] + offsets[None, :, :]
    return bilinear_sample(img, pts)


def zncc(a: jax.Array, b: jax.Array, axis: int = -1, eps: float = 1e-6) -> jax.Array:
    """Zero-mean normalized cross-correlation along `axis` (calcZNCC analog)."""
    am = a - jnp.mean(a, axis=axis, keepdims=True)
    bm = b - jnp.mean(b, axis=axis, keepdims=True)
    num = jnp.sum(am * bm, axis=axis)
    den = jnp.sqrt(jnp.sum(am * am, axis=axis) * jnp.sum(bm * bm, axis=axis) + eps)
    return num / den
