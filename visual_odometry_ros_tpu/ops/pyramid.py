"""Image pyramid + gradient kernels (jnp convs; XLA fuses these well).

Parity targets: OpenCV's buildOpticalFlowPyramid semantics used by the
reference FeatureTracker (core/visual_odometry/feature_tracker.cpp:13-37) and
the cv::Sobel du/dv feeding trackWithScale (stereo_vo.cpp:546-556). All shapes
static; levels is a Python int so each level is its own traced array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 5-tap binomial (Gaussian approx) used for pyramid antialiasing.
_K5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
# Scharr 3-tap pair: smoothing [3, 10, 3]/16 and central difference [-1, 0, 1]/2.
_SCHARR_S = jnp.array([3.0, 10.0, 3.0], jnp.float32) / 16.0
_SCHARR_D = jnp.array([-1.0, 0.0, 1.0], jnp.float32) * 0.5


def _sep_conv(img: jax.Array, kh: jax.Array, kw: jax.Array) -> jax.Array:
    """Separable 2D convolution with edge replication. img: [H, W]."""
    x = img[None, None, :, :]
    ph = kh.shape[0] // 2
    pw = kw.shape[0] // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, kh.reshape(1, 1, -1, 1), (1, 1), "VALID", preferred_element_type=jnp.float32
    )
    x = jax.lax.conv_general_dilated(
        x, kw.reshape(1, 1, 1, -1), (1, 1), "VALID", preferred_element_type=jnp.float32
    )
    return x[0, 0]


def gaussian_blur5(img: jax.Array) -> jax.Array:
    return _sep_conv(img, _K5, _K5)


def downsample2(img: jax.Array) -> jax.Array:
    """Blur + stride-2 decimation (one pyramid step)."""
    return gaussian_blur5(img)[::2, ::2]


def build_pyramid(img: jax.Array, levels: int) -> tuple[jax.Array, ...]:
    """Returns `levels` images, level 0 = full resolution."""
    out = [img.astype(jnp.float32)]
    for _ in range(levels - 1):
        out.append(downsample2(out[-1]))
    return tuple(out)


def scharr_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(d/du, d/dv) image gradients in intensity/pixel units."""
    gx = _sep_conv(img, _SCHARR_S, _SCHARR_D)
    gy = _sep_conv(img, _SCHARR_D, _SCHARR_S)
    return gx, gy


def build_pyramid_with_gradients(img: jax.Array, levels: int):
    """Pyramid plus per-level Scharr gradients: ((img, gx, gy), ...)."""
    pyr = build_pyramid(img, levels)
    return tuple((p, *scharr_gradients(p)) for p in pyr)


def box_filter(img: jax.Array, radius: int) -> jax.Array:
    k = jnp.ones((2 * radius + 1,), jnp.float32) / (2 * radius + 1)
    return _sep_conv(img, k, k)
