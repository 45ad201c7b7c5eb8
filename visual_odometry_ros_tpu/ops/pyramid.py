"""Image pyramid + gradient kernels (jnp convs; XLA fuses these well).

Parity targets: OpenCV's buildOpticalFlowPyramid semantics used by the
reference FeatureTracker (core/visual_odometry/feature_tracker.cpp:13-37) and
the cv::Sobel du/dv feeding trackWithScale (stereo_vo.cpp:546-556). All shapes
static; levels is a Python int so each level is its own traced array.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# 5-tap binomial (Gaussian approx) used for pyramid antialiasing.
_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
# Scharr 3-tap pair: smoothing [3, 10, 3]/16 and central difference [-1, 0, 1]/2.
_SCHARR_S = np.array([3.0, 10.0, 3.0], np.float32) / 16.0
_SCHARR_D = np.array([-1.0, 0.0, 1.0], np.float32) * 0.5


def _sep_conv(img: jax.Array, kh, kw) -> jax.Array:
    """Separable 2D convolution with edge replication. img: [H, W].

    Implemented as shift-and-FMA over statically sliced views: on TPU a
    single-channel spatial conv lowers poorly (channel padding to the MXU),
    while K shifted adds are pure VPU work that XLA fuses into ~one pass
    over the image. Taps are Python floats so zero taps drop at trace time.
    """
    H, W = img.shape
    kh = np.asarray(kh).tolist()
    kw = np.asarray(kw).tolist()
    ph = len(kh) // 2
    pw = len(kw) // 2
    x = jnp.pad(img, ((ph, ph), (0, 0)), mode="edge")
    acc = None
    for i, w in enumerate(kh):
        if w == 0.0:
            continue
        t = x[i : i + H, :] * w
        acc = t if acc is None else acc + t
    x = jnp.pad(acc, ((0, 0), (pw, pw)), mode="edge")
    acc = None
    for j, w in enumerate(kw):
        if w == 0.0:
            continue
        t = x[:, j : j + W] * w
        acc = t if acc is None else acc + t
    return acc


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
    k = np.ones((2 * radius + 1,), np.float32) / (2 * radius + 1)
    return _sep_conv(img, k, k)
