"""Dense rectified-stereo ZNCC disparity with subpixel refinement + uncertainty.

Capability parity with the reference's legacy MATLAB prototypes
(legacy/matlab/stereoDisparityStatic.m / stereoDisparityTemporal.m): ZNCC
patch matching along the epipolar row, multi-peak rejection, parabolic
subpixel refinement, and inverse-depth standard deviation output — the
companion measurement model of the depth filter (SURVEY.md §2 'DepthFilter').

TPU-first: the cost volume is D shifted whole-image ZNCC evaluations built
from box-filtered moment images (each disparity = a few fused elementwise
maps + separable box filters) — no per-pixel loops anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pyramid import box_filter


class DisparityResult(NamedTuple):
    disparity: jax.Array  # [H, W] float32 subpixel disparity (px)
    valid: jax.Array  # [H, W] bool
    zncc: jax.Array  # [H, W] best-peak ZNCC score
    inv_depth_std: jax.Array  # [H, W] sigma of inverse depth (needs fx*b)


@partial(jax.jit, static_argnames=("max_disp", "radius"))
def zncc_disparity(
    left: jax.Array,
    right: jax.Array,
    max_disp: int = 64,
    radius: int = 4,
    min_zncc: float = 0.8,
    peak_margin: float = 0.05,
    fxb: float = 386.0,  # fx * baseline, for the inverse-depth sigma output
    px_noise: float = 0.5,
):
    """Dense disparity left->right. Returns DisparityResult.

    Multi-peak rejection: the best ZNCC must beat every score at least 2 px
    away by `peak_margin` (the MATLAB prototype's distinct-peak rule).
    """
    H, W = left.shape
    D = max_disp

    mu_l = box_filter(left, radius)
    var_l = box_filter(left * left, radius) - mu_l * mu_l

    mu_r = box_filter(right, radius)
    var_r = box_filter(right * right, radius) - mu_r * mu_r

    def score_at(d):
        right_s = jnp.roll(right, d, axis=1)  # right pixel (u - d) under left u
        mu_rs = jnp.roll(mu_r, d, axis=1)
        var_rs = jnp.roll(var_r, d, axis=1)
        cross = box_filter(left * right_s, radius) - mu_l * mu_rs
        denom = jnp.sqrt(jnp.maximum(var_l * var_rs, 1e-6))
        s = cross / denom
        # Columns that wrapped around are invalid.
        uu = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        return jnp.where(uu >= d, s, -1.0)

    scores = jnp.stack([score_at(d) for d in range(D)], axis=0)  # [D, H, W]

    best = jnp.argmax(scores, axis=0)  # [H, W]
    best_s = jnp.max(scores, axis=0)

    # Multi-peak rejection: suppress a +-2 disparity band around the winner,
    # then require the remaining maximum to be lower by peak_margin.
    dd = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0)
    near = jnp.abs(dd - best[None]) <= 2
    second_s = jnp.max(jnp.where(near, -1.0, scores), axis=0)
    distinct = best_s > second_s + peak_margin

    # Parabolic subpixel refinement around the integer winner.
    def gather_d(offset):
        idx = jnp.clip(best + offset, 0, D - 1)
        return jnp.take_along_axis(scores, idx[None], axis=0)[0]

    s_m = gather_d(-1)
    s_0 = best_s
    s_p = gather_d(1)
    denom = jnp.maximum(s_m - 2.0 * s_0 + s_p, 1e-9)
    delta = jnp.clip(0.5 * (s_m - s_p) / -denom, -0.5, 0.5)
    disp = best.astype(jnp.float32) + jnp.where((best > 0) & (best < D - 1), delta, 0.0)

    valid = (
        distinct
        & (best_s > min_zncc)
        & (best > 0)
        & (best < D - 1)
        & (var_l > 25.0)  # textureless-left rejection
    )
    disp = jnp.where(valid, disp, 0.0)

    # Inverse-depth sigma: rho = d / (fx b); sigma_rho = px_noise / (fx b).
    sigma_rho = jnp.full((H, W), px_noise / fxb, jnp.float32)
    return DisparityResult(disp, valid, best_s, jnp.where(valid, sigma_rho, jnp.inf))


def disparity_to_depth(res: DisparityResult, fxb: float):
    z = fxb / jnp.maximum(res.disparity, 1e-3)
    return jnp.where(res.valid, z, 0.0)
