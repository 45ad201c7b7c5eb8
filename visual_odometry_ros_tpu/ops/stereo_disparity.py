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
    ambiguous: jax.Array  # [H, W] bool — strong but NON-distinct peak
    # (repeated texture: the match is confidently multi-modal; distinct from
    # plain invalid = low texture / weak correlation, where the volume simply
    # has no opinion).


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

    textured = (best_s > min_zncc) & (var_l > 25.0)
    valid = distinct & textured & (best > 0) & (best < D - 1)
    # Ambiguous = the volume matched STRONGLY in more than one place (repeated
    # texture). This is positive evidence that any point match here aliases —
    # the consumer should veto landmark births. Low-texture / weak-correlation
    # pixels are merely invalid, not ambiguous: there the volume has no
    # opinion and point trackers may still succeed.
    ambiguous = textured & ~distinct
    disp = jnp.where(valid, disp, 0.0)

    # Inverse-depth sigma: rho = d / (fx b); sigma_rho = px_noise / (fx b).
    sigma_rho = jnp.full((H, W), px_noise / fxb, jnp.float32)
    return DisparityResult(
        disp, valid, best_s, jnp.where(valid, sigma_rho, jnp.inf), ambiguous
    )


def disparity_to_depth(res: DisparityResult, fxb: float):
    z = fxb / jnp.maximum(res.disparity, 1e-3)
    return jnp.where(res.valid, z, 0.0)


@partial(jax.jit, static_argnames=("radius", "span", "step"))
def verify_disparity_zncc(
    left: jax.Array,
    right: jax.Array,
    pts_l: jax.Array,
    disp: jax.Array,
    valid: jax.Array,
    radius: int = 4,
    span: int = 32,
    step: int = 1,
    min_zncc: float = 0.5,
    peak_margin: float = 0.03,
    agree_px: float = 1.5,
):
    """Full-resolution per-feature verification of a stereo KLT match.

    For each feature, ZNCC-scan the epipolar row in the right image over
    disparities `disp ± span` and test three things:
      1. the KLT match correlates (score at delta=0 > min_zncc);
      2. the in-window global best sits AT the KLT match (|delta*| <= agree_px);
      3. the profile is unimodal: no RIVAL LOCAL MAXIMUM more than 2 px from
         the best within peak_margin of its score.
    Smooth texture has a broad unimodal autocorrelation -> passes; repeated /
    self-similar texture (tiled facades, a corridor's vanishing region — the
    r4 birth-alias cluster at the horizon row, 18-46 px disparity errors) has
    multiple local maxima -> vetoed. This is the level-0 companion of the
    coarse cost volume's multi-peak rule (legacy/matlab/stereoDisparityStatic.m
    parity): the coarse map goes blind exactly where level-2 smoothing erases
    the texture; FAST features always have level-0 contrast, so a full-res
    hard gate cannot starve births the way the r3 coarse-level one did.

    Returns (ok [N] bool, best_score [N]).
    """
    n_d = 2 * span // step + 1
    deltas = jnp.arange(-span, span + step, step, dtype=jnp.float32)  # [D]
    dgrid = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    offs = jnp.stack(
        jnp.meshgrid(dgrid, dgrid, indexing="xy"), axis=-1
    ).reshape(-1, 2)  # [P, 2]

    from ..utils import interp

    patch_l, mask_l = interp.sample_patches(left, pts_l, offs)  # [N, P]
    # Right centers: [N, D, 2]
    ctr_r = jnp.stack(
        [
            pts_l[:, None, 0] - (disp[:, None] + deltas[None, :]),
            jnp.broadcast_to(pts_l[:, None, 1], (pts_l.shape[0], n_d)),
        ],
        axis=-1,
    )
    pts_r = ctr_r[:, :, None, :] + offs[None, None, :, :]  # [N, D, P, 2]
    patch_r, mask_r = interp.bilinear_sample(right, pts_r)
    scores = interp.zncc(patch_l[:, None, :], patch_r, axis=-1)  # [N, D]
    in_img = jnp.all(mask_r, axis=-1)  # [N, D]
    scores = jnp.where(in_img, scores, -1.0)

    i0 = span // step  # index of delta = 0 (the KLT match)
    s_at = scores[:, i0]
    best_i = jnp.argmax(scores, axis=-1)
    best_d = deltas[best_i]
    best_s = jnp.max(scores, axis=-1)

    # Rival local maxima: strictly above left neighbour, >= right neighbour,
    # farther than 2 px from the best, within peak_margin of the best score.
    left_n = jnp.concatenate([jnp.full_like(scores[:, :1], -2.0), scores[:, :-1]], axis=1)
    right_n = jnp.concatenate([scores[:, 1:], jnp.full_like(scores[:, :1], -2.0)], axis=1)
    is_peak = (scores > left_n) & (scores >= right_n)
    far = jnp.abs(deltas[None, :] - best_d[:, None]) > 2.0
    rival = jnp.any(is_peak & far & (scores > best_s[:, None] - peak_margin), axis=-1)

    ok = (
        valid
        & jnp.all(mask_l, axis=-1)
        & (s_at > min_zncc)
        & (jnp.abs(best_d) <= agree_px)
        & ~rival
    )
    return ok, s_at
