"""Recursive inverse-depth filtering (SVO/Vogiatzis-style), batched over seeds.

The reference ships an *incomplete* `DepthFilter`
(standalone/depth_filter/depth_filter.cpp): `updateNormalDistribution` (:3-13,
product of Gaussians) and a `updateStudentTDistribution` (:15-46) that
references undeclared variables and is not built. Per SURVEY.md §2 this module
implements the intended algorithm — the Gaussian x Uniform (Beta) mixture
update of Vogiatzis & Hernandez used by SVO — with the measurement-variance
model the legacy MATLAB prototypes compute (inverse-depth sigma from one-pixel
disparity error, legacy/matlab/stereoDisparityStatic.m).

State per seed: (mu, sigma2) inverse-depth Gaussian + (a, b) Beta inlier/
outlier pseudo-counts. Everything is [M]-batched and branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SQRT_2PI = 2.5066282746310002


class DepthSeeds(NamedTuple):
    mu: jax.Array  # [M] inverse-depth mean
    sigma2: jax.Array  # [M] inverse-depth variance
    a: jax.Array  # [M] Beta inlier count
    b: jax.Array  # [M] Beta outlier count
    z_range: jax.Array  # [M] inverse-depth search range (1/z_min)


def init_seeds(depth_init: jax.Array, depth_min: float = 0.5) -> DepthSeeds:
    """Initialize seeds at a prior mean depth with maximal uncertainty
    (SVO convention: sigma = z_range/6)."""
    z_range = 1.0 / depth_min
    mu = 1.0 / jnp.maximum(depth_init, 1e-3)
    sigma = z_range / 6.0
    return DepthSeeds(
        mu=mu,
        sigma2=jnp.full_like(mu, sigma * sigma),
        a=jnp.full_like(mu, 10.0),
        b=jnp.full_like(mu, 10.0),
        z_range=jnp.full_like(mu, z_range),
    )


def update_gaussian(mu, sigma2, x, tau2):
    """Plain product-of-Gaussians fusion (reference updateNormalDistribution,
    depth_filter.cpp:3-13)."""
    denom = sigma2 + tau2
    new_mu = (sigma2 * x + tau2 * mu) / denom
    new_s2 = sigma2 * tau2 / denom
    return new_mu, new_s2


def update_seeds(seeds: DepthSeeds, x: jax.Array, tau2: jax.Array, mask: jax.Array) -> DepthSeeds:
    """Vogiatzis Gaussian x Uniform Beta update, masked & batched.

    x: [M] inverse-depth measurement; tau2: [M] its variance; mask: [M] bool —
    lanes with mask=False keep their state unchanged.
    """
    mu, sigma2, a, b, z_range = seeds

    norm_s2 = sigma2 + tau2
    s2 = 1.0 / (1.0 / jnp.maximum(sigma2, 1e-12) + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s2 * (mu / jnp.maximum(sigma2, 1e-12) + x / jnp.maximum(tau2, 1e-12))

    # Likelihood under the inlier Gaussian and the outlier Uniform.
    gauss = jnp.exp(-0.5 * (x - mu) ** 2 / jnp.maximum(norm_s2, 1e-12)) / (
        _SQRT_2PI * jnp.sqrt(jnp.maximum(norm_s2, 1e-12))
    )
    C1 = a / (a + b) * gauss
    C2 = b / (a + b) * (1.0 / jnp.maximum(z_range, 1e-6))
    norm = jnp.maximum(C1 + C2, 1e-30)
    C1 = C1 / norm
    C2 = C2 / norm

    f = C1 * (a + 1.0) / (a + b + 1.0) + C2 * a / (a + b + 1.0)
    e = C1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0)) + C2 * a * (a + 1.0) / (
        (a + b + 1.0) * (a + b + 2.0)
    )

    mu_new = C1 * m + C2 * mu
    sigma2_new = C1 * (s2 + m * m) + C2 * (sigma2 + mu * mu) - mu_new * mu_new
    sigma2_new = jnp.maximum(sigma2_new, 1e-12)

    # Moment-matched Beta posterior: a' = (e - f) / (f - e/f).
    denom_f = f - e / jnp.maximum(f, 1e-12)
    denom_f = jnp.where(jnp.abs(denom_f) < 1e-12, 1e-12, denom_f)
    a_new = (e - f) / denom_f
    a_new = jnp.clip(a_new, 1e-3, 1e4)
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)
    b_new = jnp.clip(b_new, 1e-3, 1e4)

    def keep(old, new):
        return jnp.where(mask, new, old)

    return DepthSeeds(
        mu=keep(mu, mu_new),
        sigma2=keep(sigma2, sigma2_new),
        a=keep(a, a_new),
        b=keep(b, b_new),
        z_range=z_range,
    )


def measurement_tau2(z: jax.Array, t_norm: jax.Array, fx: float, px_noise: float = 1.0):
    """Inverse-depth measurement variance from a one-pixel disparity error
    (SVO's tau model; matches the MATLAB prototype's sigma_rho output).

    z: [M] triangulated depth; t_norm: baseline length between the views.
    """
    z = jnp.maximum(z, 1e-3)
    # depth error for a one-pixel epipolar match error
    tau_z = z * z * px_noise / jnp.maximum(fx * t_norm, 1e-6)
    # convert to inverse-depth std
    tau_rho = 0.5 * jnp.abs(1.0 / jnp.maximum(z - tau_z, 1e-3) - 1.0 / (z + tau_z))
    return tau_rho * tau_rho


def converged(seeds: DepthSeeds, thresh_ratio: float = 200.0):
    """Seed accepted when inverse-depth std shrank below range/thresh_ratio."""
    return jnp.sqrt(seeds.sigma2) < seeds.z_range / thresh_ratio


def inlier_probability(seeds: DepthSeeds):
    return seeds.a / (seeds.a + seeds.b)
