"""Pallas TPU kernel for the KLT inner loop — per-feature patch tracking.

The jnp KLT (ops/klt.py) expresses patch extraction as XLA gathers, which
lower poorly on TPU (serialized random access). This kernel keeps the whole
pyramid level resident in VMEM and runs the inverse-compositional iteration
with per-feature *aligned dynamic slices*: Mosaic requires VMEM slice starts
to be 8-aligned (sublanes) / 128-aligned (lanes), so each patch read loads an
aligned [ROWS, COLS] slab around the point and rotates the residual offset
away with `pltpu.roll` (dynamic rotate is a native VPU shuffle). Template
patch + gradient patches are sliced once per feature; the fixed GN iteration
loop re-slices the target patch at the current offset and bilinearly
interpolates with scalar weights.

Layout: grid = (N / FPB,) programs, FPB features per program (static Python
loop inside); feature coordinates arrive in SMEM, outputs are one packed
[FPB, 4] SMEM row block (u, v, err, ok) — Mosaic rejects narrow rank-1 SMEM
blocks.

Matches `_track_one_level` in ops/klt.py (same math, same gates) so the
pyramid driver can swap implementations; parity is tested in
tests/test_klt_pallas.py including interpret mode.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Features per program: amortizes program dispatch; keeps VMEM scratch small.
_FPB = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _level_kernel(radius: int, iters: int, eps: float, min_eig: float, H: int, W: int,
                  Hp: int, Wp: int):
    S = 2 * radius + 1  # patch side
    SS = S + 1  # slice side (bilinear support)
    ROWS = _round_up(SS + 8, 8)  # aligned slab: covers any sublane phase
    COLS = min(_round_up(SS + 128, 128), Wp)

    def aligned_patch(ref, yc, xc):
        """[SS, SS] patch at unaligned (yc, xc) via aligned load + roll.

        yc in [0, Hp - SS], xc in [0, Wp - SS] (caller clips)."""
        y_al = jnp.minimum((yc // 8) * 8, Hp - ROWS)
        x_al = jnp.minimum((xc // 128) * 128, Wp - COLS)
        py = yc - y_al  # 0..ROWS-SS
        px = xc - x_al  # 0..COLS-SS
        raw = ref[pl.ds(pl.multiple_of(y_al, 8), ROWS), pl.ds(pl.multiple_of(x_al, 128), COLS)]
        # Positive modular shifts: hardware Mosaic does not wrap negative
        # dynamic roll amounts (interpret mode does).
        raw = pltpu.roll(raw, (ROWS - py) % ROWS, 0)[:SS, :]
        raw = pltpu.roll(raw, (COLS - px) % COLS, 1)[:, :SS]
        return raw

    def kernel(pts_ref, img0_ref, gx_ref, gy_ref, img1_ref, out_ref):
        # pts_ref: [FPB, 8] SMEM rows (u0, v0, u1_init, v1_init, valid, 0, 0, 0)
        for f in range(_FPB):
            u0 = pts_ref[f, 0]
            v0 = pts_ref[f, 1]
            u1 = pts_ref[f, 2]
            v1 = pts_ref[f, 3]
            lane_ok = pts_ref[f, 4] > 0.5  # dead lanes exit the GN loop at once

            # Template patch anchored at the integer part of p0.
            iu0 = jnp.floor(u0).astype(jnp.int32)
            iv0 = jnp.floor(v0).astype(jnp.int32)
            fu0 = u0 - iu0.astype(jnp.float32)
            fv0 = v0 - iv0.astype(jnp.float32)
            # In-bounds guard for the whole SSxSS support (true image extent).
            x0 = iu0 - radius
            y0 = iv0 - radius
            in0 = (x0 >= 0) & (y0 >= 0) & (x0 + SS <= W) & (y0 + SS <= H)
            x0c = jnp.clip(x0, 0, Wp - SS)
            y0c = jnp.clip(y0, 0, Hp - SS)

            raw_t = aligned_patch(img0_ref, y0c, x0c)
            raw_gx = aligned_patch(gx_ref, y0c, x0c)
            raw_gy = aligned_patch(gy_ref, y0c, x0c)

            def bil(raw, fu, fv):
                return (
                    raw[:S, :S] * (1.0 - fu) * (1.0 - fv)
                    + raw[:S, 1:] * fu * (1.0 - fv)
                    + raw[1:, :S] * (1.0 - fu) * fv
                    + raw[1:, 1:] * fu * fv
                )

            T = bil(raw_t, fu0, fv0)
            gx = bil(raw_gx, fu0, fv0)
            gy = bil(raw_gy, fu0, fv0)

            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            npix = float(S * S)
            tr = gxx + gyy
            dd = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4.0 * gxy * gxy, 0.0))
            lam_min = 0.5 * (tr - dd) / npix
            eig_ok = lam_min > min_eig

            det = gxx * gyy - gxy * gxy
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

            # Early-exit GN: prior-seeded features converge in a few steps, so
            # a while_loop skips the remaining slab loads entirely (the fori
            # variant still pays every iteration's VMEM traffic).
            def w_cond(carry):
                _, _, conv, it = carry
                return jnp.logical_not(conv) & (it < iters)

            def w_body(carry):
                u1c, v1c, conv, it = carry
                iu = jnp.floor(u1c).astype(jnp.int32)
                iv = jnp.floor(v1c).astype(jnp.int32)
                fu = u1c - iu.astype(jnp.float32)
                fv = v1c - iv.astype(jnp.float32)
                xs = jnp.clip(iu - radius, 0, Wp - SS)
                ys = jnp.clip(iv - radius, 0, Hp - SS)
                I1p = bil(aligned_patch(img1_ref, ys, xs), fu, fv)
                e = T - I1p
                bx = jnp.sum(gx * e)
                by = jnp.sum(gy * e)
                du = (gyy * bx - gxy * by) * inv_det
                dv = (gxx * by - gxy * bx) * inv_det
                step2 = du * du + dv * dv
                return u1c + du, v1c + dv, step2 < eps * eps, it + 1

            u1f, v1f, _, _ = jax.lax.while_loop(
                w_cond,
                w_body,
                (u1, v1, jnp.logical_not(in0 & eig_ok & lane_ok),
                 jnp.asarray(0, jnp.int32)),
            )

            # Final residual at the converged position.
            iu = jnp.floor(u1f).astype(jnp.int32)
            iv = jnp.floor(v1f).astype(jnp.int32)
            fu = u1f - iu.astype(jnp.float32)
            fv = v1f - iv.astype(jnp.float32)
            in1 = (iu - radius >= 0) & (iv - radius >= 0) & (iu - radius + SS <= W) & (iv - radius + SS <= H)
            xs = jnp.clip(iu - radius, 0, Wp - SS)
            ys = jnp.clip(iv - radius, 0, Hp - SS)
            I1p = bil(aligned_patch(img1_ref, ys, xs), fu, fv)
            err = jnp.sum(jnp.abs(T - I1p)) / npix

            # Single [FPB, 4] SMEM row: (u, v, err, ok). Mosaic rejects rank-1
            # SMEM blocks smaller than the 128-lane tile, so outputs are packed.
            out_ref[f, 0] = u1f
            out_ref[f, 1] = v1f
            out_ref[f, 2] = err
            out_ref[f, 3] = (in0 & eig_ok & in1).astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("radius", "iters", "eps", "min_eig", "interpret"))
def track_level_pallas(
    img0: jax.Array,
    gx0: jax.Array,
    gy0: jax.Array,
    img1: jax.Array,
    p0: jax.Array,
    p1_init: jax.Array,
    valid: jax.Array,
    radius: int = 10,
    iters: int = 12,
    eps: float = 0.03,
    min_eig: float = 1e-4,
    interpret: bool = False,
):
    """One pyramid level of batched IC-KLT as a Pallas kernel.

    Returns (p1 [N, 2], live [N] bool, err [N]) matching
    ops/klt._track_one_level semantics (masked-border handling differs only
    at the image edge where both implementations already reject).
    """
    N = p0.shape[0]
    H, W = img0.shape
    n_blocks = -(-N // _FPB)
    pad = n_blocks * _FPB - N

    pts = jnp.concatenate(
        [p0, p1_init, valid[:, None].astype(jnp.float32), jnp.zeros((N, 3), jnp.float32)],
        axis=-1,
    )  # [N, 8]
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))

    # Pad images so every aligned slab load is in bounds. Slabs are
    # [ROWS >= SS+8, COLS multiple of 128], so Hp/Wp must cover them.
    SS = 2 * radius + 2
    Hp = max(_round_up(H, 8), _round_up(SS + 8, 8))
    Wp = max(_round_up(W, 128), _round_up(SS + 128, 128))
    if (Hp, Wp) != (H, W):
        padspec = ((0, Hp - H), (0, Wp - W))
        img0 = jnp.pad(img0, padspec)
        gx0 = jnp.pad(gx0, padspec)
        gy0 = jnp.pad(gy0, padspec)
        img1 = jnp.pad(img1, padspec)

    kernel = _level_kernel(radius, iters, eps, min_eig, H, W, Hp, Wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_FPB, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_FPB, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * _FPB, 4), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pts, img0, gx0, gy0, img1)

    p1 = out[:N, :2]
    err = out[:N, 2]
    live = valid & (out[:N, 3] > 0.5)
    return p1, live, err


# ---------------------------------------------------------------------------
# Scale-compensated refinement (trackWithScale) kernel
# ---------------------------------------------------------------------------
#
# The reference's trackWithScale (feature_tracker.cpp:236-504) samples a
# patch whose grid is scaled per-feature by the predicted depth ratio. A
# scaled bilinear resample is separable, so the kernel expresses it as two
# hat-weight matrix products: patch = Ry @ slab @ Cx^T, where slab is one
# aligned VMEM block loaded per feature and Ry/Cx are built on the fly from
# iota comparisons. Patch extraction thus rides the MXU instead of gathers.
# The slab is loaded ONCE per feature (with drift margin); GN iterations only
# rebuild the [S, ROWS]/[S, COLS] weight matrices.

_SCALE_MAX = 2.0  # kernel slab sized for scale_change in [1/_SCALE_MAX, _SCALE_MAX]


def _scale_kernel(radius: int, iters: int, H: int, W: int, Hp: int, Wp: int):
    S = 2 * radius + 1
    ext = int(np.ceil(radius * _SCALE_MAX)) + 1  # max half-extent + bilinear
    MARGIN = 6  # allowed refinement drift in px
    ROWS = _round_up(2 * (ext + MARGIN) + 2, 8)
    COLS = min(_round_up(2 * (ext + MARGIN) + 2 + 128, 128), Wp)

    def hat(center, scale, size):
        """[S, size] bilinear hat weights: row i samples center + scale*(i-r)."""
        # Mosaic's tpu.iota is integer-only; build int32 grids and cast.
        i = jax.lax.broadcasted_iota(jnp.int32, (S, size), 0).astype(jnp.float32)
        k = jax.lax.broadcasted_iota(jnp.int32, (S, size), 1).astype(jnp.float32)
        y = center + scale * (i - radius)
        return jnp.maximum(0.0, 1.0 - jnp.abs(y - k))

    def kernel(pts_ref, img0_ref, gx_ref, gy_ref, img1_ref, out_ref):
        # pts_ref: [FPB, 8] SMEM rows (u0, v0, u1, v1, scale, _, _, _)
        for f in range(_FPB):
            u0 = pts_ref[f, 0]
            v0 = pts_ref[f, 1]
            u1 = pts_ref[f, 2]
            v1 = pts_ref[f, 3]
            sc = pts_ref[f, 4]
            lane_ok = pts_ref[f, 5] > 0.5

            def slab_at(ref, vc, uc):
                yc = jnp.clip(jnp.floor(vc).astype(jnp.int32) - ROWS // 2, 0, Hp - ROWS)
                xc = jnp.clip(jnp.floor(uc).astype(jnp.int32) - COLS // 2, 0, Wp - COLS)
                y_al = pl.multiple_of((yc // 8) * 8, 8)
                x_al = pl.multiple_of((xc // 128) * 128, 128)
                return ref[pl.ds(y_al, ROWS), pl.ds(x_al, COLS)], y_al, x_al

            # Template slabs + scaled template/gradient patches at p0.
            t_slab, ty, tx = slab_at(img0_ref, v0, u0)
            gx_slab, _, _ = slab_at(gx_ref, v0, u0)
            gy_slab, _, _ = slab_at(gy_ref, v0, u0)
            Ry0 = hat(v0 - ty.astype(jnp.float32), sc, ROWS)
            Cx0 = hat(u0 - tx.astype(jnp.float32), sc, COLS)
            T = jnp.dot(jnp.dot(Ry0, t_slab), Cx0.T)
            gx = jnp.dot(jnp.dot(Ry0, gx_slab), Cx0.T)
            gy = jnp.dot(jnp.dot(Ry0, gy_slab), Cx0.T)

            half = sc * radius + 1.0
            in0 = (u0 - half >= 0) & (v0 - half >= 0) & (u0 + half < W) & (v0 + half < H)

            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            det = gxx * gyy - gxy * gxy
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

            # Target slab loaded once around the prior; iterations re-weight.
            s_slab, sy, sx = slab_at(img1_ref, v1, u1)
            syf = sy.astype(jnp.float32)
            sxf = sx.astype(jnp.float32)

            def w_cond(carry):
                _, _, conv, it = carry
                return jnp.logical_not(conv) & (it < iters)

            def w_body(carry):
                u1c, v1c, conv, it = carry
                Ry = hat(v1c - syf, sc, ROWS)
                Cx = hat(u1c - sxf, sc, COLS)
                I1p = jnp.dot(jnp.dot(Ry, s_slab), Cx.T)
                e = T - I1p
                bx = jnp.sum(gx * e)
                by = jnp.sum(gy * e)
                du = (gyy * bx - gxy * by) * inv_det
                dv = (gxx * by - gxy * bx) * inv_det
                return u1c + du, v1c + dv, du * du + dv * dv < 1e-4, it + 1

            u1f, v1f, _, _ = jax.lax.while_loop(
                w_cond, w_body,
                (u1, v1, jnp.logical_not(in0 & lane_ok), jnp.asarray(0, jnp.int32)),
            )

            Ry = hat(v1f - syf, sc, ROWS)
            Cx = hat(u1f - sxf, sc, COLS)
            I1p = jnp.dot(jnp.dot(Ry, s_slab), Cx.T)
            err = jnp.sum(jnp.abs(T - I1p)) / float(S * S)

            halfd = sc * radius + 1.0
            in1 = (
                (u1f - halfd >= 0) & (v1f - halfd >= 0)
                & (u1f + halfd < W) & (v1f + halfd < H)
                # drift stayed inside the preloaded slab
                & (jnp.abs(u1f - u1) < MARGIN) & (jnp.abs(v1f - v1) < MARGIN)
            )
            out_ref[f, 0] = u1f
            out_ref[f, 1] = v1f
            out_ref[f, 2] = err
            out_ref[f, 3] = (in0 & in1).astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("radius", "iters", "interpret"))
def track_scale_pallas(
    img0: jax.Array,
    du0: jax.Array,
    dv0: jax.Array,
    img1: jax.Array,
    p0: jax.Array,
    p1_init: jax.Array,
    scale_change: jax.Array,
    valid: jax.Array,
    radius: int = 11,
    iters: int = 30,
    interpret: bool = False,
):
    """Scale-compensated IC-KLT refinement as a Pallas kernel.

    Returns (p1 [N, 2], err [N], ok [N]); semantics match ops/klt
    track_with_scale with a full (non-checkerboard) patch — the reference
    subsamples only as a CPU shortcut. scale_change is clamped to the slab
    budget [1/2, 2]."""
    N = p0.shape[0]
    H, W = img0.shape
    n_blocks = -(-N // _FPB)
    pad = n_blocks * _FPB - N

    sc = jnp.clip(scale_change, 1.0 / _SCALE_MAX, _SCALE_MAX)
    pts = jnp.concatenate(
        [p0, p1_init, sc[:, None], valid[:, None].astype(jnp.float32),
         jnp.zeros((N, 2), jnp.float32)], axis=-1
    )  # [N, 8]
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))

    SS = 2 * (int(np.ceil(radius * _SCALE_MAX)) + 7) + 2
    Hp = max(_round_up(H, 8), _round_up(SS + 8, 8))
    Wp = max(_round_up(W, 128), _round_up(SS + 128, 128))
    if (Hp, Wp) != (H, W):
        padspec = ((0, Hp - H), (0, Wp - W))
        img0 = jnp.pad(img0, padspec)
        du0 = jnp.pad(du0, padspec)
        dv0 = jnp.pad(dv0, padspec)
        img1 = jnp.pad(img1, padspec)

    kernel = _scale_kernel(radius, iters, H, W, Hp, Wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_FPB, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_FPB, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_blocks * _FPB, 4), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pts, img0, du0, dv0, img1)

    p1 = out[:N, :2]
    err = out[:N, 2]
    ok = valid & (out[:N, 3] > 0.5)
    return p1, err, ok
