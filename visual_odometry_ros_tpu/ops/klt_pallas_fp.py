"""Feature-parallel Pallas TPU KLT: gather once, iterate vectorized.

The first Pallas KLT (klt_pallas.py) ran each feature's Gauss-Newton loop as
scalar-driven control flow — ~1k sequential while_loops of tiny vector ops,
latency-bound at ~7-9 ms per pyramid level. This kernel splits the work by
what the hardware is good at:

  Phase A (gather, per-feature serial, ONCE per level):
    For each feature, one aligned VMEM slab load around the template point
    and one around the prior target point; `pltpu.roll` rotates the
    unaligned offset away. Four features pack into each 128-lane tile of a
    canonical "bank": feature f = (g, c) occupies rows [32g, 32g+32),
    lanes [32c, 32c+32).

  Phase B (iterate, ALL features in parallel):
    The GN loop runs on whole-bank tensors. Bilinear sampling at the
    per-feature continuous offset (dy, dx) is expressed as a hat-weighted
    sum over STATIC rolls: P[i] = sum_k hat(dy - k) * bank[i + k] — k is a
    compile-time constant per term, dy varies per feature only through the
    weights, so every op is a full-width VPU op. Patch reductions (Hessian,
    J^T r) and per-feature broadcasts ride the MXU as matmuls against
    constant 0/1 group-membership matrices. Template gradients come from an
    in-kernel Scharr on the template bank (slabs carry the margin), so the
    caller needs no gradient pyramid.

Margin M = 3: a feature may drift +-(M+1) px per level from its prior
before clamping (coarse-to-fine restores the rest; interpret-mode parity vs
the jnp path is tested in tests/test_klt_pallas_fp.py, OpenCV parity of the
shared pyramid semantics in tests/test_klt_opencv_parity.py). 32-row tiles
fit radius <= 11: (2r+1) + 1 + (2M+1) + 1 <= 32.

The scale-compensated variant (reference trackWithScale,
feature_tracker.cpp:236-504) reuses Phase B unchanged: its Phase A resamples
both slabs to canonical unit scale per feature with separable hat-matrix
products on the MXU, so scale costs one extra resample, not a per-iteration
penalty.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M = 3  # drift margin (px) per level
_TER = 2 * _M + 2  # hat terms per axis: k = 0 .. 2M+1
_FPB_A = 8  # features per Phase-A program
_BLK = 64  # features per Phase-B program (rows = BLK/4 * 32; sized for 16M VMEM)
_ROWS_LOAD = 40  # aligned slab rows (32 + sublane phase)
_COLS_LOAD = 256  # aligned slab cols (32 + lane phase, two 128-tiles)
_PT = 16  # top padding: anchors of near-border features stay >= 0
_PL = 128  # left padding (lane-aligned)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Phase A: slab gather
# ---------------------------------------------------------------------------


def _gather_kernel(Hp: int, Wp: int):
    def kernel(meta_ref, img0_ref, img1_ref, bank0_ref, bank1_ref):
        # meta_ref: [FPB, 4] int32 SMEM rows (yA0, xA0, yA1, xA1)
        def tile_at(ref, yA, xA):
            # Dynamic rolls must use the POSITIVE modular shift: hardware
            # Mosaic does not wrap negative dynamic shifts (interpret mode
            # does — parity tests alone cannot catch this).
            y_al = pl.multiple_of((yA // 8) * 8, 8)
            x_al = pl.multiple_of((xA // 128) * 128, 128)
            raw = ref[pl.ds(y_al, _ROWS_LOAD), pl.ds(x_al, _COLS_LOAD)]
            raw = pltpu.roll(raw, (_ROWS_LOAD - (yA - y_al)) % _ROWS_LOAD, 0)[:32, :]
            raw = pltpu.roll(raw, (_COLS_LOAD - (xA - x_al)) % _COLS_LOAD, 1)[:, :32]
            return raw

        for g in range(_FPB_A // 4):
            t0 = []
            t1 = []
            for c in range(4):
                f = g * 4 + c
                t0.append(tile_at(img0_ref, meta_ref[f, 0], meta_ref[f, 1]))
                t1.append(tile_at(img1_ref, meta_ref[f, 2], meta_ref[f, 3]))
            bank0_ref[pl.ds(g * 32, 32), :] = jnp.concatenate(t0, axis=1)
            bank1_ref[pl.ds(g * 32, 32), :] = jnp.concatenate(t1, axis=1)

    return kernel


def _gather_banks(img0, img1, anchors0, anchors1, Hp, Wp, interpret=False):
    """anchors*: [NF, 2] int32 (yA, xA), NF multiple of _FPB_A. Returns two
    [NF/4*32, 128] banks."""
    NF = anchors0.shape[0]
    meta = jnp.concatenate([anchors0, anchors1], axis=-1).astype(jnp.int32)  # [NF, 4]
    n_blocks = NF // _FPB_A
    rows_b = _FPB_A // 4 * 32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_FPB_A, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_b, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows_b, 128), lambda i: (i, 0)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel(Hp, Wp),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * rows_b, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * rows_b, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, img0, img1)


# ---------------------------------------------------------------------------
# Phase B: vectorized GN iterations
# ---------------------------------------------------------------------------


def _iterate_kernel(S: int, iters: int, eps: float, min_eig: float, H: int, W: int,
                    epi1d: bool = False):
    G = _BLK // 4  # groups per block
    R = G * 32  # bank rows per block

    def kernel(b0_ref, b1_ref, ty_ref, tx_ref, dy0_ref, dx0_ref, act_ref,
               y0_ref, x0_ref, ya1_ref, xa1_ref, sc_ref, out_ref):
        b0 = b0_ref[:]
        b1 = b1_ref[:]

        def shift_read(z, k, axis):
            """out[i] = z[i + k] (cyclic; margins mask the wrap)."""
            n = z.shape[axis]
            return pltpu.roll(z, (-k) % n, axis)

        # Constant group matrices (iota compares; int-only iota on Mosaic).
        ri = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1)
        gi = jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
        F1 = (ri // 32 == gi).astype(jnp.float32)  # [G, R] row-group sum
        F2 = F1.T  # [R, G] row broadcast
        li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        E = (li // 32 == lj // 32).astype(jnp.float32)  # [128,128] lane-block sum

        # Patch mask: rows/lanes 0..S-1 of each 32-tile.
        pr = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        patch = (pr % 32 < S) & (pc % 32 < S)
        # Patch-pixel index within the window (for border-validity masks,
        # mirroring utils.interp.bilinear_sample: a sample is valid iff its
        # global coordinate lies in [0, dim-1]).
        rowi = (pr % 32).astype(jnp.float32)
        coli = (pc % 32).astype(jnp.float32)

        # HIGHEST precision: default MXU dots truncate inputs to bf16, which
        # injects ~0.1 px noise into the broadcast offsets and J^T r sums.
        _hi = jax.lax.Precision.HIGHEST

        def bcast(field):  # [G, 128] -> [R, 128]
            return jax.lax.dot(F2, field, precision=_hi, preferred_element_type=jnp.float32)

        def treduce(z):  # [R, 128] -> [G, 128] per-feature patch sums
            zs = jax.lax.dot(F1, z, precision=_hi, preferred_element_type=jnp.float32)
            return jax.lax.dot(zs, E, precision=_hi, preferred_element_type=jnp.float32)

        def hat_sample(bank, dyF, dxF):
            """Bilinear patch at per-feature continuous (dy, dx).

            dyF/dxF: [R, 128] broadcast fields. Output rows/lanes [0, S)
            of each tile hold the patch."""
            acc = None
            for k in range(_TER):
                w = jnp.maximum(0.0, 1.0 - jnp.abs(dyF - float(k)))
                t = w * shift_read(bank, k, 0)
                acc = t if acc is None else acc + t
            out = None
            for k in range(_TER):
                w = jnp.maximum(0.0, 1.0 - jnp.abs(dxF - float(k)))
                t = w * shift_read(acc, k, 1)
                out = t if out is None else out + t
            return out

        # Template gradients: Scharr on the template bank (slab margin covers
        # the stencil; sampled region stays >= 1 away from tile edges).
        def up(z):
            return shift_read(z, -1, 0)

        def dn(z):
            return shift_read(z, 1, 0)

        def lf(z):
            return shift_read(z, -1, 1)

        def rt(z):
            return shift_read(z, 1, 1)

        sx = (3.0 * (up(b0) + dn(b0)) + 10.0 * b0) / 16.0
        gxb = (rt(sx) - lf(sx)) * 0.5
        sy = (3.0 * (lf(b0) + rt(b0)) + 10.0 * b0) / 16.0
        gyb = (dn(sy) - up(sy)) * 0.5

        tyF = bcast(ty_ref[:])
        txF = bcast(tx_ref[:])
        T = hat_sample(b0, tyF, txF)
        gx = hat_sample(gxb, tyF, txF)
        gy = hat_sample(gyb, tyF, txF)

        # Template border mask: partial windows stay alive with the invalid
        # pixels zero-weighted (the jnp path's bilinear masks; the first
        # version killed any feature within radius+1 px of the border — a
        # 7%-of-frame dead band at KITTI sizes). Bank coordinates map to
        # image coordinates with a per-feature scale (1.0 for the plain
        # variant; the predicted depth ratio for the trackWithScale variant,
        # whose Phase A resampled the patch to canonical unit spacing).
        y0F = bcast(y0_ref[:])
        x0F = bcast(x0_ref[:])
        sF = bcast(sc_ref[:])
        v0 = (
            (y0F + sF * rowi >= 0.0) & (y0F + sF * rowi <= float(H - 1))
            & (x0F + sF * coli >= 0.0) & (x0F + sF * coli <= float(W - 1))
        )
        mask = (patch & v0).astype(jnp.float32)

        gxm = gx * mask
        gym = gy * mask
        gxx = treduce(gxm * gx)
        gxy = treduce(gxm * gy)
        gyy = treduce(gym * gy)
        npix = jnp.maximum(treduce(mask), 1.0)
        if epi1d:
            # Rectified-stereo mode: dy is structurally 0 — condition and
            # solve on the x axis only (1-D GN; off-row texture can no
            # longer drag the match).
            eig_ok = gxx / npix > min_eig
            inv_gxx = 1.0 / jnp.where(gxx < 1e-12, 1e-12, gxx)
            inv_det = inv_gxx  # unused but keeps the shapes defined
        else:
            tr = gxx + gyy
            dd = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4.0 * gxy * gxy, 0.0))
            lam_min = 0.5 * (tr - dd) / npix
            eig_ok = lam_min > min_eig

            det = gxx * gyy - gxy * gxy
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

        # Mostly-outside windows (valid fraction <= 1/2) are rejected like
        # OpenCV LK rejects border points; genuinely partial windows (frac
        # above 1/2) stay alive with invalid pixels zero-weighted, matching
        # the jnp path's bilinear masks.
        frac_ok = npix > 0.5 * float(S * S)

        ya1F = bcast(ya1_ref[:])
        xa1F = bcast(xa1_ref[:])
        act0 = (act_ref[:] > 0.5) & eig_ok & frac_ok
        lim = float(2 * _M + 1)

        def target_mask(dyF, dxF):
            y = ya1F + sF * (dyF + rowi)
            x = xa1F + sF * (dxF + coli)
            return (
                (y >= 0.0) & (y <= float(H - 1)) & (x >= 0.0) & (x <= float(W - 1))
            ).astype(jnp.float32)

        # conv is carried as f32 (Mosaic cannot yield i1 vectors from scf
        # loops): 1.0 = converged/dead lane, 0.0 = still iterating.
        def w_cond(carry):
            dy, dx, conv, it = carry
            return (jnp.min(conv) < 0.5) & (it < iters)

        def w_body(carry):
            dy, dx, conv, it = carry
            dyF = bcast(dy)
            dxF = bcast(dx)
            I1p = hat_sample(b1, dyF, dxF)
            w = mask * target_mask(dyF, dxF)
            e = (T - I1p) * w
            bx = treduce(gx * e)
            by = treduce(gy * e)
            if epi1d:
                du = bx * inv_gxx
                dv = jnp.zeros_like(du)
            else:
                du = (gyy * bx - gxy * by) * inv_det
                dv = (gxx * by - gxy * bx) * inv_det
            step = 1.0 - conv
            dx_n = jnp.clip(dx + du * step, 0.0, lim)
            dy_n = jnp.clip(dy + dv * step, 0.0, lim)
            conv = jnp.maximum(
                conv, (du * du + dv * dv < eps * eps).astype(jnp.float32)
            )
            return dy_n, dx_n, conv, it + 1

        dy, dx, _, _ = jax.lax.while_loop(
            w_cond, w_body,
            (dy0_ref[:], dx0_ref[:], 1.0 - act0.astype(jnp.float32), jnp.int32(0)),
        )

        dyF = bcast(dy)
        dxF = bcast(dx)
        I1p = hat_sample(b1, dyF, dxF)
        wf = mask * target_mask(dyF, dxF)
        err = treduce(jnp.abs(T - I1p) * wf) / jnp.maximum(treduce(wf), 1.0)
        interior = (dy > 0.01) & (dy < lim - 0.01) & (dx > 0.01) & (dx < lim - 0.01)
        ok = (act0 & interior).astype(jnp.float32)

        out_ref[pl.ds(0, G), :] = dy
        out_ref[pl.ds(G, G), :] = dx
        out_ref[pl.ds(2 * G, G), :] = err
        out_ref[pl.ds(3 * G, G), :] = ok

    return kernel


def _iterate_banks(bank0, bank1, ty, tx, dy0, dx0, act, y0, x0, ya1, xa1, sc,
                   S, iters, eps, min_eig, H, W, interpret=False, epi1d=False):
    """ty/tx/dy0/dx0/act/y0/x0/ya1/xa1/sc: [G_total, 128] lane-replicated
    fields (y0/x0 = template patch top-left in true image coords; ya1/xa1 =
    target bank origin in true image coords — the border-validity anchors;
    sc = bank-to-image scale, 1.0 for the plain variant). Returns
    [4 * G_total, 128] stacked (dy, dx, err, ok) fields."""
    G_total = ty.shape[0]
    NF = G_total * 4
    n_blocks = NF // _BLK
    G = _BLK // 4
    R = G * 32
    field_spec = pl.BlockSpec((G, 128), lambda i: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
        ] + [field_spec] * 10,
        out_specs=[pl.BlockSpec((4 * G, 128), lambda i: (i, 0))],
    )
    (out,) = pl.pallas_call(
        _iterate_kernel(S, iters, eps, min_eig, H, W, epi1d),
        out_shape=[jax.ShapeDtypeStruct((n_blocks * 4 * G, 128), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bank0, bank1, ty, tx, dy0, dx0, act, y0, x0, ya1, xa1, sc)
    return out


# ---------------------------------------------------------------------------
# XLA wrapper
# ---------------------------------------------------------------------------


def _to_field(vals, NF):
    """[NF] -> [NF/4, 128] lane-block-replicated field."""
    return jnp.repeat(vals.reshape(NF // 4, 4), 32, axis=1)


def _from_field(field, NF):
    """[NF/4, 128] -> [NF] (reads lane 0 of each 32-block)."""
    return field[:, ::32].reshape(NF)


def _unstack_out(out, NF):
    n_blocks = out.shape[0] // (4 * (_BLK // 4))
    G = _BLK // 4
    o = out.reshape(n_blocks, 4, G, 128)
    fields = [o[:, i].reshape(NF // 4, 128) for i in range(4)]
    return [_from_field(f, NF) for f in fields]


@partial(jax.jit, static_argnames=("radius", "iters", "eps", "min_eig", "interpret",
                                   "epi1d", "restarts"))
def track_level_fp(
    img0: jax.Array,
    img1: jax.Array,
    p0: jax.Array,
    p1_init: jax.Array,
    valid: jax.Array,
    radius: int = 10,
    iters: int = 12,
    eps: float = 0.03,
    min_eig: float = 1e-4,
    interpret: bool = False,
    epi1d: bool = False,
    restarts: int = 4,
):
    """One pyramid level of batched IC-KLT, feature-parallel.

    Semantics match ops/klt._track_one_level (template from img0 at p0,
    target in img1 seeded at p1_init). The slab drift window is only
    +-(_M+1) px, so features whose update would leave it are RE-ANCHORED at
    their current estimate and re-run (`restarts` extra gather+iterate
    passes, each wrapped in a scalar `lax.cond` so converged batches skip
    them entirely) — this is what gives the kernel the jnp path's unbounded
    per-level convergence range (hardware-parity probe r5: without restarts,
    full-pyramid tracking lost 10-40%% of features and diverged up to 37 px
    on prior-seeded corridor flows; the in-window math itself agrees with
    jnp to 1e-5 px). No gradient images needed — Scharr runs in-kernel.
    Returns (p1 [N,2], live [N] bool, err [N], processed [N] bool).

    `processed` marks features whose full window fits this level's image:
    only those ran the GN loop. Pyramid drivers must PASS THROUGH the rest
    (tiny coarse levels put most of the frame inside the window margin) and
    decide liveness at level 0.
    """
    N = p0.shape[0]
    H, W = img0.shape
    S = 2 * radius + 1
    if S + 1 + _TER > 32:
        raise ValueError(f"radius {radius} too large for 32-row tiles")

    NF = _round_up(max(N, _BLK), _BLK)
    pad = NF - N
    if pad:
        p0 = jnp.pad(p0, ((0, pad), (0, 0)))
        p1_init = jnp.pad(p1_init, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))

    # Pad images so every aligned slab load is in bounds: _PT rows on top and
    # _PL cols on left let slabs around border features reach "above"/"left of"
    # the image (partial windows sample the zero pad; the in-kernel
    # global-coordinate masks zero-weight those pixels like the jnp path's
    # bilinear masks), bottom/right padding covers the aligned load extent.
    Hp = _round_up(H + _PT, 8) + _ROWS_LOAD
    Wp = _round_up(W + _PL, 128) + _COLS_LOAD
    padspec = ((_PT, Hp - H - _PT), (_PL, Wp - W - _PL))
    # EDGE padding, not zeros: the in-kernel Scharr reads the pad at border
    # windows, and a zero step there fabricates a huge spurious gradient that
    # tripled gyy for top-border features and flipped the first GN step's
    # sign (r5 hardware-parity bisect). The jnp oracle's scharr_gradients
    # edge-replicates (ops/pyramid.py _sep_conv); match it.
    img0p = jnp.pad(img0, padspec, mode="edge")
    img1p = jnp.pad(img1, padspec, mode="edge")

    # Anchors (padded coords): slab top-left so the patch top-left sits
    # M(+frac) inside. _PT/_PL guarantee no clipping for in-image points.
    def anchor(p):
        a = jnp.floor(p).astype(jnp.int32) - radius - _M
        ax = jnp.clip(a[:, 0] + _PL, 0, Wp - _COLS_LOAD)
        ay = jnp.clip(a[:, 1] + _PT, 0, Hp - _ROWS_LOAD)
        return ay, ax

    ay0, ax0 = anchor(p0)
    anchors0 = jnp.stack([ay0, ax0], axis=-1)
    oy0 = ay0.astype(jnp.float32) - _PT
    ox0 = ax0.astype(jnp.float32) - _PL
    ty = (p0[:, 1] - radius) - oy0
    tx = (p0[:, 0] - radius) - ox0
    lim = float(2 * _M + 1)

    def one_pass(p1_seed):
        """Gather + iterate with the target slab anchored at p1_seed.
        Returns (p1 [NF,2], err, okf_bool, act_bool)."""
        ay1, ax1 = anchor(p1_seed)
        anchors1 = jnp.stack([ay1, ax1], axis=-1)
        oy1 = ay1.astype(jnp.float32) - _PT
        ox1 = ax1.astype(jnp.float32) - _PL
        dy0 = (p1_seed[:, 1] - radius) - oy1
        dx0 = (p1_seed[:, 0] - radius) - ox1
        # Structural guard only: offsets inside the drift window (always true
        # for finite in-image points thanks to the top-left padding; catches
        # garbage coordinates in dead lanes).
        in0 = (
            (ty >= 0.0) & (ty <= lim) & (tx >= 0.0) & (tx <= lim)
            & (dy0 >= 0.0) & (dy0 <= lim) & (dx0 >= 0.0) & (dx0 <= lim)
        )
        act = valid & in0
        bank0, bank1 = _gather_banks(img0p, img1p, anchors0, anchors1, Hp, Wp, interpret)
        out = _iterate_banks(
            bank0,
            bank1,
            _to_field(ty, NF),
            _to_field(tx, NF),
            _to_field(dy0, NF),
            _to_field(dx0, NF),
            _to_field(act.astype(jnp.float32), NF),
            _to_field(p0[:, 1] - radius, NF),
            _to_field(p0[:, 0] - radius, NF),
            _to_field(oy1, NF),
            _to_field(ox1, NF),
            _to_field(jnp.ones((NF,), jnp.float32), NF),
            S,
            iters,
            eps,
            min_eig,
            H,
            W,
            interpret,
            epi1d,
        )
        dy, dx, err, okf = _unstack_out(out, NF)
        u1 = ox1 + dx + radius
        v1 = oy1 + dy + radius
        p1 = jnp.stack([u1, v1], axis=-1)
        return p1, err, okf > 0.5, act

    p1, err, okf, act = one_pass(p1_init)
    for _ in range(restarts):
        # A boundary-clamped feature restarts from its current estimate
        # (clamped into the image so the next anchor stays loadable). The
        # whole batch re-runs — converged features re-converge in place, so
        # re-running is idempotent — but only when at least one active
        # feature actually needs it: steady-state frames with good priors
        # skip every restart at a scalar branch.
        need = act & ~okf
        seed = jnp.stack(
            [jnp.clip(p1[:, 0], 0.0, W - 1.0), jnp.clip(p1[:, 1], 0.0, H - 1.0)],
            axis=-1,
        )
        p1, err, okf, act = jax.lax.cond(
            jnp.any(need),
            lambda s: one_pass(s),
            lambda s: (p1, err, okf, act),
            seed,
        )

    p1 = p1[:N]
    err = err[:N]
    # Final point must have bilinear support in the image; the pipeline's
    # border gate (track_with_prior_pyr, border=3) applies on top.
    in1 = (
        (p1[:, 0] >= 0.0) & (p1[:, 1] >= 0.0)
        & (p1[:, 0] <= W - 1.0) & (p1[:, 1] <= H - 1.0)
    )
    live = valid[:N] & okf[:N] & in1
    return p1, live, err, act[:N]


# ---------------------------------------------------------------------------
# Scale-compensated variant (reference trackWithScale,
# feature_tracker.cpp:236-504): Phase A resamples each feature's scaled patch
# to a canonical unit-spacing 32x32 bank with two separable hat-weight
# matmuls on the MXU; Phase B is the SAME _iterate_kernel with the scale
# field mapping bank units back to image pixels for the border masks, and
# the wrapper mapping the converged bank offset back to an image translation.
# ---------------------------------------------------------------------------

_S_MAX = 2.0  # bank-to-image scale range the slab extent supports
_S_MIN = 0.5
_SROWS = 72  # scale-slab rows: covers s<=2 * 31 bank rows + frac + sublane phase
_SCOLS = 256  # scale-slab cols: 2*31 + frac + lane phase (two 128-tiles)
_PT_S = 40  # top padding: bank origin p - s*(r+M) >= -28 at s=2
_PL_S = 128  # left padding (lane-aligned)


def _gather_scale_kernel(Hp: int, Wp: int):
    def kernel(meta_ref, img0_ref, img1_ref, bank0_ref, bank1_ref):
        # meta_ref: [FPB, 8] f32 SMEM rows
        #   (by0, bx0, by1, bx1 — bank origins in PADDED image coords — s, 0, 0, 0)
        ii_r = jax.lax.broadcasted_iota(jnp.int32, (32, _SROWS), 0).astype(jnp.float32)
        pp_r = jax.lax.broadcasted_iota(jnp.int32, (32, _SROWS), 1).astype(jnp.float32)
        ii_c = jax.lax.broadcasted_iota(jnp.int32, (32, _SCOLS), 0).astype(jnp.float32)
        pp_c = jax.lax.broadcasted_iota(jnp.int32, (32, _SCOLS), 1).astype(jnp.float32)
        _hi = jax.lax.Precision.HIGHEST

        def resample(ref, by, bx, s):
            """[32, 32] canonical bank: out[i, j] = img(by + s*i, bx + s*j)."""
            y_al = pl.multiple_of((by.astype(jnp.int32) // 8) * 8, 8)
            x_al = pl.multiple_of((bx.astype(jnp.int32) // 128) * 128, 128)
            slab = ref[pl.ds(y_al, _SROWS), pl.ds(x_al, _SCOLS)]
            offy = by - y_al.astype(jnp.float32)
            offx = bx - x_al.astype(jnp.float32)
            Wy = jnp.maximum(0.0, 1.0 - jnp.abs(offy + s * ii_r - pp_r))  # [32, SR]
            Wx = jnp.maximum(0.0, 1.0 - jnp.abs(offx + s * ii_c - pp_c))  # [32, SC]
            t = jax.lax.dot(Wy, slab, precision=_hi, preferred_element_type=jnp.float32)
            return jax.lax.dot(
                t, Wx.T, precision=_hi, preferred_element_type=jnp.float32
            )

        for g in range(_FPB_A // 4):
            t0 = []
            t1 = []
            for c in range(4):
                f = g * 4 + c
                s = meta_ref[f, 4]
                t0.append(resample(img0_ref, meta_ref[f, 0], meta_ref[f, 1], s))
                t1.append(resample(img1_ref, meta_ref[f, 2], meta_ref[f, 3], s))
            bank0_ref[pl.ds(g * 32, 32), :] = jnp.concatenate(t0, axis=1)
            bank1_ref[pl.ds(g * 32, 32), :] = jnp.concatenate(t1, axis=1)

    return kernel


def _gather_scale_banks(img0, img1, meta, Hp, Wp, interpret=False):
    """meta: [NF, 8] f32 (by0, bx0, by1, bx1, s, 0, 0, 0) padded coords."""
    NF = meta.shape[0]
    n_blocks = NF // _FPB_A
    rows_b = _FPB_A // 4 * 32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_FPB_A, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_b, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows_b, 128), lambda i: (i, 0)),
        ],
    )
    return pl.pallas_call(
        _gather_scale_kernel(Hp, Wp),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * rows_b, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * rows_b, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, img0, img1)


@partial(jax.jit, static_argnames=("radius", "iters", "eps", "interpret", "restarts"))
def track_scale_fp(
    img0: jax.Array,
    img1: jax.Array,
    p0: jax.Array,
    p1_init: jax.Array,
    scale_change: jax.Array,
    valid: jax.Array,
    radius: int = 11,
    iters: int = 30,
    eps: float = 0.01,
    interpret: bool = False,
    restarts: int = 3,
):
    """Feature-parallel scale-compensated IC-KLT (trackWithScale analog).

    The per-feature patch spans p +- scale*radius image px; Phase A resamples
    it to unit bank spacing, so the GN loop runs at the same cost as the
    plain variant regardless of scale. scale_change is clipped to
    [0.5, 2.0] (slab extent bound); template gradients come from in-bank
    Scharr, i.e. smoothed at patch scale rather than image scale — the same
    pyramid-level approximation OpenCV makes. Boundary-clamped features are
    re-anchored and re-run up to `restarts` times (cond-skipped when every
    active feature converged interior), matching the jnp path's unbounded
    GN range — without this the +-(M+1)*s px drift window starved large
    flows (r5 hardware-parity probe: 8 px divergence on corridor frames).

    Returns (p1 [N, 2], err [N], ok [N]) matching track_scale_pallas.
    """
    N = p0.shape[0]
    H, W = img0.shape
    S = 2 * radius + 1
    if S + 1 + _TER > 32:
        raise ValueError(f"radius {radius} too large for 32-row tiles")

    NF = _round_up(max(N, _BLK), _BLK)
    pad = NF - N
    if pad:
        p0 = jnp.pad(p0, ((0, pad), (0, 0)))
        p1_init = jnp.pad(p1_init, ((0, pad), (0, 0)))
        scale_change = jnp.pad(scale_change, (0, pad), constant_values=1.0)
        valid = jnp.pad(valid, (0, pad))

    s = jnp.clip(scale_change, _S_MIN, _S_MAX)

    Hp = _round_up(H + _PT_S, 8) + _SROWS
    Wp = _round_up(W + _PL_S, 128) + _SCOLS
    padspec = ((_PT_S, Hp - H - _PT_S), (_PL_S, Wp - W - _PL_S))
    # Edge padding for the same reason as track_level_fp: in-bank Scharr must
    # not see a fabricated zero step at image borders.
    img0p = jnp.pad(img0, padspec, mode="edge")
    img1p = jnp.pad(img1, padspec, mode="edge")

    rM = float(radius + _M)

    def origin(p):
        by = p[:, 1] - s * rM + _PT_S
        bx = p[:, 0] - s * rM + _PL_S
        byc = jnp.clip(by, 0.0, float(Hp - _SROWS))
        bxc = jnp.clip(bx, 0.0, float(Wp - _SCOLS))
        ok = (by == byc) & (bx == bxc)
        return byc, bxc, ok

    by0, bx0, ok0 = origin(p0)
    m_field = jnp.full((NF,), float(_M), jnp.float32)

    def one_pass(p1_seed):
        by1, bx1, ok1 = origin(p1_seed)
        act = valid & ok0 & ok1
        meta = jnp.stack(
            [by0, bx0, by1, bx1, s, jnp.zeros_like(s), jnp.zeros_like(s),
             jnp.zeros_like(s)],
            axis=-1,
        ).astype(jnp.float32)
        bank0, bank1 = _gather_scale_banks(img0p, img1p, meta, Hp, Wp, interpret)
        out = _iterate_banks(
            bank0,
            bank1,
            _to_field(m_field, NF),  # ty: resample placed the patch at offset M
            _to_field(m_field, NF),
            _to_field(m_field, NF),  # dy0 = M: seed at the drift-window center
            _to_field(m_field, NF),
            _to_field(act.astype(jnp.float32), NF),
            _to_field(p0[:, 1] - s * radius, NF),  # template top-left, image coords
            _to_field(p0[:, 0] - s * radius, NF),
            _to_field(by1 - _PT_S, NF),  # target bank origin, image coords
            _to_field(bx1 - _PL_S, NF),
            _to_field(s, NF),
            S,
            iters,
            eps,
            0.0,  # no eigenvalue gate — jnp track_with_scale has none
            H,
            W,
            interpret,
        )
        dy, dx, err, okf = _unstack_out(out, NF)
        # Converged bank offset -> image position: center at origin + s*(d+r).
        u1 = (bx1 - _PL_S) + s * (dx + radius)
        v1 = (by1 - _PT_S) + s * (dy + radius)
        p1 = jnp.stack([u1, v1], axis=-1)
        return p1, err, okf > 0.5, act

    p1, err, okf, act = one_pass(p1_init)
    for _ in range(restarts):
        need = act & ~okf
        seed = jnp.stack(
            [jnp.clip(p1[:, 0], 0.0, W - 1.0), jnp.clip(p1[:, 1], 0.0, H - 1.0)],
            axis=-1,
        )
        p1, err, okf, act = jax.lax.cond(
            jnp.any(need),
            lambda sd: one_pass(sd),
            lambda sd: (p1, err, okf, act),
            seed,
        )

    p1 = p1[:N]
    err = err[:N]
    in1 = (
        (p1[:, 0] >= 0.0) & (p1[:, 1] >= 0.0)
        & (p1[:, 0] <= W - 1.0) & (p1[:, 1] <= H - 1.0)
    )
    ok = valid[:N] & okf[:N] & in1
    return p1, err, ok
