"""Quaternion-backed Rotation3/Pose3d value classes (operator-overloaded).

Capability parity with the reference `Rotation3`/`Pose3D`
(core/util/pose3d.{h,cpp}:33-139): quaternion-backed SO(3)/SE(3) values with
`*`/`*=` composition keeping R and q synchronized — here immutable wrappers
over the batched functional core (utils/geometry.py), so they compose with
jit/vmap when needed and renormalize on every multiply (the property the
reference's test_pose3d.cpp:58-84 drift test checks).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import geometry as geo


class Rotation3:
    """SO(3) value backed by a unit quaternion [w, x, y, z]."""

    __slots__ = ("q",)

    def __init__(self, q=None):
        self.q = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32) if q is None else geo.quat_normalize(jnp.asarray(q, jnp.float32))

    @classmethod
    def from_matrix(cls, R):
        return cls(geo.rotation_to_quat(jnp.asarray(R, jnp.float32)))

    @classmethod
    def from_rotvec(cls, w):
        return cls(geo.rotvec_to_quat(jnp.asarray(w, jnp.float32)))

    @property
    def R(self):
        return geo.quat_to_rotation(self.q)

    def inverse(self) -> "Rotation3":
        return Rotation3(geo.quat_conjugate(self.q))

    def __mul__(self, other):
        if isinstance(other, Rotation3):
            return Rotation3(geo.quat_multiply(self.q, other.q))
        v = jnp.asarray(other, jnp.float32)
        return (self.R @ v[..., None])[..., 0]

    def __repr__(self):
        return f"Rotation3(q={self.q})"


class Pose3d:
    """SE(3) value: Rotation3 + translation; `*` composes, also maps points."""

    __slots__ = ("rot", "t")

    def __init__(self, rot: Rotation3 | None = None, t=None):
        self.rot = rot if rot is not None else Rotation3()
        self.t = jnp.zeros(3, jnp.float32) if t is None else jnp.asarray(t, jnp.float32)

    @classmethod
    def from_matrix(cls, T):
        T = jnp.asarray(T, jnp.float32)
        return cls(Rotation3.from_matrix(T[:3, :3]), T[:3, 3])

    @classmethod
    def from_se3(cls, xi):
        return cls.from_matrix(geo.se3_exp(jnp.asarray(xi, jnp.float32)))

    @property
    def T(self):
        return geo.rt_to_se3(self.rot.R, self.t)

    def inverse(self) -> "Pose3d":
        rinv = self.rot.inverse()
        return Pose3d(rinv, -(rinv * self.t))

    def __mul__(self, other):
        if isinstance(other, Pose3d):
            return Pose3d(self.rot * other.rot, self.rot * other.t + self.t)
        return self.rot * other + self.t

    def __repr__(self):
        return f"Pose3d(q={self.rot.q}, t={self.t})"
