"""SE(3) parameterization and transform utilities (jittable, batched).

Reference behaviors: core/registration.py:16-64 (6D rotation Gram-Schmidt),
dataloader/transforms.py:14-23 (random rotation sampling), util/pointcloud
apply_transform.

Precision: every matmul here carries ``Precision.HIGHEST``. This platform's
DEFAULT matmul precision is bf16-level even for f32 operands (measured 1.6e-3
relative error on a 3x3 product, CPU and TPU alike); left unguarded, each
apply_transform injected ~0.2% coordinate noise and each composed rigid
transform drifted its determinant by ~1e-3 per product — centimeters of pose
noise after an ICP run. Geometry is f32-exact; only the conv engine is
deliberately bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ortho2rotation(poses: jnp.ndarray) -> jnp.ndarray:
    """Map 6D rotation parameters to SO(3) via Gram-Schmidt.

    Matches core/registration.py:16-64: columns of R are
    x = normalize(p[:3]); y = normalize(p[3:] - proj_x(p[3:])); z = x cross y.

    poses: [B, 6] -> [B, 3, 3].
    """
    def normalize(v):
        mag = jnp.sqrt(jnp.sum(v ** 2, axis=1, keepdims=True))
        return v / jnp.maximum(mag, 1e-8)

    x_raw = poses[:, 0:3]
    y_raw = poses[:, 3:6]
    x = normalize(x_raw)
    inner = jnp.sum(x * y_raw, axis=1, keepdims=True)
    norm2 = jnp.maximum(jnp.sum(x ** 2, axis=1, keepdims=True), 1e-8)
    y = normalize(y_raw - (inner / norm2) * x)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=2)  # columns


def rotation_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse embedding: first two columns of R -> [B, 6] (registration.py:122-123)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def apply_transform(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (or 3x4) homogeneous transform to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.matmul(xyz, jnp.swapaxes(R, -1, -2),
                      precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


def rt_to_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Stack rotation [..., 3, 3] + translation [..., 3] into [..., 4, 4]."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def matrix_inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t,
                                        precision=jax.lax.Precision.HIGHEST))


def random_rotation(key: jax.Array, rotation_range_deg: float = 360.0) -> jnp.ndarray:
    """Random rotation about a uniform axis with uniform angle in +/-range/2.

    Matches dataloader/transforms.py:14-23 (axis-angle via matrix exponential).
    Returns [3, 3].
    """
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-8)
    angle = (jax.random.uniform(k2) - 0.5) * jnp.deg2rad(rotation_range_deg)
    K = jnp.array([[0.0, -axis[2], axis[1]],
                   [axis[2], 0.0, -axis[0]],
                   [-axis[1], axis[0], 0.0]])
    return jnp.eye(3) + jnp.sin(angle) * K + (1 - jnp.cos(angle)) * \
        jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
