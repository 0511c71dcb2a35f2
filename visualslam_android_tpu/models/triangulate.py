"""Two-view triangulation.

Capability parity with MapMaker::ReprojectPoint (jni/MapMaker.cc:176-200):
linear triangulation via the null vector of the stacked 4x4 DLT system,
batched over points (the reference runs one 4x4 SVD per point serially).
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate(Ra, ta, Rb, tb, ma, mb):
    """Triangulate points seen at z=1-plane coords ma/mb [..., 2] from
    cameras A and B (camera-from-world R, t). Returns world points [..., 3].

    DLT rows (MapMaker.cc:176-200): for P = [R | t],
    [ u * P_row3 - P_row1 ; v * P_row3 - P_row2 ] for each view.
    The null vector of A^T A (4x4 eigh — batches cleanly) gives the
    homogeneous point.
    """
    Pa = jnp.concatenate([Ra, ta[..., None]], axis=-1)  # [..., 3, 4]
    Pb = jnp.concatenate([Rb, tb[..., None]], axis=-1)

    def rows(P, m):
        r0 = m[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = m[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return jnp.stack([r0, r1], axis=-2)  # [..., 2, 4]

    A = jnp.concatenate([rows(Pa, ma), rows(Pb, mb)], axis=-2)  # [..., 4, 4]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    Xh = vecs[..., :, 0]
    w = Xh[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / safe_w[..., None]


def depth_in_camera(R, t, X):
    """z-coordinate of world points X in camera (R, t)."""
    return jnp.einsum("...ij,...j->...i", R, X)[..., 2] + t[..., 2]
