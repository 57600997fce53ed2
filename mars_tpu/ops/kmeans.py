"""k-means++ on device with keyed PRNG.

The reference's torch k-means++ (reference: matcher/k_means.py:17-57) does
D²-weighted multinomial seeding, Lloyd iterations with an empty-cluster
fallback (keep the old center), and the *caller* re-runs the whole thing in
a Python while-loop when any cluster ends up empty (reference:
matcher/Matcher.py:579-591).  Here seeding/iteration are jitted with
jax.random; the rerun loop becomes reseed-on-empty inside the kernel: an
empty cluster's center is re-seeded to the point farthest from all centers,
which guarantees the same invariant (k distinct non-empty clusters for
k <= #distinct points) without host loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(3, 4))
def kmeans_pp(
    key: jax.Array,
    points: jnp.ndarray,  # (N, D) float
    valid: jnp.ndarray,  # (N,) bool padding mask
    num_centers: int,
    max_iters: int = 100,
):
    """Returns (centers (K, D), assignment (N,) int32).

    With fewer valid points than K, surplus centers duplicate existing
    points (callers also mask by ``min(K, n_points)`` like the reference,
    matcher/Matcher.py:581).
    """
    n, d = points.shape
    k = num_centers
    big = jnp.float32(1e30)
    pts = jnp.where(valid[:, None], points, 0.0)

    # --- D² seeding (reference k_means.py:21-29) ---
    key, k0 = jax.random.split(key)
    probs0 = jnp.where(valid, 1.0, 0.0)
    first = jax.random.categorical(k0, jnp.log(probs0 + 1e-30))
    centers0 = jnp.zeros((k, d), jnp.float32).at[0].set(pts[first])

    def seed_step(i, carry):
        centers, key = carry
        key, kk = jax.random.split(key)
        d2 = jnp.min(
            jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, big),
            axis=1,
        )
        dist = jnp.sqrt(d2) + 1e-6
        w = jnp.where(valid, dist ** 2, 0.0)
        idx = jax.random.categorical(kk, jnp.log(w + 1e-30))
        centers = centers.at[i].set(pts[idx])
        return centers, key

    centers, key = jax.lax.fori_loop(1, k, seed_step, (centers0, key))

    # --- Lloyd iterations with reseed-on-empty ---
    def lloyd(_, centers):
        d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(valid[:, None], d2, big)
        assign = jnp.argmin(d2, axis=1)
        onehot = (
            jax.nn.one_hot(assign, k, dtype=jnp.float32) * valid[:, None].astype(jnp.float32)
        )
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ pts  # (K, D)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        # reseed empty clusters at the point farthest from any center
        far = jnp.argmax(jnp.where(valid, jnp.min(d2, axis=1), -big))
        new_centers = jnp.where(counts[:, None] > 0, new_centers, pts[far][None, :])
        return new_centers

    centers = jax.lax.fori_loop(0, max_iters, lloyd, centers)
    d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(valid[:, None], d2, big)
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return centers, assign
