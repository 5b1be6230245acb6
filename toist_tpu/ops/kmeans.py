"""Bounded-iteration k-means (Lloyd's algorithm) in JAX.

Reference: /root/reference/models/kmeans.py — Lloyd iterations until center shift^2
< 1e-4 (:62-94), euclidean or cosine distance, warm start from stored centers once the
bank is full (:54-58). The unbounded Python while loop becomes a lax.while_loop with a
max-iteration cap (SURVEY.md §7 hard part 6); empty clusters keep their previous
center (the reference's nanless behavior via its random reseeding is approximated by
keeping the center in place, which is stable for warm starts).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_dist(x: jnp.ndarray, centers: jnp.ndarray,
                   distance: str) -> jnp.ndarray:
    if distance == "euclidean":
        return jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    if distance == "cosine":
        xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-8)
        cn = centers / jnp.linalg.norm(centers, axis=-1,
                                       keepdims=True).clip(1e-8)
        return 1.0 - xn @ cn.T
    raise ValueError(distance)


def kmeans(x: jnp.ndarray, init_centers: jnp.ndarray,
           max_iters: int = 32, tol: float = 1e-4,
           distance: str = "euclidean") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [N, D], init_centers [K, D] -> (assignments [N], centers [K, D])."""

    def assign(centers):
        return jnp.argmin(_pairwise_dist(x, centers, distance), axis=-1)

    def update(centers, labels):
        K = centers.shape[0]
        onehot = jax.nn.one_hot(labels, K, dtype=x.dtype)       # [N, K]
        counts = jnp.sum(onehot, axis=0)                        # [K]
        sums = onehot.T @ x                                     # [K, D]
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, centers)

    def cond(state):
        it, centers, shift = state
        return (it < max_iters) & (shift > tol)

    def body(state):
        it, centers, _ = state
        labels = assign(centers)
        new_centers = update(centers, labels)
        # Reference convergence: (sum_k ||delta c_k||)^2 < tol (kmeans.py:77-94
        # computes center_shift = sum of per-center L2 norms, breaks on
        # center_shift ** 2 < tol).
        shift = jnp.sum(jnp.linalg.norm(new_centers - centers, axis=-1)) ** 2
        return it + 1, new_centers, shift

    _, centers, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_centers.astype(x.dtype),
                     jnp.asarray(jnp.inf, x.dtype)))
    return assign(centers), centers


def kmeans_predict(x: jnp.ndarray, centers: jnp.ndarray,
                   distance: str = "euclidean") -> jnp.ndarray:
    """Nearest-center assignment (reference kmeans.py:99-133)."""
    return jnp.argmin(_pairwise_dist(x, centers, distance), axis=-1)


def init_centers_from_bank(bank: jnp.ndarray, k: int,
                           seed: int = 0) -> jnp.ndarray:
    """Deterministic init: k distinct rows of the bank (reference random-choice
    init, kmeans.py:54-58, made reproducible)."""
    n = bank.shape[0]
    idx = (jnp.arange(k) * max(1, n // k)) % n
    return bank[idx]
