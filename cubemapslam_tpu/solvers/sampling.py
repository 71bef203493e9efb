"""Minimal-set sampling for batched RANSAC."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key: jax.Array, valid: jnp.ndarray, n_iters: int,
                        k: int) -> jnp.ndarray:
    """Draw ``n_iters`` index sets of size ``k`` without replacement from the
    valid entries of a fixed-size pool.

    The reference draws sequentially with DUtils::Random
    (Initializer.cpp:90-108); here every set is a top-k over i.i.d. uniform
    scores, so all iterations sample in parallel and deterministically from
    the key. Invalid entries get -inf score; if fewer than k valid entries
    exist the sets repeat valid indices (caller gates on enough matches).
    Returns (n_iters, k) int32.
    """
    n = valid.shape[0]
    scores = jax.random.uniform(key, (n_iters, n))
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32)
