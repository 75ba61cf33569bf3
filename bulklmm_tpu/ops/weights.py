"""Variance-component weights for the rotated LMM.

After eigen-rotation of ``K = U diag(lambda) U^T``, the error covariance of the
rotated data is proportional to ``diag(h2 * lambda + (1 - h2))``; up to scale,
observation ``i`` gets weight ``1 / (delta * lambda_i + 1)`` with
``delta = h2 / (1 - h2)``.

Parity: reference ``makeweights`` (src/lmm.jl:15-33). The reference throws on
``h2 == 1``; under jit we cannot raise on traced values, so ``make_weights``
returns +/-inf-free weights by clamping delta to a huge finite value (the
optimizer never evaluates the closed endpoint), and the eager wrappers
validate ``h2 < 1`` on concrete inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

_MAX_DELTA = 1e18


def make_weights(h2, lam):
    """Weights ``1 / (delta * lam + 1)`` with ``delta = h2 / (1 - h2)``.

    Broadcasts: ``h2`` may be scalar or batched (e.g. one per trait or per
    grid point); ``lam`` is the eigenvalue vector ``(n,)``. Output shape is
    ``broadcast(h2.shape + (n,))`` following standard numpy rules when ``h2``
    has a trailing singleton axis, or ``(n,)`` for scalar ``h2``.
    """
    h2 = jnp.asarray(h2)
    lam = jnp.asarray(lam)
    delta = h2 / (1.0 - h2)
    delta = jnp.clip(delta, -_MAX_DELTA, _MAX_DELTA)
    if h2.ndim == 0:
        return 1.0 / (delta * lam + 1.0)
    return 1.0 / (delta[..., None] * lam + 1.0)
