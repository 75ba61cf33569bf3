"""Profile likelihood over a heritability grid.

Parity: reference ``getLL`` / ``profile_LL``
(src/analysis_helpers/single_trait_analysis.jl:29-75). The reference loops
the grid on the host; here the grid is one vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.rotation import transform_rotation
from ..ops.weights import make_weights
from ..ops.wls import wls


class ProfileLL(NamedTuple):
    ll_list_null: jnp.ndarray
    ll_list_alt: jnp.ndarray


def getLL(
    y0,
    X0,
    lam,
    num_of_covar: int,
    marker_id: int,
    h2,
    *,
    prior: Tuple[float, float] = (0.0, 0.0),
    reml: bool = False,
):
    """(ll_null, ll_marker) at one h2 for rotated data.

    ``marker_id`` is the 1-based marker index like the reference
    (X0 column ``num_of_covar + marker_id`` in 1-based Julia indexing is
    ``num_of_covar + marker_id - 1`` here).
    """
    w = make_weights(h2, lam)
    X0_cov = X0[:, :num_of_covar]
    marker = X0[:, num_of_covar + marker_id - 1]
    X_design = jnp.concatenate([X0_cov, marker[:, None]], axis=1)
    ll_null = wls(y0, X0_cov, w, prior, reml=reml).ell[0]
    ll_marker = wls(y0, X_design, w, prior, reml=reml).ell[0]
    return ll_null, ll_marker


def profile_LL(
    y,
    G,
    covar,
    K,
    h2_grid,
    marker_id: int,
    *,
    prior: Tuple[float, float] = (0.0, 0.0),
    reml: bool = False,
) -> ProfileLL:
    """Null/alt log-likelihood values across ``h2_grid`` for one marker."""
    y = jnp.asarray(y)
    y = y[:, None] if y.ndim == 1 else y
    covar = jnp.asarray(covar)
    covar = covar[:, None] if covar.ndim == 1 else covar
    num_of_covar = covar.shape[1]
    rot = transform_rotation(
        y, jnp.concatenate([covar, jnp.asarray(G)], axis=1), K, add_intercept=False
    )

    def one(h2):
        return getLL(
            rot.y0, rot.X0, rot.lam, num_of_covar, marker_id, h2,
            prior=prior, reml=reml,
        )

    ll_null, ll_alt = jax.vmap(one)(jnp.asarray(h2_grid, dtype=rot.y0.dtype))
    return ProfileLL(ll_list_null=ll_null, ll_list_alt=ll_alt)
