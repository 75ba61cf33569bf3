"""LMM fitting: 1-D heritability optimization over the rotated model.

Parity: reference ``fitlmm`` (src/lmm.jl:56-86) — minimize the negative
(RE)ML log-likelihood of the weighted model over h2 in
[max(h20-d, 0), min(h20+d, 1)] via (grid-)Brent, then refit WLS at the
optimum. Fully traceable: ``vmap(fit_lmm)`` over traits or markers batches
every Brent iteration into one device step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .brent import gridbrent
from .weights import make_weights
from .wls import WLSResult, wls, wls_ell


class LMMResult(NamedTuple):
    b: jnp.ndarray  # (p, 1) coefficients
    sigma2: jnp.ndarray  # scalar
    h2: jnp.ndarray  # scalar
    ell: jnp.ndarray  # scalar


def fit_lmm(
    y0,
    X0,
    lam,
    prior: Tuple[float, float] = (0.0, 0.0),
    *,
    reml: bool = False,
    method: str = "qr",
    optim_interval: int = 1,
    h20: float = 0.5,
    d: float = 1.0,
) -> LMMResult:
    """Fit the rotated LMM for a single trait by optimizing h2.

    Args:
      y0: (n,) or (n, 1) rotated trait.
      X0: (n, c) rotated design (covariates, or covariates + one marker).
      lam: (n,) kinship eigenvalues.
      prior: (prior_variance, prior_sample_size), static floats.
    """
    y2 = y0[:, None] if y0.ndim == 1 else y0

    def neg_ll(h2):
        w = make_weights(h2, lam)
        # likelihood-only evaluation: no coefficient solve per Brent step
        return -wls_ell(y2, X0, w, prior, reml=reml)[0][0]

    lb = max(h20 - d, 0.0)
    ub = min(h20 + d, 1.0)
    # bounds in the DATA dtype: python-float bounds resolve to the default
    # dtype, silently promoting an f32 pipeline to emulated f64 under x64
    _, h2 = gridbrent(neg_ll, lb, ub, optim_interval, dtype=lam.dtype)

    est: WLSResult = wls(y2, X0, make_weights(h2, lam), prior, reml=reml, method=method)
    return LMMResult(b=est.b, sigma2=est.sigma2[0], h2=h2, ell=est.ell[0])
