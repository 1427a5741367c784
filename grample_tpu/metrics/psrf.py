"""Split-half PSRF (Gelman-Rubin) convergence diagnostic — on device.

Re-derives the reference's distance-based PSRF (``sampler/chain.go:32-92``
and ``ChainDist`` at ``:253-290``) as a batched jnp computation over
*count tensors* instead of per-variable ring-buffer replays:

  - each chain keeps two half-window count tensors [V, K] (the counts of
    the older half and the newer half of the last ConvergenceWindow
    sweeps) — maintained incrementally by the chain runtime, so no sample
    history is ever stored;
  - within-chain distance  W_c[v] = d(half1_c[v], half2_c[v])
  - between-chain distance B_c[v] = d(merged[v], half1_c[v]+half2_c[v])
  - W = (1e-8 + sum_c W_c) / m,  B = (1e-8 + sum_c B_c) * n/(m-1)
  - vhat = ((n-1)/n) W + ((m+1)/(m n)) B,  psrf = sqrt(4 vhat / (2 W))

Collapsed or evidence-fixed variables score exactly 1.0.  Count vectors
are smoothed with +1e-8 per entry before normalizing, matching the
reference's 1e-8-initialized marginals.  All chains and variables are
computed in one fused pass; with chains sharded over a mesh the
reductions over the chain axis compile to psum collectives.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

_SMOOTH = 1e-8
_EPS_TOT = 1e-12
_EPS_KL = 1e-12


def _norm(m, card_mask):
    m = jnp.where(card_mask, m, 0.0)
    tot = jnp.maximum(m.sum(axis=-1, keepdims=True), _EPS_TOT)
    return m / tot


def _measure(name: str, a, b, card_mask, cards):
    """Distance between count/probability vectors along the last axis.

    ``a``/``b`` broadcast over leading axes; normalization (with the
    1e-12 total floor) happens here, matching model/error.go semantics.
    """
    p = _norm(a, card_mask)
    q = _norm(b, card_mask)
    if name == "hellinger":
        return jnp.sqrt(((jnp.sqrt(p) - jnp.sqrt(q)) ** 2).sum(axis=-1)) / math.sqrt(2.0)
    if name == "js":
        mid = 0.5 * (p + q)

        def kl(x, y):
            x = jnp.maximum(x, _EPS_KL)
            y = jnp.maximum(y, _EPS_KL)
            return (x * jnp.log2(x / y)).sum(axis=-1)

        return 0.5 * (kl(p, mid) + kl(q, mid))
    if name == "maxabs":
        return jnp.abs(p - q).max(axis=-1)
    if name == "meanabs":
        return jnp.abs(p - q).sum(axis=-1) / jnp.maximum(cards, 1)
    raise ValueError(f"unknown measure {name!r}")


@partial(jax.jit, static_argnames=("measure",))
def chain_convergence(
    half1,  # [M, V, K] per-chain counts, older half of the window
    half2,  # [M, V, K] per-chain counts, newer half of the window
    merged,  # [V, K] merged marginal estimate (counts or probs)
    cards,  # [V] int
    converged_mask,  # [V] bool — fixed or collapsed vars (score 1.0)
    chain_mask,  # [M] bool — active chains
    cw,  # scalar — ConvergenceWindow (samples per var per window)
    measure: str = "hellinger",
):
    """Per-variable PSRF scores, shape [V] float32."""
    k = half1.shape[-1]
    card_mask = jnp.arange(k)[None, :] < cards[:, None]  # [V, K]

    h1 = half1 + _SMOOTH * card_mask
    h2 = half2 + _SMOOTH * card_mask

    within = _measure(measure, h1, h2, card_mask, cards)  # [M, V]
    chain_tot = h1 + h2
    between = _measure(measure, merged[None], chain_tot, card_mask, cards)  # [M, V]

    cmask = chain_mask[:, None].astype(within.dtype)
    m = jnp.maximum(chain_mask.sum().astype(within.dtype), 2.0)
    n = jnp.asarray(cw, within.dtype)

    w = (_SMOOTH + (within * cmask).sum(axis=0)) / m
    b = (_SMOOTH + (between * cmask).sum(axis=0)) * (n / (m - 1.0))

    vhat = ((n - 1.0) / n) * w + ((m + 1.0) / (m * n)) * b
    psrf = jnp.sqrt((4.0 * vhat) / (2.0 * w))
    return jnp.where(converged_mask, 1.0, psrf)
