"""The Gibbs sweep compute path (pure XLA).

This is the hot loop of the whole framework — the TPU-native successor
of the reference's ``SampleVar`` inner loop (``sampler/gibbs-simple.go:
163-271``), redesigned from per-site pointer chasing to batched tensor
ops:

  - *random scan, one site at a time*  →  *chromatic systematic sweep*:
    every variable of one color class updates simultaneously across all
    chains (conditionally independent given the rest);
  - *exp + clamp + linear-scan categorical draw*  →  *Gumbel-max in log
    space*: ``argmax(logits + Gumbel)`` is an exact categorical draw,
    shift-invariant and overflow-free, so the reference's −8 shift
    stabilization is unnecessary.  The ≥1e-6 relative-probability floor
    that keeps the chain irreducible (``gibbs-simple.go:248-258``) is
    kept as ``logaddexp(logit, logsumexp + log(1e-6))``;
  - *MT19937 behind a channel* (``rand/rand.go``)  →  counter-based
    ``jax.random`` keys folded per (variant, sweep, color): parallel and
    reproducible;
  - *per-variable ring-buffer history* (``buffer/circular.go``)  →
    incremental split-half count tensors: the first half of an advance's
    sweeps accumulates into window-half 0, the rest into half 1, which
    reproduces the reference's ``ChainDist`` split exactly at the
    granularity it is ever measured (right after an AdvanceChain batch).

Everything is jit-compiled with static shape capacities; a leading
variant axis (vmap) runs all adaptive collapse variants in one kernel.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Irreducibility floor: every outcome keeps relative probability >= 1e-6
LOG_FLOOR = math.log(1e-6)
NEG = -1e30


def _conditional_logits(enc, state, vs, kdim: int):
    """Log-conditionals for vars ``vs`` given current state, all chains.

    state: [C, V+1] int32; vs: [G] int32 → logits [C, G, kdim] float32.
    """
    off = jnp.take(enc["adj_offset"], vs, axis=0)  # [G, F]
    sstr = jnp.take(enc["adj_self_stride"], vs, axis=0)  # [G, F]
    amask = jnp.take(enc["adj_mask"], vs, axis=0)  # [G, F]
    svars = jnp.take(enc["adj_scope_vars"], vs, axis=0)  # [G, F, S]
    sstrides = jnp.take(enc["adj_scope_strides"], vs, axis=0)  # [G, F, S]

    # Base table index per (chain, var, factor): the other-vars part.
    vals = jnp.take(state, svars, axis=1)  # [C, G, F, S]
    base = off[None] + (vals * sstrides[None]).sum(axis=-1)  # [C, G, F]

    ks = jnp.arange(kdim, dtype=jnp.int32)
    idx = base[..., None] + ks[None, None, None, :] * sstr[None, :, :, None]
    ent = jnp.take(enc["tables"], idx, mode="clip")  # [C, G, F, K]
    logits = (ent * amask[None, :, :, None]).sum(axis=2)  # [C, G, K]
    return logits


def _sample_color(enc, state, vs, gmask, key, kdim: int):
    """Resample all chains' values of the vars in one chromatic group."""
    logits = _conditional_logits(enc, state, vs, kdim)  # [C, G, K]
    cards_g = jnp.take(enc["cards"], vs)  # [G]
    kmask = jnp.arange(kdim, dtype=jnp.int32)[None, :] < cards_g[:, None]  # [G, K]

    logits = jnp.where(kmask[None], logits, NEG)
    # irreducibility floor (log-space equivalent of w += tot * 1e-6)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    logits = jnp.logaddexp(logits, lse + LOG_FLOOR)
    logits = jnp.where(kmask[None], logits, NEG)

    gum = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    newv = jnp.argmax(logits + gum, axis=-1).astype(state.dtype)  # [C, G]
    upd = gmask & jnp.take(enc["update_ok"], vs)  # [G]
    return newv, upd


def _advance_one(enc, state, halves, key, num_sweeps: int, half_point: int, count: bool):
    """Advance one variant's chains by ``num_sweeps`` full chromatic sweeps.

    state:  [C, V+1] int32
    halves: [2, C, V+1, K] float32 — split-half window counts (count=True)
    """
    C = state.shape[0]
    kdim = halves.shape[-1]
    nc = enc["color_vars"].shape[0]
    chain_iota = jnp.arange(C, dtype=jnp.int32)[:, None]

    def color_body(carry, ci):
        state, halves, skey, half = carry
        ckey = jax.random.fold_in(skey, ci)
        vs = enc["color_vars"][ci]  # [G]
        gmask = enc["color_mask"][ci]  # [G]
        newv, upd = _sample_color(enc, state, vs, gmask, ckey, kdim)
        old = jnp.take(state, vs, axis=1)
        merged = jnp.where(upd[None], newv, old)
        state = state.at[:, vs].set(merged, mode="drop")
        if count:
            inc = jnp.broadcast_to(upd[None].astype(halves.dtype), newv.shape)
            halves = halves.at[half, chain_iota, vs[None, :], newv].add(
                inc, mode="drop"
            )
        return (state, halves, skey, half), None

    def sweep_body(carry, si):
        state, halves = carry
        skey = jax.random.fold_in(key, si)
        half = (si >= half_point).astype(jnp.int32)
        (state, halves, _, _), _ = lax.scan(
            color_body, (state, halves, skey, half), jnp.arange(nc)
        )
        return (state, halves), None

    (state, halves), _ = lax.scan(sweep_body, (state, halves), jnp.arange(num_sweeps))
    return state, halves


@partial(
    jax.jit,
    static_argnames=("num_sweeps", "half_point", "count"),
    donate_argnums=(1, 2),
)
def advance_chains(enc, state, halves, key, num_sweeps: int, half_point: int, count: bool = True):
    """Advance all variants: the vectorized AdvanceChain.

    enc:    dict of stacked arrays, leading axis N (variants)
    state:  [N, C, V+1] int32
    halves: [N, 2, C, V+1, K] float32 (donated; zero before the window)
    key:    single PRNG key; folded per variant.

    The reference spawns one goroutine per chain and joins on a WaitGroup
    (``sampler/chain.go:197-215``); here "all chains advance in parallel"
    is a single device program over the (variant, chain) batch axes.
    """
    n = state.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    fn = partial(
        _advance_one, num_sweeps=num_sweeps, half_point=half_point, count=count
    )
    return jax.vmap(fn)(enc, state, halves, keys)


@partial(jax.jit, static_argnames=("num_chains", "kdim"))
def init_state(enc, key, num_chains: int, kdim: int, warm_marginals=None):
    """Initial chain states for all variants: [N, C, V+1] int32.

    Free vars start uniform (reference ``NewGibbsSimple``,
    ``gibbs-simple.go:101-112``); fixed vars at their evidence value.
    With ``warm_marginals`` ([N, V+1, K] probabilities) free vars are
    instead drawn from the current marginal estimate — the reference's
    warm restart after factor-graph surgery (``FunctionsChanged``,
    ``gibbs-simple.go:131-142``).
    """
    n = enc["cards"].shape[0]

    def one(cards, fixedv, key_i, warm_i):
        v1 = cards.shape[0]
        valid = jnp.arange(kdim)[None, :] < cards[:, None]  # [V+1, K]
        if warm_i is None:
            logits = jnp.where(valid, 0.0, NEG)
        else:
            logits = jnp.where(valid, jnp.log(jnp.maximum(warm_i, 1e-12)), NEG)
        gum = jax.random.gumbel(key_i, (num_chains, v1, kdim), dtype=jnp.float32)
        draw = jnp.argmax(logits[None] + gum, axis=-1).astype(jnp.int32)
        return jnp.where(fixedv[None, :] >= 0, fixedv[None, :], draw)

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    if warm_marginals is None:
        return jax.vmap(lambda c, f, k: one(c, f, k, None))(
            enc["cards"], enc["fixed"], keys
        )
    return jax.vmap(one)(enc["cards"], enc["fixed"], keys, warm_marginals)
