"""The Gibbs sweep compute path — dense XLA, MXU-shaped.

This is the hot loop of the whole framework: the TPU-native successor
of the reference's ``SampleVar`` inner loop (``sampler/gibbs-simple.go:
163-271``), redesigned from per-site pointer chasing to batched tensor
ops.  Design deltas vs the reference:

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
    ``jax.random`` keys folded per (variant, sweep, color);
  - *per-variable ring-buffer history* (``buffer/circular.go``)  →
    incremental split-half count tensors.

TPU mapping (the part that sets the performance ceiling): inside the
sweep everything is laid out chain-minor — state ``[V+1, C]`` with the
chain axis on the 128-wide vector lanes — and each chromatic color is:

  rows   = state[scope_vars]                  (row gather, int32)
  base   = Σ_s rows·strides                   (exact int32 — never floats)
  logits = onehot(base, OA) · local_tables    (the MXU contraction)
  state  = state.at[group_vars].add(Δ)        (row scatter-add)

Per-site cost is O(blanket), matching the reference's asymptotics
(``gibbs-simple.go:186-220``) — the r1 design paid O(V) per site in a
full-V one-hot matmul and carried indices through f32 einsums (wrong
under TPU bf16 truncation, ADVICE.md r1 high).  Factors whose local
table exceeds ``encode.OA_DENSE_CAP`` (giant collapse replacements) use
a flat-table gather bank instead of the one-hot path.  The sweep count
is a *traced* scalar (``fori_loop``), so one compiled program serves
every window/burn-in size.
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
HIGHEST = lax.Precision.HIGHEST


def _color_logits(state_t, tables, xs):
    """Unmasked log-conditionals of one chromatic group: [G, K, C].

    state_t: [V+1, C] int32 (chain-minor).  Dense bank: row-gather →
    int32 base → one-hot × local-table MXU contraction.  Gather bank
    (possibly empty, static on shape): flat-table gather.  Padded dense
    slots hold all-zero local tables (contribute log 1 = 0 additively);
    padded gather slots are masked.
    """
    (scope_vars, other_strides, local_tab,
     gb_offset, gb_self_stride, gb_scope_vars, gb_scope_strides, gb_mask,
     kmask) = xs
    c = state_t.shape[1]
    kdim = local_tab.shape[-1]
    oa = local_tab.shape[-2]

    # ---- dense bank -------------------------------------------------------
    rows = jnp.take(state_t, scope_vars.reshape(-1), axis=0)
    rows = rows.reshape(scope_vars.shape + (c,))  # [G, F, S, C] int32
    base = (rows * other_strides[..., None]).sum(axis=2)  # [G, F, C] int32
    onehot = (base[:, :, None, :] == jnp.arange(oa, dtype=jnp.int32)[None, None, :, None])
    # [G, F, OA, C] — exact 0/1; contraction over (f, oa) on the MXU.
    logits = jnp.einsum(
        "gfok,gfoc->gkc",
        local_tab,
        onehot.astype(jnp.float32),
        precision=HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [G, K, C]

    # ---- gather bank (static skip when the caps hold no gather factors) ---
    if gb_offset.shape[-1] > 0:
        rows2 = jnp.take(state_t, gb_scope_vars.reshape(-1), axis=0)
        rows2 = rows2.reshape(gb_scope_vars.shape + (c,))  # [G, Fg, S, C]
        base2 = gb_offset[..., None] + (rows2 * gb_scope_strides[..., None]).sum(axis=2)
        idx = (
            base2[:, :, None, :]
            + jnp.arange(kdim, dtype=jnp.int32)[None, None, :, None]
            * gb_self_stride[:, :, None, None]
        )  # [G, Fg, K, C]
        ent = jnp.take(tables, idx, mode="clip")
        logits = logits + (ent * gb_mask[:, :, None, None]).sum(axis=1)

    return logits


def _sample_color(state_t, tables, xs, ckey):
    """Resample one chromatic group's vars across all chains.

    Returns (newv [G, C] int32, delta count contribution handled by
    caller).  ``state_t`` [V+1, C] int32.
    """
    kmask = xs[-1]
    logits = _color_logits(state_t, tables, xs)  # [G, K, C]
    km = kmask[:, :, None]
    logits = jnp.where(km, logits, NEG)
    lse = jax.nn.logsumexp(logits, axis=1, keepdims=True)
    logits = jnp.logaddexp(logits, lse + LOG_FLOOR)
    logits = jnp.where(km, logits, NEG)

    gum = jax.random.gumbel(ckey, logits.shape, dtype=logits.dtype)
    return jnp.argmax(logits + gum, axis=1).astype(jnp.int32)  # [G, C]


def _advance_one(enc, state, halves, key, num_sweeps, half_point, count: bool):
    """Advance one variant's chains by ``num_sweeps`` full chromatic sweeps.

    state:  [C, V+1] int32 (carried transposed [V+1, C] inside the loop)
    halves: [2, C, V+1, K] float32 — split-half window counts (count=True)
    num_sweeps / half_point: traced int scalars (no recompiles per size).
    """
    kdim = halves.shape[-1]
    nc = enc["color_vars"].shape[0]
    tables = enc["tables"]
    xs_all = (
        enc["color_vars"],
        enc["cm_upd"],
        (
            enc["cm_scope_vars"],
            enc["cm_other_strides"],
            enc["cm_local_tables"],
            enc["gb_offset"],
            enc["gb_self_stride"],
            enc["gb_scope_vars"],
            enc["gb_scope_strides"],
            enc["gb_mask"],
            enc["cm_kmask"],
        ),
    )
    kiota = jnp.arange(kdim, dtype=jnp.int32)

    def color_body(carry, xsi):
        state_t, dense_t, skey = carry
        ci, (vars_g, upd, xs) = xsi
        newv = _sample_color(state_t, tables, xs, jax.random.fold_in(skey, ci))
        old = jnp.take(state_t, vars_g, axis=0)  # [G, C]
        delta = jnp.where(upd[:, None], newv - old, 0)
        # Row scatter-add: padded slots target the sentinel row with Δ=0,
        # so duplicate indices are collision-free by construction.
        state_t = state_t.at[vars_g].add(delta)
        if count:
            ok = (
                (newv[:, None, :] == kiota[None, :, None])
                & upd[:, None, None]
            ).astype(dense_t.dtype)  # [G, K, C]
            dense_t = dense_t.at[vars_g].add(ok)
        return (state_t, dense_t, skey), None

    def sweep_body(si, carry):
        state_t, halves = carry
        skey = jax.random.fold_in(key, si)
        # [V+1, K, C]; fresh per sweep.  Derived from ``halves`` so it
        # inherits the shard_map varying-axes annotation (a plain zeros
        # literal would be replicated and break the scan carry type).
        dense_t = jnp.zeros_like(halves[0].transpose(1, 2, 0))
        (state_t, dense_t, _), _ = lax.scan(
            color_body,
            (state_t, dense_t, skey),
            (jnp.arange(nc, dtype=jnp.int32), xs_all),
        )
        if count:
            dense = dense_t.transpose(2, 0, 1)  # [C, V+1, K]
            hsel = (si >= half_point).astype(halves.dtype)
            halves = halves + dense[None] * jnp.stack([1.0 - hsel, hsel])[
                :, None, None, None
            ]
        return (state_t, halves)

    state_t, halves = lax.fori_loop(
        0, num_sweeps, sweep_body, (state.T, halves)
    )
    return state_t.T, halves


@partial(jax.jit, static_argnames=("count",), donate_argnums=(1, 2))
def advance_chains(enc, state, halves, key, num_sweeps, half_point, count: bool = True):
    """Advance all variants: the vectorized AdvanceChain.

    enc:    dict of stacked arrays, leading axis N (variants)
    state:  [N, C, V+1] int32
    halves: [N, 2, C, V+1, K] float32 (donated; zero before the window)
    key:    single PRNG key; folded per variant.

    The reference spawns one goroutine per chain and joins on a WaitGroup
    (``sampler/chain.go:197-215``); here "all chains advance in parallel"
    is a single device program over the (variant, chain) batch axes.
    ``num_sweeps``/``half_point`` are traced: one compile per model shape.
    """
    n = state.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    fn = partial(_advance_one, count=count)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None))(
        enc, state, halves, keys, num_sweeps, half_point
    )


def _conditional_logits(enc, state, vs, kdim: int):
    """Log-conditionals for vars ``vs`` given current state, all chains.

    Reference-shaped gather path over the var-major adjacency
    (``EncodedModel.legacy_arrays()``) — kept for exact cross-checks
    against brute-force factor evaluation; the sweep itself uses the
    color-major path above.

    state: [C, V+1] int32; vs: [G] int32 → logits [C, G, kdim] float32.
    """
    off = jnp.take(enc["adj_offset"], vs, axis=0)  # [G, F]
    sstr = jnp.take(enc["adj_self_stride"], vs, axis=0)  # [G, F]
    amask = jnp.take(enc["adj_mask"], vs, axis=0)  # [G, F]
    svars = jnp.take(enc["adj_scope_vars"], vs, axis=0)  # [G, F, S]
    sstrides = jnp.take(enc["adj_scope_strides"], vs, axis=0)  # [G, F, S]

    vals = jnp.take(state, svars, axis=1)  # [C, G, F, S]
    base = off[None] + (vals * sstrides[None]).sum(axis=-1)  # [C, G, F]

    ks = jnp.arange(kdim, dtype=jnp.int32)
    idx = base[..., None] + ks[None, None, None, :] * sstr[None, :, :, None]
    ent = jnp.take(enc["tables"], idx, mode="clip")  # [C, G, F, K]
    logits = (ent * amask[None, :, :, None]).sum(axis=2)  # [C, G, K]
    return logits


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
