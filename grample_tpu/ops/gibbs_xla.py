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

TPU mapping (the part that sets the performance ceiling): the factor
topology is pre-compiled into per-(var, factor) LOCAL tables indexed by
(other-assignment, own-value) and laid out color-major (``encode.py``),
so one sweep color is three einsums and two compares —

  base   = state_f32 · W        (W: stride one-hot over vars, on the fly)
  logits = onehot(base, OA) · local_tables       (contraction on the MXU)
  state += (new − old)·upd · onehot(group_vars)  (dense update, no scatter)

There are NO gathers or scatters anywhere in the sweep: XLA/TPU lowers
those to serialized loops, which is why the naive translation is slow.
The sweep count is a *traced* scalar (``fori_loop``), so one compiled
program serves every window/burn-in size.
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


def _dense_color_logits(state_f, scope_vars, other_strides, local_tab):
    """Unmasked log-conditionals of one chromatic group: [C, G, K].

    Three dense ops, no gathers: stride one-hot → base index einsum →
    local-table contraction (the MXU matmul).  Padded factor slots hold
    all-zero local tables, so they contribute log 1 = 0 additively.
    """
    v1 = state_f.shape[1]
    oa = local_tab.shape[-2]

    # W[g,f,v] = stride of var v in (g,f)'s local radix (0 if absent)
    viota = jnp.arange(v1, dtype=jnp.int32)
    W = jnp.sum(
        (scope_vars[..., None] == viota) * other_strides[..., None].astype(jnp.float32),
        axis=2,
    )  # [G, F, V+1]
    base = jnp.einsum("cv,gfv->cgf", state_f, W)  # integer-valued f32

    onehot = (base[..., None] == jnp.arange(oa, dtype=jnp.float32)).astype(
        local_tab.dtype
    )  # [C, G, F, OA]
    return jnp.einsum(
        "cgfo,gfok->cgk", onehot, local_tab, preferred_element_type=jnp.float32
    )


def _sample_color_dense(state_f, xs, ckey):
    """Resample one chromatic group's vars across all chains — densely.

    state_f: [C, V+1] float32 (integer-valued); xs: this color's slices.
    Returns (newv [C, G] f32, U [G, V+1] f32 one-hot, updf [G] f32).
    """
    scope_vars, other_strides, local_tab, vars_g, upd, kmask = xs
    v1 = state_f.shape[1]
    viota = jnp.arange(v1, dtype=jnp.int32)

    logits = _dense_color_logits(state_f, scope_vars, other_strides, local_tab)
    logits = jnp.where(kmask[None], logits, NEG)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    logits = jnp.logaddexp(logits, lse + LOG_FLOOR)
    logits = jnp.where(kmask[None], logits, NEG)

    gum = jax.random.gumbel(ckey, logits.shape, dtype=logits.dtype)
    newv = jnp.argmax(logits + gum, axis=-1).astype(jnp.float32)  # [C, G]

    U = (vars_g[:, None] == viota[None, :]).astype(jnp.float32)  # [G, V+1]
    return newv, U, upd.astype(jnp.float32)


def _advance_one(enc, state, halves, key, num_sweeps, half_point, count: bool):
    """Advance one variant's chains by ``num_sweeps`` full chromatic sweeps.

    state:  [C, V+1] int32 (carried as f32 inside the loop)
    halves: [2, C, V+1, K] float32 — split-half window counts (count=True)
    num_sweeps / half_point: traced int scalars (no recompiles per size).
    """
    kdim = halves.shape[-1]
    nc = enc["color_vars"].shape[0]
    xs_all = (
        enc["cm_scope_vars"],
        enc["cm_other_strides"],
        enc["cm_local_tables"],
        enc["color_vars"],
        enc["cm_upd"],
        enc["cm_kmask"],
    )

    def color_body(carry, xsi):
        state_f, dense, skey = carry
        ci, xs = xsi
        newv, U, updf = _sample_color_dense(state_f, xs, jax.random.fold_in(skey, ci))
        old = jnp.einsum("cv,gv->cg", state_f, U)  # this color's current values
        state_f = state_f + jnp.einsum("cg,gv->cv", (newv - old) * updf, U)
        if count:
            ok = (newv[..., None] == jnp.arange(kdim, dtype=jnp.float32)) * updf[
                None, :, None
            ]  # [C, G, K]
            dense = dense + jnp.einsum("cgk,gv->cvk", ok, U)
        return (state_f, dense, skey), None

    def sweep_body(si, carry):
        state_f, halves = carry
        skey = jax.random.fold_in(key, si)
        dense = jnp.zeros_like(halves[0])  # [C, V+1, K]; inherits shard_map
        #                                    varying axes from halves
        (state_f, dense, _), _ = lax.scan(
            color_body,
            (state_f, dense, skey),
            (jnp.arange(nc, dtype=jnp.int32), xs_all),
        )
        if count:
            hsel = (si >= half_point).astype(halves.dtype)
            halves = halves + dense[None] * jnp.stack([1.0 - hsel, hsel])[
                :, None, None, None
            ]
        return (state_f, halves)

    state_f, halves = lax.fori_loop(
        0, num_sweeps, sweep_body, (state.astype(jnp.float32), halves)
    )
    return state_f.astype(state.dtype), halves


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
    dense color-major path above.

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
