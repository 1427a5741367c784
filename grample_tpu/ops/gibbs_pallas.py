"""Pallas TPU kernel: whole-window Gibbs sweeps with VMEM-resident state.

The XLA sweep (``ops/gibbs_xla.py``) pays HBM round-trips for every
per-color intermediate (base indices, one-hots, probabilities, count
updates) — measured ~2e9 site-samples/s on a v5e chip, bandwidth-bound.
This kernel keeps a chain block's state AND its split-half window counts
in VMEM across *all* sweeps of an advance window, so the only HBM
traffic per window is the initial state/topology load and the final
state/count store.  Per chromatic color (all shapes 2-D, lane dim =
chains):

  base   = dot(Wbase[ci], state)      MXU, bf16 exact (ints <= 256)
  logits = select-unroll over (OA, K) VPU, fused, + per-factor reduce
  newv   = inverse-CDF draw           VPU + on-core PRNG
  state[block], counts[block]         contiguous VMEM slice updates

Topology constants are pre-arranged f-major (row ``f*G + g``) so the
per-factor reduction is a tile-aligned leading-axis sum — G is a
multiple of 8 by construction (``encode.pick_group_cap``).

Eligibility (``pallas_eligible``): matmul sweep mode, no gather-bank
factors, OA <= 256 (bf16-exact base), and the VMEM working set within
budget.  Ineligible models use the XLA sweep — same semantics, same
layout, different engine.  The reference has no native tier at all
(SURVEY.md §2.9); this kernel is the TPU-native answer to "the hot loop
is compiled code" (``sampler/gibbs-simple.go:163-271``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLOOR = 1e-6
NEG = -1e30
#: VMEM working-set budget for the fully-resident kernel (bytes).
#: v5e has 128 MiB VMEM and the kernel raises Mosaic's scoped cap to
#: 100 MiB; the estimate in ``_vmem_estimate`` is heuristic and the chain
#: runtime falls back to the XLA sweep if Mosaic rejects the kernel.
VMEM_BUDGET = 88 * 1024 * 1024
_INV24 = float(2.0**-24)


def pallas_stack(encs) -> dict:
    """Kernel-layout constants for a list of same-caps EncodedModels.

    Derived from the ``sw_*`` sweep views:
      pal_wbase [N, NC, F*G, NVp] f32  — base rows reordered f-major
      pal_lt    [N, NC, OA, K, F*G] f32 — local-table value per (o, k, row)
      pal_km    [N, NC, K, G] f32      — in-card mask
    """
    out = {"pal_wbase": [], "pal_lt": [], "pal_km": []}
    for enc in encs:
        caps = enc.caps
        nc, gg, ff = caps.color_cap, caps.group_cap, caps.adj_cap
        nvp = caps.num_rows
        wb = enc.sw_wbase.reshape(nc, gg, ff, nvp)
        out["pal_wbase"].append(
            np.ascontiguousarray(wb.transpose(0, 2, 1, 3).reshape(nc, ff * gg, nvp))
        )
        lt = enc.sw_local_tables  # [NC, G, F, OA, K]
        out["pal_lt"].append(
            np.ascontiguousarray(
                lt.transpose(0, 3, 4, 2, 1).reshape(
                    nc, caps.oa_cap, caps.max_card, ff * gg
                )
            )
        )
        out["pal_km"].append(
            np.ascontiguousarray(enc.sw_kmask.transpose(0, 2, 1)).astype(np.float32)
        )
    return {k: np.stack(v) for k, v in out.items()}


def _vmem_estimate(caps, cb: int) -> int:
    """Rough VMEM bytes for one grid cell (working buffers + inputs)."""
    nvp, nslot = caps.num_rows, caps.num_slots
    nc, gg, ff = caps.color_cap, caps.group_cap, caps.adj_cap
    k, oa = caps.max_card, caps.oa_cap
    fg = ff * gg
    const = nc * fg * (nvp + oa * max(k, 8)) * 4 + nc * max(k, 8) * gg * 4
    work = nvp * cb * 4 + 2 * k * nslot * cb * 4  # wstate + acc scratch
    temps = (3 + k) * fg * cb * 4  # base + select/exp temporaries (est.)
    io = 2 * nvp * cb * 4 + 2 * k * (nslot + 8) * cb * 4
    return const + work + temps + io


def pallas_eligible(caps, platform: Optional[str] = None) -> bool:
    """Can the fully-VMEM-resident kernel run this model?"""
    if platform is None:
        platform = jax.default_backend()
    return (
        platform == "tpu"
        and caps.sweep_mode == "matmul"
        and caps.gfac_cap == 0
        and caps.oa_cap <= 256  # bf16-exact base indices
        and caps.max_card <= 16
        and caps.group_cap % 8 == 0
        and _vmem_estimate(caps, pick_block(caps)) <= VMEM_BUDGET
    )


def pick_block(caps) -> int:
    """Chain-block width: biggest lane-multiple within the VMEM budget."""
    for cb in (2048, 1024, 512, 256, 128):
        if _vmem_estimate(caps, cb) <= VMEM_BUDGET:
            return cb
    return 128


def _hash_uniform(counter, g, cb):
    """Counter-based uniform [G, CB] in [0, 1): murmur3-finalizer PRNG.

    Stateless and backend-independent (plain uint32 vector ops), unlike
    ``pltpu.prng_random_bits`` which silently yields zeros in interpret
    mode.  ``counter`` is a uint32 scalar unique per (variant-block,
    sweep, color); each lane mixes its own element id through two rounds
    of the murmur3 avalanche finalizer — the same construction class as
    the counter-based ``jax.random`` the XLA sweep uses.
    """
    rid = jax.lax.broadcasted_iota(jnp.uint32, (g, cb), 0)
    cidx = jax.lax.broadcasted_iota(jnp.uint32, (g, cb), 1)
    x = (rid * jnp.uint32(0x9E3779B9)) ^ (cidx * jnp.uint32(0x85EBCA6B)) ^ counter
    for _ in range(2):
        x = x ^ (x >> jnp.uint32(16))
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> jnp.uint32(13))
        x = x * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> jnp.uint32(16))
    # 24-bit mantissa-exact path; via int32 (uint32->f32 casts are
    # unsupported in Mosaic interpret mode)
    return (x >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * _INV24


def _make_kernel(nc, g, f, oa, k, nvp, nslot, cb, count: bool):
    fg = f * g

    def kernel(seed_ref, ns_ref, hp_ref, state_ref, wbase_ref, lt_ref, km_ref,
               state_out_ref, counts_out_ref, wstate_ref, acc_ref):
        cell = (
            seed_ref[0, 0]
            + 65537 * pl.program_id(0)
            + 257 * pl.program_id(1)
        ).astype(jnp.uint32)
        wstate_ref[:, :] = state_ref[0]
        if count:
            acc_ref[:, :, :, :] = jnp.zeros((2, k, nslot, cb), jnp.float32)

        def sweep(si, carry):
            hsel = (si >= hp_ref[0, 0]).astype(jnp.int32)
            for ci in range(nc):
                st = wstate_ref[:, :]
                base = jnp.dot(
                    wbase_ref[0, ci].astype(jnp.bfloat16),
                    st.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # [FG, CB], exact small ints
                logits = []
                masks = []
                for kk in range(k):
                    # select-chain lookup: base is a local mixed-radix
                    # index, always in [0, OA), so the last row is the
                    # default and needs no comparison — one select per
                    # remaining row instead of a where+add per row
                    accv = jnp.broadcast_to(
                        lt_ref[0, ci, oa - 1, kk, :].reshape(fg, 1), (fg, cb)
                    )
                    for o in range(oa - 1):
                        ltc = lt_ref[0, ci, o, kk, :].reshape(fg, 1)
                        accv = jnp.where(base == float(o), ltc, accv)
                    lg = accv.reshape(f, g, cb).sum(axis=0)  # [G, CB]
                    mk = km_ref[0, ci, kk, :].reshape(g, 1)
                    masks.append(mk)
                    logits.append(jnp.where(mk > 0.0, lg, NEG))
                mx = logits[0]
                for kk in range(1, k):
                    mx = jnp.maximum(mx, logits[kk])
                ps = []
                tot = jnp.zeros((g, cb), jnp.float32)
                for kk in range(k):
                    p = jnp.exp(logits[kk] - mx)
                    ps.append(p)
                    tot = tot + p
                tot2 = jnp.zeros((g, cb), jnp.float32)
                for kk in range(k):
                    # irreducibility floor (reference gibbs-simple.go:248-258)
                    ps[kk] = (ps[kk] + tot * FLOOR) * masks[kk]
                    tot2 = tot2 + ps[kk]
                counter = cell + jnp.uint32(2654435761) * (
                    si.astype(jnp.uint32) * jnp.uint32(nc) + jnp.uint32(ci)
                )
                unif = _hash_uniform(counter, g, cb)
                u = unif * tot2
                run = jnp.zeros((g, cb), jnp.float32)
                newv = jnp.zeros((g, cb), jnp.float32)
                for kk in range(k - 1):
                    run = run + ps[kk]
                    newv = newv + (u > run).astype(jnp.float32)
                wstate_ref[ci * g:(ci + 1) * g, :] = newv
                if count:
                    for kk in range(k):
                        cnt = (newv == float(kk)).astype(jnp.float32)
                        cur = acc_ref[hsel, kk, ci * g:(ci + 1) * g, :]
                        acc_ref[hsel, kk, ci * g:(ci + 1) * g, :] = cur + cnt
            return carry

        lax.fori_loop(0, ns_ref[0, 0], sweep, 0)
        state_out_ref[0] = wstate_ref[:, :]
        if count:
            counts_out_ref[0, :, :, :nslot, :] = acc_ref[:, :, :, :]
            counts_out_ref[0, :, :, nslot:, :] = jnp.zeros(
                (2, k, counts_out_ref.shape[3] - nslot, cb), jnp.float32
            )

    return kernel


def _pallas_window(pal, state_p, seed, num_sweeps, half_point, count: bool,
                   nc, g, f, oa, k, nvp, nslot, cb):
    """Run one advance window for all variants: grid (N, C/CB)."""
    n, _, c = state_p.shape
    nb = c // cb
    smem = pl.BlockSpec((1, 1), lambda ni, bi: (0, 0), memory_space=pltpu.SMEM)
    kernel = _make_kernel(nc, g, f, oa, k, nvp, nslot, cb, count)
    out_shapes = (
        jax.ShapeDtypeStruct((n, nvp, c), jnp.float32),
        jax.ShapeDtypeStruct((n, 2, k, nslot + 8, c), jnp.float32),
    )
    scalar = lambda x: jnp.asarray(x, jnp.int32).reshape(1, 1)
    state_out, counts = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            smem,
            smem,
            smem,
            pl.BlockSpec((1, nvp, cb), lambda ni, bi: (ni, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, f * g, nvp), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, oa, k, f * g), lambda ni, bi: (ni, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, k, g), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nvp, cb), lambda ni, bi: (ni, 0, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k, nslot + 8, cb),
                         lambda ni, bi: (ni, 0, 0, 0, bi),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nvp, cb), jnp.float32),
            pltpu.VMEM((2, k, nslot, cb), jnp.float32),
        ],
        out_shape=out_shapes,
        input_output_aliases={3: 0},
        # raise Mosaic's 16M default scoped-vmem cap: v5e has 128M VMEM
        # and the working set is bounded by VMEM_BUDGET at block choice
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        scalar(seed),
        scalar(num_sweeps),
        scalar(half_point),
        state_p,
        pal["pal_wbase"],
        pal["pal_lt"],
        pal["pal_km"],
    )
    return state_out, counts


@partial(jax.jit, static_argnames=("count", "cb"), donate_argnums=(2, 3))
def advance_chains_pallas(enc, pal, state, halves, key, num_sweeps, half_point,
                          count: bool = True, cb: int = 1024):
    """Drop-in for ``gibbs_xla.advance_chains`` on eligible models.

    enc/pal: stacked dicts (leading axis N); state [N, C, V+1] int32;
    halves [N, 2, C, V+1, K] f32 (window counts are ADDED).  The layout
    permutation and the slot->variable count mapping happen in XLA around
    the kernel, once per window.
    """
    n, c, _ = state.shape
    if c % cb != 0 or c < cb:
        raise ValueError(f"chain count {c} must be a positive multiple of block {cb}")
    nc, k, g = pal["pal_km"].shape[1:]
    fg = pal["pal_wbase"].shape[2]
    f = fg // g
    oa = pal["pal_lt"].shape[2]
    nvp = pal["pal_wbase"].shape[3]
    nslot = nc * g

    # permute into the color-contiguous device layout (see pgm/encode.py)
    state_p = jax.vmap(
        lambda st, oon: jnp.take(st.T, oon, axis=0).astype(jnp.float32)
    )(state, enc["old_of_new"])

    seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
    state_p, counts = _pallas_window(
        pal, state_p, seed, num_sweeps, half_point, count,
        nc, g, f, oa, k, nvp, nslot, cb,
    )

    state_out = jax.vmap(
        lambda sp, noo: jnp.take(sp, noo, axis=0).astype(jnp.int32).T
    )(state_p, enc["new_of_old"])

    if count:
        # counts [N, 2, K, NSLOT+8, C]: slot -> old var (zero rows beyond
        # nslot serve the ungrouped vars), then to halves layout
        def map_counts(cn, soo):
            mapped = jnp.take(cn, soo, axis=2)  # [2, K, V+1, C]
            return mapped.transpose(0, 3, 2, 1)  # [2, C, V+1, K]

        halves = halves + jax.vmap(map_counts)(counts, enc["slot_of_old"])
    return state_out, halves
