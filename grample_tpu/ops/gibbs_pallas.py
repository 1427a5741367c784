"""Pallas TPU kernel: whole-window Gibbs sweeps with VMEM-resident state.

The XLA sweep (``ops/gibbs_xla.py``) pays HBM round-trips for every
per-color intermediate (base indices, one-hots, probabilities, count
updates) — measured ~2e9 site-samples/s on a v5e chip, bandwidth-bound.
This kernel keeps a chain block's state AND its split-half window counts
in VMEM across *all* sweeps of an advance window, so the only HBM
traffic per window is the initial state/topology load and the final
state/count store.  Per chromatic color (all shapes 2-D, lane dim =
chains):

  base   = dot(Wbank[ci], state)      MXU, bf16 exact (ints <= 256)
  logits = select-unroll over (OA, K) VPU, fused, + per-factor reduce
  newv   = inverse-CDF draw           VPU + on-core PRNG
  state[block], counts[block]         contiguous VMEM slice updates

**Incidence packing (two banks).**  The shared encode pads every
variable to ``adj_cap`` factor slots, but real incidence counts are
skewed (Promedus_19: mean 1.4, max 6, adj_cap 8 — 3.6x padding), and
the kernel's cost is proportional to rows of the ``[rows, CB]``
intermediates on BOTH pipelines (the base matmul on the MXU and the
select/reduce passes on the VPU, which Mosaic tile-pipelines against
each other).  So ``pallas_stack`` re-sorts each color group by
descending real-incidence count (a kernel-private permutation — the
shared color-contiguous layout is untouched) and packs incidences into
two f-major banks:

  heavy bank  [F2 * G2]  — the G2 highest-degree vars, F2 = max degree
  light bank  [F1 * G1]  — the rest (G1 = G - G2), F1 slots each

Bank splits are chosen by :func:`pal_bank_dims` to minimize total rows
(measured 2.4x fewer rows on Promedus_19, 5x on Alchemy_11).  Rows
whose local table is identically zero contribute nothing to any
conditional (log-space) and are dropped.  Per-variable sums stay
tile-aligned leading-axis reductions because G2/G1 are multiples of 8
and each bank is f-major (row ``f*Gb + g``).

Eligibility (``pallas_eligible``): matmul sweep mode, no gather-bank
factors, OA <= 256 (bf16-exact base), and the VMEM working set within
budget.  Ineligible models use the XLA sweep — same semantics, same
layout, different engine.  The reference has no native tier at all
(SURVEY.md §2.9); this kernel is the TPU-native answer to "the hot loop
is compiled code" (``sampler/gibbs-simple.go:163-271``).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

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


class PalDimsError(ValueError):
    """A variant's incidence profile exceeds the stack's bank dims."""


def _incidence_degrees(enc) -> np.ndarray:
    """[NC, G] real-incidence count per (color, group slot).

    An incidence whose local table is identically zero is a constant-1
    factor in log space: it adds the same value (0) to every outcome's
    logit and cannot affect the conditional — dropped from the banks.
    """
    lt = enc.sw_local_tables  # [NC, G, F, OA, K]
    return (np.abs(lt).max(axis=(3, 4)) > 0).sum(axis=2)


def pal_bank_dims(encs) -> Tuple[int, int, int, int]:
    """Pick ``(g2, f2, g1, f1)`` minimizing packed rows over all encs."""
    G = encs[0].caps.group_cap
    d = np.concatenate([_incidence_degrees(e) for e in encs], axis=0)
    f2 = int(d.max(initial=0))
    if f2 == 0:
        return (0, 0, G, 0)
    best = None
    for f1 in range(f2 + 1):
        g2 = int(-(-int((d > f1).sum(axis=1).max(initial=0)) // 8) * 8)
        g2 = min(g2, G)
        if g2 >= G:
            cand = (f2 * G, (G, f2, 0, 0))
        else:
            cand = (f2 * g2 + f1 * (G - g2), (g2, f2, G - g2, f1))
        if best is None or cand[0] < best[0]:
            best = cand
    return best[1]


def pallas_stack(encs, dims: Optional[Tuple[int, int, int, int]] = None) -> dict:
    """Kernel-layout constants for a list of same-caps EncodedModels.

    Emits (leading axis N = len(encs)):
      pal_wb_h/pal_wb_l [N, NC, Fb*Gb, NVp] f32 — packed base matrices
      pal_lt_h/pal_lt_l [N, NC, OA, K, Fb*Gb] f32 — packed table rows
      pal_km   [N, NC, K, G]  f32 — in-card mask, kernel var order
      pal_oon  [N, NVp] int32 — kernel row -> old var id
      pal_noo  [N, V+1] int32 — old var id -> kernel row
      pal_soo  [N, V+1] int32 — old var id -> kernel count slot

    The kernel-private var order sorts each color group by descending
    real-incidence degree so the heavy bank is a g-prefix; empty banks
    (``g2==0`` or ``f1==0``) emit no arrays.  Raises
    :class:`PalDimsError` when an enc does not fit ``dims`` (callers
    re-derive dims and restack).
    """
    if dims is None:
        dims = pal_bank_dims(encs)
    g2, f2, g1, f1 = dims
    caps = encs[0].caps
    nc, G, F = caps.color_cap, caps.group_cap, caps.adj_cap
    nvp, oa, k = caps.num_rows, caps.oa_cap, caps.max_card
    banks = []  # (key_suffix, fb, gb, g_offset)
    if g2 and f2:
        banks.append(("h", f2, g2, 0))
    if g1 and f1:
        banks.append(("l", f1, g1, g2))
    out = {f"pal_wb_{s}": [] for s, _, _, _ in banks}
    out.update({f"pal_lt_{s}": [] for s, _, _, _ in banks})
    out.update(pal_km=[], pal_oon=[], pal_noo=[], pal_soo=[])

    for enc in encs:
        lt = enc.sw_local_tables  # [NC, G, F, OA, K]
        real = np.abs(lt).max(axis=(3, 4)) > 0  # [NC, G, F]
        deg = real.sum(axis=2)  # [NC, G]
        perm = np.argsort(-deg, axis=1, kind="stable")  # [NC, G]
        sd = np.take_along_axis(deg, perm, axis=1)
        if sd.max(initial=0) > f2 or (g1 and (sd[:, g2:] > f1).any()):
            raise PalDimsError(
                f"variant incidence profile (max {int(sd.max(initial=0))}, "
                f"heavy {int((deg > f1).sum(axis=1).max(initial=0))}) "
                f"exceeds pal bank dims {dims}"
            )

        shared_of_pal = np.arange(nvp, dtype=np.int32)
        for ci in range(nc):
            shared_of_pal[ci * G:(ci + 1) * G] = ci * G + perm[ci]
        pal_of_shared = np.empty_like(shared_of_pal)
        pal_of_shared[shared_of_pal] = np.arange(nvp, dtype=np.int32)
        out["pal_oon"].append(enc.old_of_new[shared_of_pal])
        out["pal_noo"].append(pal_of_shared[enc.new_of_old].astype(np.int32))
        nslot = nc * G
        soo = enc.slot_of_old  # grouped slots coincide with rows < nslot
        out["pal_soo"].append(
            np.where(soo < nslot, pal_of_shared[np.minimum(soo, nvp - 1)],
                     nslot).astype(np.int32)
        )

        wb4 = (
            None if enc.sw_wbase is None
            else enc.sw_wbase.reshape(nc, G, F, nvp)
        )
        wbB = {s: np.zeros((nc, fb * gb, nvp), np.float32)
               for s, fb, gb, _ in banks}
        ltB = {s: np.zeros((nc, oa, k, fb * gb), np.float32)
               for s, fb, gb, _ in banks}
        for ci in range(nc):
            real_s = real[ci][perm[ci]]  # [G, F], kernel var order
            pos = np.cumsum(real_s, axis=1) - 1  # packed f position
            gidx, fidx = np.nonzero(real_s)
            for s, fb, gb, off in banks:
                sel = (gidx >= off) & (gidx < off + gb)
                rows = pos[gidx[sel], fidx[sel]] * gb + (gidx[sel] - off)
                src_g = perm[ci][gidx[sel]]
                if wb4 is not None:
                    wbB[s][ci, rows] = wb4[ci, src_g, fidx[sel]][
                        :, shared_of_pal
                    ]
                # [n_inc, OA, K] -> rows of [OA, K, Fb*Gb]
                ltB[s][ci, :, :, rows] = lt[ci, src_g, fidx[sel]].astype(
                    np.float32
                )
        for s, _, _, _ in banks:
            out[f"pal_wb_{s}"].append(wbB[s])
            out[f"pal_lt_{s}"].append(ltB[s])
        km = enc.sw_kmask  # [NC, G, K]
        out["pal_km"].append(
            np.stack([km[ci][perm[ci]].T for ci in range(nc)]).astype(
                np.float32
            )
        )
    return {kk: np.stack(v) for kk, v in out.items()}


def _vmem_estimate(caps, cb: int, fg: Optional[int] = None) -> int:
    """Rough VMEM bytes for one grid cell (working buffers + inputs).

    By default uses the padded ``adj_cap * group_cap`` row count — an
    upper bound on the packed banks, so eligibility/block choice stay
    conservative.  ``fg`` overrides it with the ACTUAL packed bank rows
    (``pal_bank_dims``) once encodings exist: skewed-incidence models
    (Promedus: mean degree 1.4, adj_cap 6-8) pack 2-5x tighter than the
    padded bound, flipping borderline caps into eligibility."""
    nvp, nslot = caps.num_rows, caps.num_slots
    nc, gg, ff = caps.color_cap, caps.group_cap, caps.adj_cap
    k, oa = caps.max_card, caps.oa_cap
    if fg is None:
        fg = ff * gg
    const = nc * fg * (nvp + oa * max(k, 8)) * 4 + nc * max(k, 8) * gg * 4
    work = nvp * cb * 4 + 2 * k * nslot * cb * 4  # wstate + acc scratch
    temps = (3 + k) * fg * cb * 4  # base + select/exp temporaries (est.)
    io = 2 * nvp * cb * 4 + 2 * k * (nslot + 8) * cb * 4
    return const + work + temps + io


#: Correctness bound of the kernel's bf16 base matmul: local mixed-radix
#: indices (and stride entries) up to 256 are bf16-exact.
PAL_OA_MAX = 256

#: OA at or below which the table-lookup select chain is fully unrolled
#: (best codegen); above it a counted loop with dynamic VMEM indexing
#: keeps the Mosaic program size bounded (see _make_kernel).
PAL_OA_UNROLL = 32


def pallas_eligible(
    caps, platform: Optional[str] = None, oa_limit: int = 32,
    fg: Optional[int] = None,
) -> bool:
    """Can the fully-VMEM-resident kernel run this model?

    ``oa_limit`` is the ECONOMIC gate on the select-chain table lookup
    (O(OA) VPU passes per row): 32 by default, where the kernel beats
    the XLA one-hot MXU path.  Callers may raise it up to
    :data:`PAL_OA_MAX` (the bf16-exactness bound) when the XLA
    alternative is worse anyway — the rnd/collapsed sampler does, whose
    XLA configurations ran 50-250x below plain and carried every
    observed TPU-worker crash class (r3-r5).  ``fg`` refines the VMEM
    estimate with packed bank rows (see ``_vmem_estimate``)."""
    if platform is None:
        platform = jax.default_backend()
    return (
        platform == "tpu"
        and caps.sweep_mode == "matmul"
        and caps.gfac_cap == 0
        and caps.oa_cap <= min(oa_limit, PAL_OA_MAX)
        and caps.max_card <= 16
        and caps.group_cap % 8 == 0
        and _vmem_estimate(caps, pick_block(caps, fg), fg) <= VMEM_BUDGET
    )


def pick_block(caps, fg: Optional[int] = None,
               max_cb: Optional[int] = None) -> int:
    """Chain-block width: biggest lane-multiple within the VMEM budget.

    ``max_cb`` bounds the block by the caller's local chain width — a
    block wider than the chains-per-variant can never divide it, and
    until r5 that silently failed the ``local % block == 0`` eligibility
    check for every adaptive group at 1024 chains/slot (block 2048),
    demoting their whole run to the XLA sweep."""
    for cb in (2048, 1024, 512, 256, 128):
        if max_cb is not None and cb > max_cb:
            continue
        if _vmem_estimate(caps, cb, fg) <= VMEM_BUDGET:
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


def _make_kernel(nc, g, oa, k, nvp, nslot, cb, banks, count: bool):
    """banks: list of (fb, gb, g_offset) — heavy first, then light."""

    def kernel(seed_ref, ns_ref, hp_ref, state_ref, *refs):
        nb = len(banks)
        wb_refs = refs[:nb]
        lt_refs = refs[nb:2 * nb]
        km_ref = refs[2 * nb]
        state_out_ref, counts_out_ref, wstate_ref, acc_ref = refs[2 * nb + 1:]
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
                bases = [
                    jnp.dot(
                        wb_refs[bi][0, ci].astype(jnp.bfloat16),
                        st.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )  # [Fb*Gb, CB], exact small ints
                    for bi in range(nb)
                ]
                logits = []
                masks = []
                for kk in range(k):
                    parts = []
                    for bi, (fb, gb, _off) in enumerate(banks):
                        # select-chain lookup: base is a local mixed-
                        # radix index, always in [0, OA), so the last
                        # row is the default and needs no comparison.
                        # Small OA unrolls (fastest); large OA (the
                        # rnd-mode relaxed gate, up to PAL_OA_MAX) uses
                        # a counted loop with dynamic VMEM indexing —
                        # an unrolled OA 128 x K 4 x NC 9 chain emits
                        # ~9000 ops per sweep body and stalls Mosaic
                        # compilation for tens of minutes (r5).
                        accv = jnp.broadcast_to(
                            lt_refs[bi][0, ci, oa - 1, kk, :].reshape(
                                fb * gb, 1
                            ),
                            (fb * gb, cb),
                        )
                        if oa <= PAL_OA_UNROLL:
                            for o in range(oa - 1):
                                ltc = lt_refs[bi][0, ci, o, kk, :].reshape(
                                    fb * gb, 1
                                )
                                accv = jnp.where(
                                    bases[bi] == float(o), ltc, accv
                                )
                        else:
                            ref, base = lt_refs[bi], bases[bi]

                            def sel(o, acc, ref=ref, base=base, ci=ci,
                                    kk=kk, fb=fb, gb=gb):
                                ltc = ref[0, ci, o, kk, :].reshape(
                                    fb * gb, 1
                                )
                                return jnp.where(
                                    base == o.astype(jnp.float32), ltc, acc
                                )

                            accv = lax.fori_loop(0, oa - 1, sel, accv)
                        parts.append(
                            accv.reshape(fb, gb, cb).sum(axis=0)  # [Gb, CB]
                        )
                    # assemble [G, CB] in kernel var order: heavy prefix,
                    # light suffix, zero rows for uncovered spans
                    covered = sum(gb for _, gb, _ in banks)
                    if covered < g:
                        parts.append(jnp.zeros((g - covered, cb), jnp.float32))
                    lg = parts[0] if len(parts) == 1 else jnp.concatenate(
                        parts, axis=0
                    )
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
                   nc, g, oa, k, nvp, nslot, cb, banks):
    """Run one advance window for all variants: grid (N, C/CB)."""
    n, _, c = state_p.shape
    nb = c // cb
    smem = pl.BlockSpec((1, 1), lambda ni, bi: (0, 0), memory_space=pltpu.SMEM)
    kernel = _make_kernel(nc, g, oa, k, nvp, nslot, cb, banks, count)
    out_shapes = (
        jax.ShapeDtypeStruct((n, nvp, c), jnp.float32),
        jax.ShapeDtypeStruct((n, 2, k, nslot + 8, c), jnp.float32),
    )
    scalar = lambda x: jnp.asarray(x, jnp.int32).reshape(1, 1)
    bank_keys = [s for s, in_use in (("h", "pal_wb_h" in pal),
                                     ("l", "pal_wb_l" in pal)) if in_use]
    wb_inputs = [pal[f"pal_wb_{s}"] for s in bank_keys]
    lt_inputs = [pal[f"pal_lt_{s}"] for s in bank_keys]
    in_specs = [smem, smem, smem,
                pl.BlockSpec((1, nvp, cb), lambda ni, bi: (ni, 0, bi),
                             memory_space=pltpu.VMEM)]
    for wb in wb_inputs:
        fbgb = wb.shape[2]
        in_specs.append(
            pl.BlockSpec((1, nc, fbgb, nvp), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    for lt in lt_inputs:
        fbgb = lt.shape[4]
        in_specs.append(
            pl.BlockSpec((1, nc, oa, k, fbgb), lambda ni, bi: (ni, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((1, nc, k, g), lambda ni, bi: (ni, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    state_out, counts = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=in_specs,
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
        *wb_inputs,
        *lt_inputs,
        pal["pal_km"],
    )
    return state_out, counts


@partial(jax.jit, static_argnames=("count", "cb", "dims"),
         donate_argnums=(1, 2))
def advance_chains_pallas(pal, state, halves, key, num_sweeps, half_point,
                          count: bool = True, cb: int = 1024,
                          dims: Tuple[int, int, int, int] = ()):
    """Drop-in for ``gibbs_xla.advance_chains`` on eligible models.

    pal: stacked dict (leading axis N, see ``pallas_stack``); state
    [N, C, V+1] int32; halves [N, 2, C, V+1, K] f32 (window counts are
    ADDED); dims: the stack's ``pal_bank_dims``.  The kernel-order
    permutation and the slot->variable count mapping happen in XLA
    around the kernel, once per window.
    """
    n, c, _ = state.shape
    if c % cb != 0 or c < cb:
        raise ValueError(f"chain count {c} must be a positive multiple of block {cb}")
    nc, k, g = pal["pal_km"].shape[1:]
    nvp = pal["pal_oon"].shape[1]
    nslot = nc * g
    g2, f2, g1, f1 = dims
    banks = []
    if "pal_wb_h" in pal:
        banks.append((f2, g2, 0))
    if "pal_wb_l" in pal:
        banks.append((f1, g1, g2))
    oa = (pal.get("pal_lt_h", pal.get("pal_lt_l"))).shape[2] if banks else 1

    # permute into the kernel's packed device layout
    state_p = jax.vmap(
        lambda st, oon: jnp.take(st.T, oon, axis=0).astype(jnp.float32)
    )(state, pal["pal_oon"])

    seed = jax.random.bits(key, dtype=jnp.uint32).astype(jnp.int32)
    state_p, counts = _pallas_window(
        pal, state_p, seed, num_sweeps, half_point, count,
        nc, g, oa, k, nvp, nslot, cb, banks,
    )

    state_out = jax.vmap(
        lambda sp, noo: jnp.take(sp, noo, axis=0).astype(jnp.int32).T
    )(state_p, pal["pal_noo"])

    if count:
        # counts [N, 2, K, NSLOT+8, C]: slot -> old var (zero rows beyond
        # nslot serve the ungrouped vars), then to halves layout
        def map_counts(cn, soo):
            mapped = jnp.take(cn, soo, axis=2)  # [2, K, V+1, C]
            return mapped.transpose(0, 3, 2, 1)  # [2, C, V+1, K]

        halves = halves + jax.vmap(map_counts)(counts, pal["pal_soo"])
    return state_out, halves
