"""Pallas sweep kernel: correctness in interpret mode (CPU).

The kernel's RNG is a stateless counter hash (``_hash_uniform``) rather
than ``pltpu.prng_random_bits`` precisely so the same code path runs —
and can be validated — off-TPU.  On CPU the kernel executes through the
Mosaic interpreter: slow, so shapes here are tiny.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grample_tpu.metrics import hellinger
from grample_tpu.ops.gibbs_pallas import (
    _hash_uniform,
    pallas_eligible,
    pallas_stack,
    pick_block,
)
from grample_tpu.pgm.encode import compute_caps
from grample_tpu.pgm.exact import exact_marginals
from grample_tpu.sampler.chains import ChainGroup


def _grid(side=3, seed=7, card=2):
    from grample_tpu.pgm.discrete import DiscreteModel, Factor

    rng = np.random.default_rng(seed)
    v = side * side
    factors = [Factor(f"u{i}", [i], rng.random(card) + 0.2) for i in range(v)]
    for r in range(side):
        for c in range(side):
            i = r * side + c
            if c + 1 < side:
                factors.append(Factor(f"h{i}", [i, i + 1], rng.random(card * card) + 0.2))
            if r + 1 < side:
                factors.append(Factor(f"v{i}", [i, i + side], rng.random(card * card) + 0.2))
    return DiscreteModel(type="MARKOV", cards=[card] * v, factors=factors)


def _pallas_group(m, chains=128, cw=64, seed=5):
    # eligibility requires a TPU backend; use_pallas=True forces the
    # interpret path (and survives caps growth, unlike a post-hoc flag)
    g = ChainGroup(m, chains_per_variant=chains, converge_window=cw, seed=seed,
                   use_pallas=True)
    g.add_variant(m)
    assert g.use_pallas and g.pal_stack is not None
    return g


def test_hash_uniform_distribution():
    u = np.asarray(_hash_uniform(jnp.uint32(12345), 64, 128)).reshape(-1)
    assert (u >= 0).all() and (u < 1).all()
    # 8192 samples: mean within 6 sigma of 0.5 (sigma = 1/sqrt(12*8192))
    assert abs(u.mean() - 0.5) < 6 * (1 / np.sqrt(12 * u.size))
    u2 = np.asarray(_hash_uniform(jnp.uint32(12346), 64, 128)).reshape(-1)
    assert not np.array_equal(u, u2)


def test_pallas_eligibility_gates():
    m = _grid()
    caps = compute_caps(m)
    assert caps.group_cap % 8 == 0
    assert pallas_eligible(caps, platform="tpu")
    assert not pallas_eligible(caps, platform="cpu")
    assert pick_block(caps) >= 128


def test_pallas_stack_packing():
    """Packed banks: permutation consistency + incidence preservation."""
    m = _grid()
    caps = compute_caps(m)
    from grample_tpu.ops.gibbs_pallas import pal_bank_dims
    from grample_tpu.pgm.encode import encode_model

    enc = encode_model(m, caps)
    dims = pal_bank_dims([enc])
    g2, f2, g1, f1 = dims
    gg = caps.group_cap
    assert g2 + g1 == gg and g2 % 8 == 0
    pal = pallas_stack([enc], dims)
    nc = caps.color_cap
    assert pal["pal_km"].shape == (1, nc, caps.max_card, gg)
    if g2:
        assert pal["pal_wb_h"].shape == (1, nc, f2 * g2, caps.num_rows)
        assert pal["pal_lt_h"].shape == (
            1, nc, caps.oa_cap, caps.max_card, f2 * g2
        )

    # pal_oon / pal_noo are inverse on real vars
    oon, noo = pal["pal_oon"][0], pal["pal_noo"][0]
    for var in range(m.num_vars):
        assert oon[noo[var]] == var

    # every real incidence's table row survives packing, in the
    # mapped var's bank rows, with wbase columns permuted consistently
    lt = enc.sw_local_tables  # [NC, G, F, OA, K]
    real = np.abs(lt).max(axis=(3, 4)) > 0
    n_real = int(real.sum())
    packed_rows = 0
    for key in ("pal_lt_h", "pal_lt_l"):
        if key in pal:
            packed_rows += int(
                (np.abs(pal[key][0]).max(axis=(1, 2)) > 0).sum()
            )
    assert packed_rows == n_real

    # spot-check one heavy var: its packed rows' tables match the
    # original incidence tables (as multisets)
    if g2:
        for ci in range(nc):
            var = int(oon[ci * gg])  # first (highest-degree) slot
            if var >= m.num_vars:
                continue
            gold = int(enc.new_of_old[var]) - ci * gg
            orig = sorted(
                lt[ci, gold, f].ravel().tolist()
                for f in range(caps.adj_cap)
                if real[ci, gold, f]
            )
            got = sorted(
                pal["pal_lt_h"][0, ci, :, :, f * g2].ravel().tolist()
                for f in range(f2)
                if np.abs(pal["pal_lt_h"][0, ci, :, :, f * g2]).max() > 0
            )
            # pal_lt rows are [OA, K]; originals are [F, OA, K] slices
            assert got == orig, (ci, var)


def test_pallas_marginals_vs_exact():
    """The interpret-mode kernel must converge to the exact marginals."""
    m = _grid(side=3)
    truth = exact_marginals(m)
    g = _pallas_group(m, chains=128, cw=64)
    g.burn(30)
    for _ in range(6):
        g.advance(50)
    est = g.merged_marginals()
    est = est / est.sum(axis=1, keepdims=True)
    h = hellinger(est, truth, m.cards)
    # 128 chains x 300 counted sweeps ≈ 38k draws/var
    assert h.max() < 0.04, h


def test_pallas_determinism_and_counts():
    m = _grid(side=3)
    runs = []
    for _ in range(2):
        g = _pallas_group(m, chains=128, cw=32, seed=11)
        g.burn(5)
        taken = g.advance(20)
        assert taken == 20 * 128 * m.num_vars
        runs.append((np.asarray(g.state), np.asarray(g.halves)))
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])


def test_pallas_collapse_variant_grows_banks():
    """A collapse variant with a fatter incidence profile must either fit
    the stack's packed bank dims or trigger a pal restack with re-derived
    dims — never a crash or a wrong-size kernel."""
    from grample_tpu.pgm.exact import exact_marginals
    from grample_tpu.sampler.collapse import collapse_var

    m = _grid(side=3)
    g = _pallas_group(m, chains=128, cw=32)
    dims0 = g.pal_dims
    variant, _ = collapse_var(m, 4)  # center var: blanket of 4
    g.add_variant(variant, burn_sweeps=2)
    assert g.pal_stack is not None and g.use_pallas
    g.burn(10)
    for _ in range(4):
        g.advance(40)
    est = g.merged_marginals()
    est = est / est.sum(axis=1, keepdims=True)
    truth = exact_marginals(m)
    h = hellinger(est, truth, m.cards)
    assert h.max() < 0.06, (h, dims0, g.pal_dims)


def test_pallas_evidence_pinned():
    m = _grid(side=3)
    m.apply_evidence({4: 1, 0: 0})
    g = _pallas_group(m, chains=128, cw=16, seed=3)
    g.burn(4)
    g.advance(16)
    st = np.asarray(g.state)[0]
    assert (st[:, 4] == 1).all()
    assert (st[:, 0] == 0).all()
    halves = np.asarray(g.halves)[0]
    assert halves[:, :, 4].sum() == 0  # fixed vars never counted
    assert halves[:, :, 0].sum() == 0


def test_pallas_wide_oa_vs_exact():
    """Kernel correctness at OA > 32 (the rnd-mode relaxed gate): a
    collapse variant whose replacement factor has 64-row local
    incidences must converge to the exact marginals — the select-chain
    lookup and bf16 base matmul are exact up to PAL_OA_MAX."""
    from grample_tpu.pgm.discrete import DiscreteModel, Factor
    from grample_tpu.pgm.encode import caps_for_variants, encode_model
    from grample_tpu.sampler.collapse import collapse_var

    rng = np.random.default_rng(3)
    # star: center 0 with 7 binary leaves -> collapsing the center
    # yields a 7-var clique factor (128 entries, oa 64 per incidence)
    v = 8
    factors = [Factor(f"u{i}", [i], rng.random(2) + 0.3) for i in range(v)]
    factors += [
        Factor(f"e{i}", [0, i], rng.random(4) + 0.3) for i in range(1, v)
    ]
    m = DiscreteModel(type="MARKOV", cards=[2] * v, factors=factors)
    variant, _ = collapse_var(m, 0)
    caps = caps_for_variants([variant], slot_hint=1)
    assert caps.oa_cap > 32, "fixture must exercise the wide-OA path"
    assert pallas_eligible(caps, platform="tpu", oa_limit=256)
    assert not pallas_eligible(caps, platform="tpu")  # economic default

    truth = exact_marginals(m)
    g = ChainGroup(variant, chains_per_variant=64, converge_window=32,
                   seed=5, caps=caps, use_pallas=True, pallas_oa_limit=256)
    g.add_variant(variant)
    assert g.use_pallas, "wide-OA caps must ride the kernel when forced"
    g.burn(30)
    for _ in range(6):
        g.advance(32, defer=True)
    g.flush()
    est = g.merged_marginals()
    est = est / est.sum(axis=1, keepdims=True)
    free = variant.free_mask
    h = hellinger(est, truth, m.cards)[free]
    # 64 chains x 192 counted sweeps on a tree: tight convergence
    assert h.max() < 0.05, h
