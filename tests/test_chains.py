"""ChainGroup runtime tests: merge semantics, PSRF, capacity growth."""

import numpy as np
import pytest

from grample_tpu.metrics import hellinger
from grample_tpu.pgm.discrete import DiscreteModel, Factor
from grample_tpu.pgm.exact import exact_marginals
from grample_tpu.sampler.chains import ChainGroup
from grample_tpu.sampler.collapse import collapse_var
from grample_tpu.uai import load_model

from tests.conftest import res_path


def small_model(rng, v=4):
    factors = [Factor(f"u{i}", [i], rng.random(2) + 0.2) for i in range(v)]
    factors += [
        Factor(f"p{i}", [i, i + 1], rng.random(4) + 0.2) for i in range(v - 1)
    ]
    return DiscreteModel(type="MARKOV", cards=[2] * v, factors=factors)


def test_advance_and_merge_vs_exact(rng):
    m = small_model(rng)
    truth = exact_marginals(m)
    g = ChainGroup(m, chains_per_variant=128, converge_window=100, seed=1)
    g.add_variant(m)
    g.add_variant(m)
    g.burn(50)
    for _ in range(4):
        g.advance()
    assert g.num_chains == 256
    assert g.total_samples == 256 * 4 * 100 * m.num_vars
    merged = g.merged_marginals()
    h = hellinger(merged, truth, m.cards)
    assert h.max() < 0.03


def test_merge_collapsed_override(rng):
    m = small_model(rng)
    g = ChainGroup(m, chains_per_variant=32, converge_window=50, seed=2)
    g.add_variant(m)
    variant, exact = collapse_var(m, 2)
    g.add_variant(variant)
    g.advance()
    merged = g.merged_marginals()
    # var 2 must be exactly the collapse marginal (normalized comparison)
    np.testing.assert_allclose(merged[2] / merged[2].sum(), exact, rtol=1e-7)
    # other vars accumulate counts from both variants
    assert merged[0].sum() > g.num_chains  # uniform seed + counts
    assert bool(g.collapsed_any()[2])
    # collapsed var never sampled
    assert g.totals[1, 2].sum() == 0


def test_convergence_scores(rng):
    m = small_model(rng)
    m.apply_evidence({3: 1})
    g = ChainGroup(m, chains_per_variant=64, converge_window=100, seed=3)
    g.add_variant(m)
    variant, _ = collapse_var(m, 1)
    g.add_variant(variant)
    g.burn(20)
    g.advance()
    psrf = g.convergence()
    assert psrf.shape == (m.num_vars,)
    assert psrf[3] == 1.0  # fixed
    assert psrf[1] == 1.0  # collapsed somewhere
    assert np.isfinite(psrf).all()
    # distance-PSRF floor is sqrt(2*(n-1)/n) ~ sqrt(2) for free vars
    free = [0, 2]
    assert (psrf[free] > 1.2).all()


def test_capacity_growth_preserves_totals(rng):
    m = small_model(rng)
    g = ChainGroup(m, chains_per_variant=16, converge_window=20, seed=4)
    g.add_variant(m)
    g.advance()
    before = g.totals[0].copy()
    assert g.slot_cap == 1
    g.add_variant(m)  # grows to 2
    assert g.slot_cap == 2
    g.add_variant(m)  # grows to 4
    assert g.slot_cap == 4
    np.testing.assert_array_equal(g.totals[0], before)
    g.advance()
    assert g.num_chains == 48
    # inactive slot contributes nothing
    assert g.totals[3].sum() == 0


def test_determinism_same_seed(rng):
    m = small_model(rng)

    def run():
        g = ChainGroup(m, chains_per_variant=32, converge_window=40, seed=7)
        g.add_variant(m)
        g.burn(10)
        g.advance()
        return g.merged_marginals()

    np.testing.assert_array_equal(run(), run())


def test_grids_group_smoke():
    m = load_model(res_path("Grids_13.uai"), use_evidence=True)
    g = ChainGroup(m, chains_per_variant=32, converge_window=30, seed=5)
    g.add_variant(m)
    g.advance()
    merged = g.merged_marginals()
    assert merged.shape == (100, 2)
    assert (merged.sum(axis=1) > 0).all()
