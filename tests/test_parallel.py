"""Multi-device sharding tests on the virtual CPU mesh.

The gap SURVEY.md §4 calls out over the reference test suite: the
collective merge/PSRF paths must be testable without a pod.  Runs on
the conftest-forced multi-device CPU backend.
"""

import jax
import numpy as np
import pytest

from grample_tpu.metrics import hellinger
from grample_tpu.parallel import ShardedChainGroup, chain_mesh
from grample_tpu.pgm.discrete import DiscreteModel, Factor
from grample_tpu.pgm.exact import exact_marginals
from grample_tpu.sampler.chains import ChainGroup
from grample_tpu.sampler.collapse import collapse_var


def small_model(rng, v=4):
    factors = [Factor(f"u{i}", [i], rng.random(2) + 0.2) for i in range(v)]
    factors += [
        Factor(f"p{i}", [i, i + 1], rng.random(4) + 0.2) for i in range(v - 1)
    ]
    return DiscreteModel(type="MARKOV", cards=[2] * v, factors=factors)


def test_mesh_shapes():
    mesh = chain_mesh()
    assert set(mesh.axis_names) == {"variants", "chains"}
    assert mesh.devices.size == len(jax.devices())
    with pytest.raises(ValueError):
        chain_mesh(variant_ways=3)  # 2 or 8 devices: not divisible


def test_sharded_advance_vs_exact(rng):
    m = small_model(rng)
    truth = exact_marginals(m)
    mesh = chain_mesh()
    cdim = mesh.shape["chains"]
    g = ShardedChainGroup(
        m, chains_per_variant=64 * cdim, converge_window=100, seed=1, mesh=mesh
    )
    g.add_variant(m)
    g.add_variant(m)
    g.burn(50)
    for _ in range(4):
        g.advance()
    assert g.total_samples == g.num_chains * 4 * 100 * m.num_vars
    merged = g.merged_marginals()
    h = hellinger(merged, truth, m.cards)
    assert h.max() < 0.03


def test_sharded_matches_unsharded_semantics(rng):
    """Same API surface, same count bookkeeping, collapse override intact."""
    m = small_model(rng)
    mesh = chain_mesh()
    cdim = mesh.shape["chains"]
    g = ShardedChainGroup(
        m, chains_per_variant=8 * cdim, converge_window=50, seed=2, mesh=mesh
    )
    g.add_variant(m)
    variant, exact = collapse_var(m, 2)
    g.add_variant(variant)
    g.advance()
    merged = g.merged_marginals()
    np.testing.assert_allclose(merged[2] / merged[2].sum(), exact, rtol=1e-7)
    assert bool(g.collapsed_any()[2])
    assert g.totals[1, 2].sum() == 0  # collapsed var never sampled


def test_sharded_convergence_scores(rng):
    m = small_model(rng)
    m.apply_evidence({3: 1})
    mesh = chain_mesh()
    cdim = mesh.shape["chains"]
    g = ShardedChainGroup(
        m, chains_per_variant=32 * cdim, converge_window=100, seed=3, mesh=mesh
    )
    g.add_variant(m)
    g.add_variant(m)
    g.burn(100)
    g.advance()
    scores = g.convergence()
    assert scores.shape == (m.num_vars,)
    assert scores[3] == 1.0  # evidence-fixed scores exactly 1.0
    free = scores[:3]
    assert np.all(free > 0.5) and np.all(free < 3.0)

    # sharded PSRF must agree with the unsharded ChainGroup formula on
    # identical half-window counts
    g2 = ChainGroup(m, chains_per_variant=g.cpv, converge_window=100, seed=3)
    g2.add_variant(m)
    g2.add_variant(m)
    g2.stack = {k: np.asarray(v) for k, v in g.stack.items()}
    g2.state = g.state
    g2.halves = g.halves
    g2.totals = g.totals.copy()
    ref = g2.convergence()
    np.testing.assert_allclose(scores, ref, rtol=1e-4, atol=1e-5)


def test_sharded_cpv_divisibility():
    mesh = chain_mesh()
    if mesh.shape["chains"] == 1:
        pytest.skip("needs >1 chain-axis device")
    with pytest.raises(ValueError):
        ShardedChainGroup(
            small_model(np.random.default_rng(0)),
            chains_per_variant=mesh.shape["chains"] + 1,
            converge_window=10,
            mesh=mesh,
        )
