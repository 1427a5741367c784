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
    g = ChainGroup(m, chains_per_variant=chains, converge_window=cw, seed=seed)
    # eligibility requires a TPU backend; force the interpret path
    g.use_pallas = True
    g.pal_block = 128
    g.add_variant(m)
    assert g.pal_stack is not None
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


def test_pallas_stack_shapes():
    m = _grid()
    caps = compute_caps(m)
    from grample_tpu.pgm.encode import encode_model

    enc = encode_model(m, caps)
    pal = pallas_stack([enc])
    nc, gg, ff = caps.color_cap, caps.group_cap, caps.adj_cap
    assert pal["pal_wbase"].shape == (1, nc, ff * gg, caps.num_rows)
    assert pal["pal_lt"].shape == (1, nc, caps.oa_cap, caps.max_card, ff * gg)
    assert pal["pal_km"].shape == (1, nc, caps.max_card, gg)
    # f-major row order: row f*G+g must equal sw_wbase row g*F+f
    wb = enc.sw_wbase.reshape(nc, gg, ff, caps.num_rows)
    for f in range(ff):
        for g in range(0, gg, 3):
            np.testing.assert_array_equal(
                pal["pal_wbase"][0, :, f * gg + g], wb[:, g, f]
            )


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
