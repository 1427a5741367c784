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


def test_collapse_conditional_matches_incident_product(rng):
    """collapse_conditional row r must equal the normalized product of
    incident factors at (var=k, rest=r) — the exact Gibbs conditional."""
    from grample_tpu.sampler.collapse import collapse_conditional

    f0 = Factor("f0", [0, 1], rng.random(4) + 0.1)
    f1 = Factor("f1", [1, 2], rng.random(6) + 0.1)
    f2 = Factor("f2", [0, 2], rng.random(6) + 0.1)  # not incident to var 1
    m = DiscreteModel(type="MARKOV", cards=[2, 2, 3], factors=[f0, f1, f2])
    rest, strides, cond = collapse_conditional(m, 1)
    np.testing.assert_array_equal(rest, [0, 2])
    np.testing.assert_array_equal(strides, [3, 1])
    t0 = f0.table.reshape(2, 2)
    t1 = f1.table.reshape(2, 3)
    for a in range(2):
        for c in range(3):
            want = t0[a, :] * t1[:, c]
            np.testing.assert_allclose(
                cond[a * 3 + c], want / want.sum(), rtol=1e-6
            )


def test_rb_mixture_beats_static_collapse(rng):
    """The RB mixture average over variant chain samples must recover the
    TRUE marginal of a collapsed var even where the reference's static
    collapse marginal is provably wrong (a non-incident factor couples
    the blanket — the test_collapse_incident_only_semantics fixture)."""
    f0 = Factor("f0", [0, 1], rng.random(4) + 0.1)
    f1 = Factor("f1", [1, 2], rng.random(6) + 0.1)
    f2 = Factor("f2", [0, 2], rng.random(6) + 0.1)
    m = DiscreteModel(type="MARKOV", cards=[2, 2, 3], factors=[f0, f1, f2])
    truth = exact_marginals(m)
    variant, static = collapse_var(m, 1)
    static_err = float(np.abs(static - truth[1, :2]).max())
    assert static_err > 1e-3  # the fixture's point

    g = ChainGroup(m, chains_per_variant=512, converge_window=32, seed=21)
    g.add_variant(variant)
    g.burn(50)
    for _ in range(8):
        g.advance(32)
        g.rb_accumulate()
    est = g.merged_marginals()
    est1 = est[1, :2] / est[1, :2].sum()
    rb_err = float(np.abs(est1 - truth[1, :2]).max())
    # 512 chains x 8 snapshots: ~5 sigma < 0.01 on a binary marginal
    assert rb_err < 0.015, (rb_err, static_err)
    assert rb_err < static_err
    # with the mixture disabled the static value comes through unchanged
    g.rb_mixture = False
    est_static = g.merged_marginals()
    np.testing.assert_allclose(est_static[1, :2], static, rtol=1e-12)


def test_rb_plain_slot_donors(rng):
    """Plain base-model slots donate RB snapshots for every collapsed
    var: the merged estimate is the chain-count-weighted blend of the
    collapsing variant's own mixture and the donors', and it recovers
    the true marginal (kelly19a estimator over the live ensemble)."""
    f0 = Factor("f0", [0, 1], rng.random(4) + 0.1)
    f1 = Factor("f1", [1, 2], rng.random(6) + 0.1)
    f2 = Factor("f2", [0, 2], rng.random(6) + 0.1)
    m = DiscreteModel(type="MARKOV", cards=[2, 2, 3], factors=[f0, f1, f2])
    truth = exact_marginals(m)
    variant, _static = collapse_var(m, 1)
    g = ChainGroup(m, chains_per_variant=256, converge_window=32, seed=31)
    g.add_variant(m)  # plain donor slot
    g.add_variant(variant)  # collapsing slot
    g.burn(50)
    for _ in range(8):
        g.advance(32)
        g.rb_accumulate()
    assert g._rbp_snaps.get(1) == 8
    from grample_tpu.sampler.chains import RB_DECAY

    decayed = g.cpv * (1 - RB_DECAY**8) / (1 - RB_DECAY)
    np.testing.assert_allclose(g._rbp_w[1], decayed, rtol=1e-12)
    key = (1, 1)
    own_w = g._rb_n[key] * g.cpv
    want = (g._rb_sum[key] / g._rb_n[key] * own_w + g._rbp_sum[1]) / (
        own_w + g._rbp_w[1]
    )
    est = g.merged_marginals()[1, :2]
    np.testing.assert_allclose(est, want, rtol=1e-9)
    assert np.abs(est / est.sum() - truth[1, :2]).max() < 0.02


def test_split_rb_main_donors(rng):
    """SplitChainGroup feeds full-width main-group states into the aux
    RB blend (rb_accumulate_external), so collapsed vars track the fast
    ensemble instead of only the reduced-width aux chains."""
    from grample_tpu.sampler.split import SplitChainGroup

    m = small_model(rng)
    truth = exact_marginals(m)
    g = SplitChainGroup(
        m, chains_per_variant=128, converge_window=16, seed=7, aux_chains=16
    )
    g.add_variant(m)
    g.add_variant(m)
    variant, _ = collapse_var(m, 2)
    g.add_variant(variant)
    g.burn(30)
    for _ in range(6):
        g.advance(16)
        g.rb_accumulate()
    from grample_tpu.sampler.chains import RB_DECAY

    # same-tick donor slots combine into ONE snapshot per tick
    assert g.aux._rbp_snaps.get(2) == 6
    decayed = 2 * 128 * (1 - RB_DECAY**6) / (1 - RB_DECAY)
    np.testing.assert_allclose(g.aux._rbp_w[2], decayed, rtol=1e-12)
    est = g.merged_marginals()[2, :2]
    est = est / est.sum()
    assert np.abs(est - truth[2, :2]).max() < 0.05


def test_burn_annealed_neutral_and_converges(rng):
    """Tempered burn-in must restore the untempered stacks bit-for-bit,
    count its sweeps, and leave chains sampling the correct posterior."""
    m = small_model(rng)
    truth = exact_marginals(m)
    g = ChainGroup(m, chains_per_variant=512, converge_window=32, seed=5)
    g.add_variant(m)
    tables_before = np.asarray(g.stack["tables"])
    g.burn_annealed(100, stages=10)
    assert g.total_sweeps == 100
    np.testing.assert_array_equal(np.asarray(g.stack["tables"]), tables_before)
    for _ in range(4):
        g.advance(64, defer=True)
    g.flush()
    est = g.merged_marginals()
    est = est / est.sum(axis=1, keepdims=True)
    h = hellinger(est, truth, m.cards)
    assert h.max() < 0.03, h


def test_rb_state_checkpoint_roundtrip(rng, tmp_path):
    """rb running sums survive save/load (cond tables re-derive lazily)."""
    from grample_tpu.sampler.checkpoint import load_checkpoint, save_checkpoint

    f0 = Factor("f0", [0, 1], rng.random(4) + 0.1)
    f1 = Factor("f1", [1, 2], rng.random(6) + 0.1)
    m = DiscreteModel(type="MARKOV", cards=[2, 2, 3], factors=[f0, f1])
    variant, _ = collapse_var(m, 1)
    g = ChainGroup(m, chains_per_variant=32, converge_window=16, seed=3)
    g.add_variant(m)  # plain slot: populates the donor accumulators too
    g.add_variant(variant)
    g.burn(10)
    g.advance(16)
    g.rb_accumulate()
    g.rb_accumulate()
    assert g._rbp_snaps.get(1) == 2
    path = str(tmp_path / "rb.npz")
    save_checkpoint(path, g)
    g2, _ = load_checkpoint(path, m)
    assert g2._rb_n == g._rb_n
    assert g2._rb_count == g._rb_count
    for k in g._rb_sum:
        np.testing.assert_allclose(g2._rb_sum[k], g._rb_sum[k], rtol=1e-12)
    assert g2._rbp_snaps == g._rbp_snaps
    assert g2._rbp_w == g._rbp_w
    for k in g._rbp_sum:
        np.testing.assert_allclose(g2._rbp_sum[k], g._rbp_sum[k], rtol=1e-12)
    np.testing.assert_allclose(
        g2.merged_marginals(), g.merged_marginals(), rtol=1e-12
    )


def test_transplant_init_and_plain_slot_states(rng):
    """add_variant(init_states=...) seeds the new slot with a subsample
    of donor rows (evidence re-pinned), and plain_slot_states() returns
    the first uncollapsed slot's states."""
    m = small_model(rng)
    g = ChainGroup(m, chains_per_variant=16, converge_window=8, seed=9)
    g.add_variant(m)
    g.burn(10)
    donor = g.plain_slot_states()
    assert donor is not None and donor.shape == (16, m.num_vars + 1)

    variant, _ = collapse_var(m, 0)
    g.add_variant(variant, init_states=donor)
    st = np.asarray(g.state[1])
    # every transplanted row must be one of the donor rows (burn_sweeps=0)
    donor_set = {tuple(r) for r in donor.tolist()}
    for row in st.tolist():
        assert tuple(row) in donor_set
    # a collapsed slot is not a transplant donor
    g2 = ChainGroup(m, chains_per_variant=16, converge_window=8, seed=9)
    g2.add_variant(variant)
    assert g2.plain_slot_states() is None
    # subsampling: more donor rows than cpv
    g3 = ChainGroup(m, chains_per_variant=8, converge_window=8, seed=9)
    g3.add_variant(variant, init_states=donor)
    st3 = np.asarray(g3.state[0])
    assert st3.shape == (8, m.num_vars + 1)
    for row in st3.tolist():
        assert tuple(row) in donor_set


def test_rb_min_snapshot_gate(rng):
    """With fewer than RB_MIN_SNAPSHOTS snapshots the static collapse
    marginal stands in merged_marginals; at the threshold the RB
    mixture average takes over."""
    from grample_tpu.sampler.chains import RB_MIN_SNAPSHOTS

    f0 = Factor("f0", [0, 1], rng.random(4) + 0.1)
    f1 = Factor("f1", [1, 2], rng.random(6) + 0.1)
    f2 = Factor("f2", [0, 2], rng.random(6) + 0.1)
    m = DiscreteModel(type="MARKOV", cards=[2, 2, 3], factors=[f0, f1, f2])
    variant, static = collapse_var(m, 1)
    g = ChainGroup(m, chains_per_variant=64, converge_window=16, seed=11)
    g.add_variant(variant)
    g.burn(10)
    g.advance(16)
    for k in range(RB_MIN_SNAPSHOTS - 1):
        g.rb_accumulate()
        np.testing.assert_allclose(
            g.merged_marginals()[1, :2], static, rtol=1e-12,
            err_msg=f"static must stand at {k + 1} snapshots",
        )
    g.rb_accumulate()
    est = g.merged_marginals()[1, :2]
    assert not np.allclose(est, static, rtol=1e-9)
    key = (0, 1)
    np.testing.assert_allclose(est, g._rb_sum[key] / g._rb_n[key], rtol=1e-12)


def test_adapt_step_transplants_from_plain_slot(rng):
    """adapt_step warm-starts new collapse variants by state transplant
    when the group's policy is "transplant" (the split-group
    architecture; mode-diversity preservation, VERDICT r4 weak #1) and
    by merged-marginal redraw on full-width groups."""
    from grample_tpu.sampler.adaptive import adapt_step
    from grample_tpu.sampler.split import SplitChainGroup

    m = small_model(rng)
    g = ChainGroup(m, chains_per_variant=32, converge_window=8, seed=13)
    assert g.adapt_init == "redraw"
    g.add_variant(m)
    g.add_variant(m)
    g.burn(20)
    g.advance(8)
    donor = {tuple(r) for r in g.plain_slot_states().tolist()}
    g.adapt_init = "transplant"  # exercise the transplant branch
    added = adapt_step(g, 1, warm_start=True)
    assert len(added) == 1
    # 2 burn sweeps ran after the transplant; verify the slot was seeded
    # from donor rows by re-adding with burn disabled via add_variant
    variant, _ = collapse_var(m, added[0])
    g2 = ChainGroup(m, chains_per_variant=32, converge_window=8, seed=13)
    g2.add_variant(m)
    g2.add_variant(variant, init_states=np.array(sorted(donor)))
    for row in np.asarray(g2.state[1]).tolist():
        assert tuple(row) in donor
    gs = SplitChainGroup(m, chains_per_variant=16, converge_window=8,
                         seed=13, aux_chains=8)
    assert gs.adapt_init == "transplant"


def test_add_variants_batched_matches_sequential(rng):
    """Batched add_variants must leave the group in the same logical
    state as sequential add_variant calls (stack rows, state shapes,
    merge semantics)."""
    m = small_model(rng)
    variant0, _ = collapse_var(m, 0)
    variant2, _ = collapse_var(m, 2)

    g1 = ChainGroup(m, chains_per_variant=16, converge_window=8, seed=7)
    g1.reserve(4)
    g1.add_variant(m)
    g1.add_variant(variant0)
    g1.add_variant(variant2)

    g2 = ChainGroup(m, chains_per_variant=16, converge_window=8, seed=7)
    g2.reserve(4)
    slots = g2.add_variants([m, variant0, variant2])
    assert slots == [0, 1, 2]
    assert g2.num_variants == g1.num_variants == 3
    for k in g1.stack:
        np.testing.assert_array_equal(
            np.asarray(g1.stack[k]), np.asarray(g2.stack[k]), err_msg=k
        )
    assert list(g2.collapsed_any()) == list(g1.collapsed_any())
    # growth mid-batch: a variant that outgrows caps triggers a restack
    g3 = ChainGroup(m, chains_per_variant=16, converge_window=8, seed=7)
    g3.add_variants([m, variant0])
    g3.advance(8)
    assert np.isfinite(g3.merged_marginals()).all()
