"""Model core tests: naming, normalization, validation, coloring, encoding."""

import numpy as np
import pytest

from grample_tpu.pgm.coloring import color_graph, color_groups, moral_adjacency, verify_coloring
from grample_tpu.pgm.discrete import (
    DiscreteModel,
    Factor,
    letter26,
    norm_marginal,
    norm_marginals,
    table_strides,
)
from grample_tpu.pgm.encode import compute_caps, encode_model, stack_variants

from tests.conftest import res_path


def make_vanilla():
    """In-memory 2-var/2-factor fixture (the model_test.go 'vanilla' trick)."""
    return DiscreteModel(
        type="MARKOV",
        cards=[2, 3],
        factors=[
            Factor("func-0", [0], np.array([1.0, 2.0])),
            Factor("func-1", [0, 1], np.arange(1.0, 7.0)),
        ],
    )


def test_letter26():
    assert letter26(0) == "A"
    assert letter26(1) == "B"
    assert letter26(25) == "Z"
    assert letter26(26) == "AA"
    assert letter26(27) == "AB"
    assert letter26(701) == "ZZ"
    assert letter26(702) == "AAA"


def test_table_strides():
    np.testing.assert_array_equal(table_strides([2, 3, 4]), [12, 4, 1])
    np.testing.assert_array_equal(table_strides([5]), [1])


def test_norm_marginal():
    np.testing.assert_allclose(norm_marginal(np.array([2.0, 2.0]), 2), [0.5, 0.5])
    np.testing.assert_allclose(norm_marginal(np.array([0.0, 0.0]), 2), [0.5, 0.5])
    np.testing.assert_allclose(norm_marginal(np.array([9.0]), 1), [1.0])
    m = norm_marginals(np.array([[2.0, 2.0, 0.0], [0.0, 0.0, 0.0]]), np.array([2, 3]))
    np.testing.assert_allclose(m[0], [0.5, 0.5, 0.0])
    np.testing.assert_allclose(m[1], [1 / 3, 1 / 3, 1 / 3])


def test_model_check():
    m = make_vanilla()
    m.check()
    bad = make_vanilla()
    bad.factors[1].table = bad.factors[1].table[:-1]
    with pytest.raises(ValueError):
        bad.check()
    bad = make_vanilla()
    bad.fixed[:] = [0, 1]  # all fixed
    with pytest.raises(ValueError):
        bad.check()
    bad = make_vanilla()
    bad.factors[1].name = "func-0"  # dup name
    with pytest.raises(ValueError):
        bad.check()


def test_evidence_application():
    m = make_vanilla()
    m.apply_evidence({1: 2})
    assert m.fixed[1] == 2
    with pytest.raises(ValueError):
        m.apply_evidence({1: 3})  # out of card
    # reset semantics
    m.apply_evidence({0: 1})
    assert m.fixed[1] == -1 and m.fixed[0] == 1


def test_factor_log_space():
    f = Factor("f", [0], np.array([0.5, 0.0]))
    f.to_log()
    assert f.table[0] == pytest.approx(np.log(0.5))
    assert f.table[1] == pytest.approx(np.log(1e-6))  # eps floor on zeros
    with pytest.raises(ValueError):
        f.to_log()  # double-call guard


def test_blankets_and_adjacency():
    m = make_vanilla()
    b = m.blankets()
    assert b[0] == {0, 1}
    assert b[1] == {0, 1}
    adj = moral_adjacency(3, [np.array([0, 1]), np.array([1, 2])])
    assert adj[1] == {0, 2}
    assert adj[0] == {1}


def test_coloring_chain_graph():
    scopes = [np.array([i, i + 1]) for i in range(5)]
    colors = color_graph(6, scopes)
    verify_coloring(colors, scopes)
    assert colors.max() <= 2  # a path is 2-colorable; greedy may use <= deg+1
    groups = color_groups(colors, np.ones(6, dtype=bool))
    assert sorted(int(v) for g in groups for v in g) == list(range(6))
    # group splitting
    groups = color_groups(colors, np.ones(6, dtype=bool), group_cap=1)
    assert all(g.size == 1 for g in groups)


def test_coloring_grids13():
    from grample_tpu.uai import load_model

    m = load_model(res_path("Grids_13.uai"))
    scopes = [f.scope for f in m.factors]
    colors = color_graph(m.num_vars, scopes)
    verify_coloring(colors, scopes)
    assert colors.max() + 1 <= 4  # grid moral graph colors cheaply


def test_encode_structure():
    m = make_vanilla()
    enc = encode_model(m)
    v = m.num_vars
    assert enc.cards.shape == (v + 1,)
    assert enc.cards[v] == 1  # sentinel
    # var 0 is in both factors, var 1 in one
    assert enc.adj_mask[0].sum() == 2
    assert enc.adj_mask[1].sum() == 1
    # flat tables hold log values
    assert enc.tables[0] == pytest.approx(np.log(1.0))
    assert enc.tables[2] == pytest.approx(np.log(1.0))  # func-1 starts at offset 2
    # strides: func-1 over cards (2,3): own positions zeroed in scope strides
    j = int(np.nonzero(enc.adj_self_stride[0])[0][0]) if enc.adj_self_stride[0].any() else 0
    # var0's entry for func-1 must have self stride 3
    strides = sorted(enc.adj_self_stride[0][enc.adj_mask[0]].tolist())
    assert strides == [1, 3]
    # every colored group var is a real, updatable var
    for ci in range(enc.num_colors):
        vs = enc.color_vars[ci][enc.color_mask[ci]]
        assert (vs < v).all()


def test_encode_variant_stacking():
    m = make_vanilla()
    caps = compute_caps(m)
    e1 = encode_model(m, caps)
    m2 = m.clone()
    m2.fixed[0] = 1
    e2 = encode_model(m2, caps)
    stack = stack_variants([e1, e2])
    assert stack["sw_local_tables"].shape[0] == 2
    assert stack["sw_kmask"].shape[0] == 2
    # var 0 fixed in variant 2: it must appear in no update group there
    assert (e2.color_vars[e2.color_mask] != 0).all()
    assert (e1.color_vars[e1.color_mask] == 0).any()
    # layout maps are self-consistent: every real var round-trips
    for enc in (e1, e2):
        v = enc.caps.num_vars
        assert (enc.old_of_new[enc.new_of_old[:v]] == np.arange(v)).all()


def test_caps_fit_full_suite_models():
    from grample_tpu.uai import load_model

    for name in ("Grids_13.uai", "Pedigree_11.uai", "ObjectDetection_11.uai"):
        m = load_model(res_path(name), use_evidence=True)
        enc = encode_model(m)
        assert enc.num_colors >= 1
        # every free var appears exactly once across color groups
        seen = []
        for ci in range(enc.num_colors):
            seen.extend(enc.color_vars[ci][enc.color_mask[ci]].tolist())
        free = np.nonzero(m.free_mask)[0]
        assert sorted(seen) == sorted(free.tolist())
