"""UAI format I/O tests (golden semantics from model/uai_test.go)."""

import glob
import os

import numpy as np
import pytest

from grample_tpu.uai import (
    parse_evidence,
    parse_mar,
    parse_model,
    preprocess,
    read_mar_file,
    load_model,
)
from grample_tpu.uai.parser import UAIParseError
from grample_tpu.uai.writer import write_mar, write_model

from tests.conftest import RES_DIR, res_path

# The PASCAL/PIC2011 documentation example (public format spec example):
# 3 vars with cards 2,2,3; factors over {0}, {0,1}, {1,2}.
PASCAL_DOC = """MARKOV
3
2 2 3
3
1 0
2 0 1
2 1 2

2
 0.436 0.564

4
 0.128 0.872
 0.920 0.080

6
 0.210 0.333 0.457
 0.811 0.000 0.189
"""


def test_preprocess_strips_comments_and_blanks():
    text = "c hello\n\n  c another\nMARKOV\n  3  \n\n"
    clean, n = preprocess(text)
    assert n == 2
    assert clean.split("\n") == ["MARKOV", "3"]


def test_preprocess_req_prefix_skips_leading_sections():
    text = "PR\n-1.23\nsomething\nMAR 2\nrest\n"
    clean, n = preprocess(text, req_prefix="MAR")
    assert clean.split("\n") == ["MAR 2", "rest"]
    assert n == 2


def test_parse_pascal_doc_example():
    m = parse_model(PASCAL_DOC)
    assert m.type == "MARKOV"
    assert m.num_vars == 3
    assert list(m.cards) == [2, 2, 3]
    assert len(m.factors) == 3
    assert list(m.factors[0].scope) == [0]
    assert list(m.factors[1].scope) == [0, 1]
    assert list(m.factors[2].scope) == [1, 2]
    # row-major, last var least significant: entry for (B=1, C=0) is idx 3
    f = m.factors[2]
    assert f.eval_at(m.cards, [1, 0]) == pytest.approx(0.811)
    assert f.eval_at(m.cards, [0, 2]) == pytest.approx(0.457)
    m.check()


def test_parse_model_errors():
    with pytest.raises(UAIParseError):
        parse_model("x")  # too short
    with pytest.raises(UAIParseError):
        parse_model("WRONG\n1\n2\n1\n1 0\n2\n0.5 0.5\n")
    with pytest.raises(UAIParseError):  # table size mismatch
        parse_model("MARKOV\n1\n2\n1\n1 0\n3\n0.5 0.5 0.1\n")
    with pytest.raises(UAIParseError):  # bad var index in scope
        parse_model("MARKOV\n1\n2\n1\n1 7\n2\n0.5 0.5\n")


def test_evidence_forms():
    cards = np.array([2, 2, 3])
    # one-line form
    assert parse_evidence("1 2 2", 3, cards) == {2: 2}
    # two-line form with sample count
    assert parse_evidence("1\n2 0 1 2 0", 3, cards) == {0: 1, 2: 0}
    # zero sample count => no evidence
    assert parse_evidence("0\n1 0 1", 3, cards) == {}
    # zero var count => no evidence
    assert parse_evidence("0", 3, cards) == {}
    with pytest.raises(UAIParseError):  # multi-sample unsupported
        parse_evidence("2\n1 0 1", 3, cards)
    with pytest.raises(UAIParseError):  # out-of-range value
        parse_evidence("1 0 5", 3, cards)
    with pytest.raises(UAIParseError):  # out-of-range index
        parse_evidence("1 9 0", 3, cards)
    with pytest.raises(UAIParseError):  # duplicate var
        parse_evidence("2 0 1 0 0", 3, cards)
    with pytest.raises(UAIParseError):  # too many lines
        parse_evidence("1\n1 0 1\n1 0 1", 3, cards)


def test_mar_parsing_and_merlin_skip():
    mars = parse_mar("MAR 2 2 0.25 0.75 3 0.2 0.3 0.5")
    assert len(mars) == 2
    np.testing.assert_allclose(mars[0], [0.25, 0.75])
    np.testing.assert_allclose(mars[1], [0.2, 0.3, 0.5])
    # merlin files have a PR section first
    merlin = "PR\n-2.33\nMAR\n2 2 0.25 0.75 2 0.5 0.5\n"
    mars = parse_mar(merlin)
    assert len(mars) == 2
    np.testing.assert_allclose(mars[1], [0.5, 0.5])
    # marginals are normalized on read
    mars = parse_mar("MAR 1 2 0.2 0.2")
    np.testing.assert_allclose(mars[0], [0.5, 0.5])
    with pytest.raises(UAIParseError):
        parse_mar("MAR 1 2 1.5 0.5")  # p > 1


def test_model_roundtrip():
    m = parse_model(PASCAL_DOC)
    m2 = parse_model(write_model(m))
    assert m2.num_vars == m.num_vars
    for f, g in zip(m.factors, m2.factors):
        assert list(f.scope) == list(g.scope)
        np.testing.assert_allclose(f.table, g.table)


def test_mar_roundtrip():
    mars = [np.array([0.25, 0.75]), np.array([0.2, 0.3, 0.5])]
    back = parse_mar(write_mar(mars))
    for a, b in zip(mars, back):
        np.testing.assert_allclose(a, b, atol=1e-7)


# ---- golden tests against the bundled UAI benchmark instances ------------

def test_one_uai():
    m = load_model(res_path("one.uai"))
    assert m.num_vars == 1
    assert list(m.cards) == [2]
    np.testing.assert_allclose(m.factors[0].table, [0.25, 0.75])
    sol = read_mar_file(res_path("one.uai.MAR"))
    np.testing.assert_allclose(sol[0], [0.25, 0.75])


def test_grids13_structure():
    m = load_model(res_path("Grids_13.uai"), use_evidence=True)
    assert m.num_vars == 100
    assert len(m.factors) == 300
    assert m.max_card == 2
    assert int((m.fixed >= 0).sum()) == 0  # Grids_13.evid is empty
    sol = read_mar_file(res_path("Grids_13.uai.MAR"))
    assert len(sol) == 100


@pytest.mark.slow
def test_parse_full_suite():
    """Every bundled instance parses, validates, and has consistent aux files."""
    if not os.path.isdir(RES_DIR):
        pytest.skip("no res dir")
    for path in sorted(glob.glob(os.path.join(RES_DIR, "*.uai"))):
        m = load_model(path, use_evidence=os.path.exists(path + ".evid"))
        m.check()
        if os.path.exists(path + ".MAR"):
            sol = read_mar_file(path + ".MAR")
            assert len(sol) == m.num_vars
            for i, mar in enumerate(sol):
                assert mar.size == m.cards[i]
        if os.path.exists(path + ".merlin.MAR"):
            sol = read_mar_file(path + ".merlin.MAR")
            assert len(sol) == m.num_vars
