"""End-to-end engine runs (the modelMarginals loop) on tiny nets."""

import json
import os

import numpy as np
import pytest

from grample_tpu.sampler.engine import Engine, EngineConfig

from tests.conftest import res_path


def quiet(_msg):
    pass


def base_cfg(model, **kw):
    cfg = EngineConfig(
        model_path=model,
        use_solution=True,
        burnin=20,  # site samples; tiny nets -> ~20 sweeps
        converge_window=40,
        chains=2,
        chains_per_variant=32,
        max_secs=600.0,
        max_iters=20000,
        seed=42,
        status_secs=2.0,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_simple_run_one_uai(tmp_path):
    cfg = base_cfg(res_path("one.uai"))
    res = Engine(cfg, log=quiet).run()
    assert res.final_score is not None
    # single binary var, truth [0.25, 0.75]: must be close after thousands
    # of draws
    assert res.final_score.max_hellinger < 0.02
    assert res.samples > 0
    assert res.marginals.shape == (1, 2)
    np.testing.assert_allclose(res.marginals.sum(axis=1), 1.0, atol=1e-9)


def test_collapsed_run_deterministic_uai():
    cfg = base_cfg(
        res_path("deterministic.uai"), sampler="collapsed", chains=3,
        use_solution=False,
        rb_mixture=False,  # assert the reference's STATIC collapse marginal
    )
    res = Engine(cfg, log=quiet).run()
    assert res.variants == 3
    assert len(res.collapsed) >= 1
    # collapsed vars carry the exact 0.5/0.5 marginal
    for v in res.collapsed:
        np.testing.assert_allclose(res.marginals[v], [0.5, 0.5], atol=1e-9)


def test_adaptive_run(tmp_path):
    trace = str(tmp_path / "trace.jsonl")
    cfg = base_cfg(
        res_path("deterministic.uai"),
        sampler="adaptive",
        chain_adds=2,
        max_iters=60000,
        trace_path=trace,
        experiment=True,
        rb_mixture=False,  # assert the reference's STATIC collapse marginal
    )
    res = Engine(cfg, log=quiet).run()
    # adaptation must have collapsed something
    assert res.variants > 2
    assert len(res.collapsed) >= 1
    # collapsed vars have exactly 0.5/0.5 (deterministic.uai property)
    for v in res.collapsed:
        np.testing.assert_allclose(res.marginals[v], [0.5, 0.5], atol=1e-9)
    assert res.convergence is not None
    # trace file: experiment CSV header + per-var JSON + params
    text = open(trace).read()
    assert "RunSecs, MaxHell" in text
    assert "// VARS (ESTIMATED)" in text
    assert "// OPERATING PARAMS" in text
    # JSON records parse
    for line in text.splitlines():
        if line.startswith("{"):
            json.loads(line)


def test_trace_process_roundtrip(tmp_path):
    """Adaptive run trace -> CSV with rank columns (trace_file_process.py
    parity), plus the merlin-ranked section and model dump."""
    import csv
    import io

    from grample_tpu.tools.trace_process import process

    trace = str(tmp_path / "t.jsonl")
    cfg = base_cfg(
        res_path("deterministic.uai"), sampler="adaptive", chain_adds=2,
        max_iters=30000, trace_path=trace,
    )
    Engine(cfg, log=quiet).run()
    text = open(trace).read()
    assert "// VARS SORTED BY DIST FROM HELLINGER" in text
    assert "// ENTIRE MODEL" in text

    out = io.StringIO()
    assert process(text.splitlines(), out) == 0
    rows = list(csv.DictReader(io.StringIO(out.getvalue())))
    assert rows, "no estimated vars in CSV"
    cols = rows[0].keys()
    assert "Hell-Convergence-RANK" in cols
    assert "Hell-Error-RANK" in cols
    # ranks are a permutation of 1..N
    ranks = sorted(int(r["Hell-Error-RANK"]) for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # rank 1 is the smallest error
    best = min(rows, key=lambda r: float(r["Hell-Error"]))
    assert int(best["Hell-Error-RANK"]) == 1


def test_mar_output(tmp_path):
    out = str(tmp_path / "result.MAR")
    cfg = base_cfg(res_path("one.uai"), mar_out=out, max_iters=4000)
    Engine(cfg, log=quiet).run()
    from grample_tpu.uai import read_mar_file

    sol = read_mar_file(out)
    assert len(sol) == 1
    assert abs(sol[0][1] - 0.75) < 0.05


def test_maxiters_stops_early():
    cfg = base_cfg(res_path("one.uai"), max_iters=500)
    res = Engine(cfg, log=quiet).run()
    # stops at the iteration cap: exactly one window past 500 samples
    assert 500 <= res.samples <= 2 * 2 * 32 * 40


def test_checkpoint_roundtrip(tmp_path):
    from grample_tpu.sampler.chains import ChainGroup
    from grample_tpu.sampler.checkpoint import load_checkpoint, save_checkpoint
    from grample_tpu.sampler.collapse import collapse_var
    from grample_tpu.uai import load_model

    m = load_model(res_path("sample.uai"))
    g = ChainGroup(m, chains_per_variant=16, converge_window=20, seed=6)
    g.add_variant(m)
    variant, _ = collapse_var(m, 1)
    g.add_variant(variant)
    g.advance()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, g)

    g2, meta = load_checkpoint(path, m)
    assert g2.num_variants == 2
    assert g2.total_samples == g.total_samples
    np.testing.assert_array_equal(g2.totals, g.totals)
    np.testing.assert_array_equal(np.asarray(g2.state), np.asarray(g.state))
    assert bool(g2.variants[1].collapsed[1])
    # resumed group advances fine
    g2.advance()
    assert g2.total_samples > g.total_samples


def test_kill_and_resume_bit_exact(tmp_path):
    """A save/load/advance must reproduce an uninterrupted run exactly
    (same seed, same key stream, same states, same totals)."""
    from grample_tpu.sampler.chains import ChainGroup
    from grample_tpu.sampler.checkpoint import load_checkpoint, save_checkpoint
    from grample_tpu.uai import load_model

    m = load_model(res_path("sample.uai"))

    def fresh():
        g = ChainGroup(m, chains_per_variant=16, converge_window=20, seed=9)
        g.add_variant(m)
        g.add_variant(m)
        g.burn(10)
        g.advance()
        return g

    # uninterrupted: two windows
    a = fresh()
    a.advance()

    # killed after one window, resumed, then one window
    b = fresh()
    path = str(tmp_path / "kill.npz")
    save_checkpoint(path, b)
    del b
    b2, _ = load_checkpoint(path, m)
    b2.advance()

    np.testing.assert_array_equal(np.asarray(a.state), np.asarray(b2.state))
    np.testing.assert_array_equal(np.asarray(a.halves), np.asarray(b2.halves))
    np.testing.assert_array_equal(a.totals, b2.totals)
    assert a.total_samples == b2.total_samples
    assert a.total_sweeps == b2.total_sweeps


def test_engine_resume_continues(tmp_path):
    """Engine honors cfg.resume: picks up samples/budgets from the file."""
    ck = str(tmp_path / "eng.npz")
    cfg = base_cfg(
        res_path("one.uai"), max_iters=2000,
        checkpoint_path=ck, checkpoint_secs=0.0,  # checkpoint every window
    )
    res1 = Engine(cfg, log=quiet).run()
    assert os.path.exists(ck)

    cfg2 = base_cfg(
        res_path("one.uai"), max_iters=4000,
        checkpoint_path=ck, resume=True,
    )
    logs = []
    res2 = Engine(cfg2, log=logs.append).run()
    assert any("RESUMED" in s for s in logs)
    assert res2.samples > res1.samples  # continued, not restarted
    assert res2.final_score.max_hellinger < 0.05
