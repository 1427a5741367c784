"""PSRF validation against a direct windowed-history replay.

SURVEY.md §7 "hard parts": the incremental split-half count tensors must
reproduce the reference's ring-buffer semantics (``buffer/circular.go``
halves feeding ``ChainDist``/``ChainConvergence``, ``sampler/chain.go:
32-92, 253-290``).  Here we record the actual per-sweep sample history
(the chromatic sweep updates every free var exactly once per sweep, so
the state after sweep *i* IS sweep *i*'s sample vector), rebuild the
FirstHalf/SecondHalf counts the way the reference's ring buffer would,
and check (a) the engine's halves tensors match them exactly, and
(b) an independent numpy implementation of the reference's PSRF formula
matches ``metrics.psrf.chain_convergence`` for all four measures.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from grample_tpu.metrics.psrf import chain_convergence
from grample_tpu.ops.gibbs_xla import advance_chains, init_state
from grample_tpu.pgm.encode import encode_model, stack_variants
from grample_tpu.uai import load_model

from tests.conftest import res_path

W = 20  # convergence window (sweeps)
C = 8  # chains


def _drive_with_history(m, seed=3):
    """Advance one window sweep-by-sweep, recording the sample history."""
    enc = encode_model(m)
    stack = {k: jnp.asarray(v) for k, v in stack_variants([enc]).items()}
    v1 = m.num_vars + 1
    kdim = m.max_card
    key = jax.random.key(seed, impl="rbg")
    state = init_state(stack, key, C, kdim)
    state, _ = advance_chains(
        stack, state, jnp.zeros((1, 2, C, v1, kdim), jnp.float32),
        jax.random.fold_in(key, 99), 10, 10, count=False,
    )
    halves = jnp.zeros((1, 2, C, v1, kdim), jnp.float32)
    hist = []
    for si in range(W):
        # route this sweep's counts into the reference half: FirstHalf =
        # the W/2 oldest sweeps of the window, SecondHalf = the newest
        hp = 1 if si < W // 2 else 0
        state, halves = advance_chains(
            stack, state, halves, jax.random.fold_in(key, si), 1, hp,
            count=True,
        )
        hist.append(np.asarray(state)[0, :, : m.num_vars])  # [C, V]
    return np.stack(hist), np.asarray(halves)[0], m


def _ring_half_counts(hist, cards, kdim):
    """FirstHalf/SecondHalf counts as the reference ring buffer sees them."""
    w, c, v = hist.shape
    out = np.zeros((2, c, v, kdim))
    for h, lo, hi in ((0, 0, w // 2), (1, w // 2, w)):
        for ci in range(c):
            for vi in range(v):
                for val in hist[lo:hi, ci, vi]:
                    out[h, ci, vi, int(val)] += 1
    return out


def _replay_measure(name, a, b, card):
    """model/error.go divergences, independent numpy implementation."""
    p = a[:card] / max(a[:card].sum(), 1e-12)
    q = b[:card] / max(b[:card].sum(), 1e-12)
    if name == "hellinger":
        return np.sqrt(((np.sqrt(p) - np.sqrt(q)) ** 2).sum()) / math.sqrt(2.0)
    if name == "js":
        mid = 0.5 * (p + q)

        def kl(x, y):
            x = np.maximum(x, 1e-12)
            y = np.maximum(y, 1e-12)
            return (x * np.log2(x / y)).sum()

        return 0.5 * (kl(p, mid) + kl(q, mid))
    if name == "maxabs":
        return np.abs(p - q).max()
    if name == "meanabs":
        return np.abs(p - q).sum() / card
    raise ValueError(name)


def _replay_psrf(halfc, merged, cards, fixed, measure):
    """ChainConvergence replayed per the reference (chain.go:32-92)."""
    _, c, v, _ = halfc.shape
    scores = np.zeros(v)
    for vi in range(v):
        if fixed[vi] >= 0:
            scores[vi] = 1.0
            continue
        card = int(cards[vi])
        within = []
        between = []
        for ci in range(c):
            h1 = halfc[0, ci, vi] + 1e-8
            h2 = halfc[1, ci, vi] + 1e-8
            within.append(_replay_measure(measure, h1, h2, card))
            between.append(_replay_measure(measure, merged[vi], h1 + h2, card))
        m = float(c)
        n = float(W)
        wv = (1e-8 + sum(within)) / m
        bv = (1e-8 + sum(between)) * (n / (m - 1.0))
        vhat = ((n - 1.0) / n) * wv + ((m + 1.0) / (m * n)) * bv
        scores[vi] = math.sqrt((4.0 * vhat) / (2.0 * wv))
    return scores


def test_halves_match_ring_buffer_replay():
    m = load_model(res_path("sample.uai"), use_evidence=True)
    hist, halves, m = _drive_with_history(m)
    ring = _ring_half_counts(hist, m.cards, m.max_card)
    free = np.nonzero(m.free_mask)[0]
    # engine halves [2, C, V+1, K] vs replayed ring-buffer halves: exact
    np.testing.assert_array_equal(halves[:, :, free, :], ring[:, :, free, :])
    # fixed vars never counted
    fixed = np.nonzero(m.fixed >= 0)[0]
    assert halves[:, :, fixed, :].sum() == 0


def test_psrf_matches_reference_replay():
    m = load_model(res_path("sample.uai"), use_evidence=True)
    hist, halves, m = _drive_with_history(m)
    v, kdim = m.num_vars, m.max_card

    merged = np.random.default_rng(0).random((v, kdim)) + 0.5
    for vi in range(v):
        merged[vi, int(m.cards[vi]):] = 0.0

    for measure in ("hellinger", "js", "maxabs", "meanabs"):
        want = _replay_psrf(
            np.asarray(halves).transpose(0, 1, 2, 3)[:, :, :v, :],
            merged, m.cards, m.fixed, measure,
        )
        got = np.asarray(
            chain_convergence(
                jnp.asarray(halves[0, :, :v, :]),
                jnp.asarray(halves[1, :, :v, :]),
                jnp.asarray(merged, dtype=jnp.float32),
                jnp.asarray(m.cards, dtype=jnp.int32),
                jnp.asarray(m.fixed >= 0),
                jnp.ones(C, dtype=bool),
                jnp.asarray(float(W), dtype=jnp.float32),
                measure=measure,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4), measure
