"""Headline benchmark: aggregate Gibbs site-samples/s on one chip.

Runs the chromatic-sweep engine on Grids_13 (+evidence) from the
reference's benchmark suite (data files only), times counted advance
windows, and reports throughput against the Go reference anchor.

Anchor: the reference repo publishes no numbers (BASELINE.md); SURVEY.md
§6 derives ~10⁵–10⁶ single-site updates/s/core for these networks from
the hot-loop cost, so we anchor vs_baseline at the GENEROUS end,
1e6 samples/s single-core Go.  Accuracy is cross-checked against the
bundled exact .MAR solution and reported alongside.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GO_ANCHOR_SAMPLES_PER_SEC = 1e6  # upper-end single-core Go estimate (SURVEY §6)
RES = os.environ.get("GRAMPLE_RES", "/root/reference/res")
CHAINS = int(os.environ.get("BENCH_CHAINS", "8192"))
SWEEPS = int(os.environ.get("BENCH_SWEEPS", "64"))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))


def load_bench_model():
    from grample_tpu.uai import load_model

    path = os.path.join(RES, "Grids_13.uai")
    if os.path.exists(path):
        return load_model(path, use_evidence=True), "Grids_13+evid"
    from __graft_entry__ import _grid_model

    return _grid_model(side=10), "synthetic-grid10"


def main() -> int:
    t0 = time.time()
    model, name = load_bench_model()
    from grample_tpu.sampler.chains import ChainGroup

    group = ChainGroup(model, chains_per_variant=CHAINS, converge_window=SWEEPS, seed=42)
    group.add_variant(model)

    # compile + settle (burn-in also serves as the chain warmup)
    group.burn(16)
    group.advance(8)

    t1 = time.time()
    taken = 0
    for _ in range(ROUNDS):
        taken += group.advance(SWEEPS)
    dt = time.time() - t1
    rate = taken / dt

    accuracy = None
    mar = os.path.join(RES, "Grids_13.uai.MAR")
    if name.startswith("Grids_13") and os.path.exists(mar):
        from grample_tpu.metrics import error_suite
        from grample_tpu.metrics.divergences import pad_marginals
        from grample_tpu.uai import read_mar_file

        sol = pad_marginals(read_mar_file(mar), model.cards)
        score = error_suite(
            group.merged_marginals(), sol, model.cards, model.fixed, None
        )
        accuracy = {
            "mean_hellinger": round(float(score.mean_hellinger), 6),
            "max_hellinger": round(float(score.max_hellinger), 6),
        }

    import jax

    print(
        json.dumps(
            {
                "metric": f"gibbs_site_samples_per_sec ({name}, {group.num_chains} chains)",
                "value": round(rate, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(rate / GO_ANCHOR_SAMPLES_PER_SEC, 2),
                "platform": jax.devices()[0].platform,
                "accuracy_vs_MAR": accuracy,
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
