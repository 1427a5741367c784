"""Grids_13 plain rising-error analysis (VERDICT r4 weak #3 / next #4).

The committed 300 s plain trace shows max Hellinger rising monotonically
0.456 -> 0.511.  Hypotheses: (a) ensemble mode drift — individual chains
hop between the grid's quasi-deterministic modes with net flux toward
the dominant basin, so the CHAIN-ENSEMBLE distribution slides away from
the annealed-burn-in start (real Gibbs dynamics, would also affect the
reference); (b) a counting/merge bug (window counts diverging from state
occupancy).

This tool advances a plain group window by window and records, per tick:
  - cumulative-count estimate error (what the engine reports),
  - window-LOCAL estimate error (this window's halves only),
  - ensemble occupancy of the worst var's outcome 0 (drift trajectory).
If window-local error drifts the same way while local-vs-cumulative
stay consistent, it is (a): the estimator faithfully averages a
drifting ensemble.  A divergence between local counts and state
occupancy would be (b).

    python -m grample_tpu.tools.drift --net Grids_13 --windows 40
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from grample_tpu.metrics.divergences import hellinger, pad_marginals
from grample_tpu.sampler.chains import ChainGroup
from grample_tpu.uai import load_model, read_mar_file


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--res", default=os.environ.get(
        "GRAMPLE_RES", "/root/reference/res"))
    ap.add_argument("--net", default="Grids_13")
    ap.add_argument("--windows", type=int, default=40)
    ap.add_argument("--cw", type=int, default=2000)
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--burn", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    path = os.path.join(args.res, args.net + ".uai")
    m = load_model(path, use_evidence=os.path.exists(path + ".evid"))
    sol = pad_marginals(read_mar_file(path + ".MAR"), m.cards)

    g = ChainGroup(m, chains_per_variant=args.chains,
                   converge_window=args.cw, seed=args.seed)
    g.add_variant(m)
    g.add_variant(m)
    g.warmup()
    g.burn_annealed(args.burn)

    v, k = m.num_vars, g.kdim
    free = m.free_mask
    cards = m.cards
    valid = np.arange(k)[None, :] < cards[:, None]
    uniform = valid / np.maximum(cards[:, None], 1)

    rows = []
    worst_var = None
    for w in range(args.windows):
        g.advance(args.cw, defer=False)
        # window-local estimate: THIS window's halves only
        local = np.asarray(g.halves).sum(axis=(1, 2))[: g.num_variants, :v].sum(axis=0)
        local_est = local + 1e-9
        cum = g.merged_marginals()
        h_local = hellinger(local_est, sol, cards)[free]
        h_cum = hellinger(cum, sol, cards)[free]
        # state occupancy right now (consistency check vs window counts)
        st = np.asarray(g.state)[: g.num_variants, :, :v]
        occ = np.stack([
            (st == kk).sum(axis=(0, 1)) for kk in range(k)
        ], axis=1).astype(np.float64)
        h_occ = hellinger(occ + 1e-9, sol, cards)[free]
        if worst_var is None:
            worst_var = int(np.nonzero(free)[0][np.argmax(h_cum)])
        wv_occ0 = float(occ[worst_var, 0] / max(occ[worst_var].sum(), 1))
        wv_loc0 = float(local_est[worst_var, 0] / max(local_est[worst_var].sum(), 1e-9))
        rows.append({
            "window": w,
            "sweeps": g.total_sweeps,
            "max_hell_cum": round(float(h_cum.max()), 5),
            "mean_hell_cum": round(float(h_cum.mean()), 5),
            "max_hell_window": round(float(h_local.max()), 5),
            "mean_hell_window": round(float(h_local.mean()), 5),
            "max_hell_occupancy": round(float(h_occ.max()), 5),
            "worst_var": worst_var,
            "worst_var_occ0": round(wv_occ0, 5),
            "worst_var_window0": round(wv_loc0, 5),
            "sol_worst0": round(float(sol[worst_var, 0]), 5),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
