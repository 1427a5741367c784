"""One-shot: merge acceptance part files -> results/acceptance.jsonl + .md."""
import json
import sys

sys.path.insert(0, ".")
from grample_tpu.tools.experiments import summarize  # noqa: E402

rows = []
seen = set()
for part in ("results/acceptance_part1.jsonl", "results/acceptance_part2.jsonl"):
    try:
        with open(part) as fh:
            for line in fh:
                r = json.loads(line)
                key = (r["net"], r["mode"])
                if key in seen:
                    continue
                seen.add(key)
                rows.append(r)
    except FileNotFoundError:
        pass

rows.sort(key=lambda r: (r["net"], r["mode"]))
with open("results/acceptance.jsonl", "w") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
with open("results/acceptance.md", "w") as fh:
    wins, losses = summarize(rows, fh)
    fh.write("""
## Notes (round 3, 45 s budget, one TPU v5e chip)

- Run shape: reference `script/experiment` semantics (adaptive: 2 start
  chains + 4 per adapt step; plain: 2 chains), 1024 micro-chains per
  slot, annealed burn-in, scored against the bundled exact `.MAR`;
  `merlin meanHell` is the merlin solver's error on the same net.
- **Plain Gibbs at TPU throughput beats merlin on most nets at 45 s**
  (e.g. Promedus_19 0.189 vs 0.202, Promedus_11 0.050 vs 0.398,
  CSP/Alchemy/ObjectDetection near-exact) — raw sampling rate
  (1e8-3e10 counted site-samples/s) substitutes for the reference's
  need to be clever per sample.
- The kelly19a adaptive-vs-plain comparison inverts at this operating
  point: adaptive pays adapt/collapse/aux overheads against a plain
  sampler that is already near-exact, so plain wins most nets here.
  The claim holds where mixing (not rate) is the binding constraint —
  Grids_13: adaptive 0.326 vs plain 0.375 mean Hellinger (both beat
  merlin's 0.368 only via the adaptive path).
- The three `error` rows (Promedus_19/11, Pedigree_11 adaptive) hit a
  TPU-worker crash on the rowgather aux path, fixed afterwards by
  keeping the aux collapse group on the dense matmul base mode
  (commit 450a133); rows stand as recorded in this run.
""")
ok = sum(1 for r in rows if "error" not in r)
print(f"{len(rows)} rows ({ok} ok), adaptive<=plain wins {wins}/{wins+losses}")
