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
ok = sum(1 for r in rows if "error" not in r)
print(f"{len(rows)} rows ({ok} ok), adaptive<=plain wins {wins}/{wins+losses}")
