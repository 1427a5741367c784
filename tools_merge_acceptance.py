"""One-shot: merge round-4 acceptance part files -> results/acceptance.jsonl + .md.

Later parts win on duplicate (net, mode) keys, so re-runs supersede
earlier rows.  Usage: python tools_merge_acceptance.py [part.jsonl ...]
(defaults to results/acceptance_r4_*.jsonl in sorted order).
"""
import glob
import json
import sys

sys.path.insert(0, ".")
from grample_tpu.tools.experiments import summarize  # noqa: E402

parts = sys.argv[1:] or sorted(glob.glob("results/acceptance_r4_*.jsonl"))
rows = {}
for part in parts:
    with open(part) as fh:
        for line in fh:
            r = json.loads(line)
            rows[(r["net"], r["mode"])] = r

rows = [rows[k] for k in sorted(rows)]
errors = [r for r in rows if "error" in r]
with open("results/acceptance.jsonl", "w") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
with open("results/acceptance.md", "w") as fh:
    summarize(rows, fh)
    try:
        notes = open("results/acceptance_notes.md").read()
    except FileNotFoundError:
        notes = ""
    fh.write("\n" + notes)

print(f"merged {len(parts)} parts -> {len(rows)} rows ({len(errors)} errors)")
