"""Assemble validation_results.json from the per-mode validation runs.

Inputs (whichever exist): validation_dynamical.json,
validation_bigcodes_bf16.json (round-1 dynamical runs — still valid, the
decode path is bit-exact across rounds), validation_autoregressive_r2.json
(round-2 gated-calibration run). Output: validation_results.json — the
single file VALIDATION.md points to.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = [
    ("validation_dynamical.json", "dynamical (round 1)"),
    ("validation_bigcodes_bf16.json", "dynamical big codes (round 1)"),
    ("validation_autoregressive_r2.json",
     "alvarado-autoregressive, R2/range-gated fits (round 2)"),
]


def main():
    rows = []
    for fname, label in SOURCES:
        path = os.path.join(ROOT, fname)
        if not os.path.exists(path):
            print(f"skip (missing): {fname}")
            continue
        with open(path) as f:
            data = json.load(f)
        for row in data:
            row = dict(row)
            row["source"] = label
            rows.append(row)
        print(f"{fname}: {len(data)} rows")
    out = os.path.join(ROOT, "validation_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
