#!/usr/bin/env python3
"""Regenerate the bench regression budgets from a clean promoted run.

Usage: python3 tools/budgets.py [BENCH_DETAIL.json]

Writes TIME_BUDGET.json and SHUFFLE_BUDGET.json next to the input.
Formulas (keep in sync with graft.Bench.budgetFor and NOTES.md):

  time budget    = max(1.5 * promoted_sec, promoted_sec + 0.5)
                   entries with promoted_sec < 0.5 are skipped
                   (noise-dominated; the additive floor covers the rest)
  shuffle budget = max(2 * promoted_mb, 1.0)

The additive 0.5 s floor is the round-9 recalibration: a 0.6 s query
tripped the plain 1.5x bound on a 12% JIT/GC overshoot.  rate_/flag
pseudo-entries are excluded (they are rates, not seconds); the replay
wall times stay gated.
"""
import json
import os
import sys

EXCLUDE_PREFIXES = ("rate_", "ingest_integrity")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    with open(src) as f:
        detail = json.load(f)
    out_dir = os.path.dirname(os.path.abspath(src))

    times = {
        q: max(1.5 * sec, sec + 0.5)
        for q, sec in detail["queries"].items()
        if sec >= 0.5 and not q.startswith(EXCLUDE_PREFIXES)
    }
    shuffles = {
        q: max(2.0 * mb, 1.0)
        for q, mb in detail["shuffle_mb"].items()
        if not q.startswith(EXCLUDE_PREFIXES)
    }

    def dump(path: str, entries: dict) -> None:
        with open(path, "w") as f:
            f.write("{\n")
            f.write(",\n".join(f'"{k}":{v:.3f}' for k, v in sorted(entries.items())))
            f.write("\n}\n")
        print(f"wrote {path}: {len(entries)} entries")

    dump(os.path.join(out_dir, "TIME_BUDGET.json"), times)
    dump(os.path.join(out_dir, "SHUFFLE_BUDGET.json"), shuffles)


if __name__ == "__main__":
    main()
