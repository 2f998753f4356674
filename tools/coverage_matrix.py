"""Which driver round checked which registered query — the re-check
rotation audit (VERDICT r5 task 5 / optional 8c).

Reads the committed CORRECTNESS_r*.json verdicts against the LIVE
registry and prints:
  - per-round: how many checked / green, how many were first-time
    checks vs tier-3 re-checks;
  - the staleness tail: queries whose most recent green is oldest
    (the names the next round's 50-slot window will re-check first);
  - any registered query never checked by any round (must be empty
    once a round has seen it).

Usage: python tools/coverage_matrix.py [--markdown]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from go_zoom_kinesis_spark import registry

    names = list(registry.all_queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)

    seen: dict[str, list[int]] = {}
    green: dict[str, int] = {}
    for rnd in sorted(rounds):
        for name, v in rounds[rnd].items():
            seen.setdefault(name, []).append(rnd)
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                green[name] = rnd

    sep = "| " if args.markdown else "  "
    if args.markdown:
        print("| round | checked | green | first-time | re-checks |")
        print("|---|---|---|---|---|")
    prev_seen: set[str] = set()
    for rnd in sorted(rounds):
        checked = list(rounds[rnd])
        n_green = sum(
            1
            for n in checked
            if all(
                rounds[rnd][n].get(k)
                for k in ("rows_match", "schema_match", "hash_match")
            )
        )
        first = [n for n in checked if n not in prev_seen]
        row = (rnd, len(checked), n_green, len(first), len(checked) - len(first))
        if args.markdown:
            print("| r%d | %d | %d | %d | %d |" % row)
        else:
            print("r%d: checked=%d green=%d first_time=%d rechecks=%d" % row)
        prev_seen.update(checked)

    never = [n for n in names if n not in seen]
    ever = [n for n in names if n in seen]
    print()
    print(f"registered: {len(names)}; ever-checked: {len(ever)}"
          f"; never-checked: {len(never)}" + (f" -> {never}" if never else ""))
    stale = sorted((n for n in names if n in green), key=lambda n: green[n])
    print("staleness head (next window re-checks first):")
    for n in stale[:10]:
        print(f"  r{green[n]}  {n}")


if __name__ == "__main__":
    main()
