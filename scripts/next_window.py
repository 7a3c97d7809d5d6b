#!/usr/bin/env python
"""Derive the next round's driver WINDOW from the CORRECTNESS history
— the steady-state rotation policy (suite/__init__.py, VERDICT r7 ask
#3) computed instead of hand-picked.

Rules, in seat-priority order:
  1. the PARITY_CORE is pinned (always seated, always first);
  2. ``--rewritten a,b`` force-seats specs whose semantics changed
     this round (the driver must independently re-check the NEW
     semantics — the r7 unit_minhash_estimate rule);
  3. never-driver-checked specs next, oldest-first (a renamed spec
     naturally re-queues here: its new name has no history);
  4. remaining seats go to driver-green specs oldest-checked-first
     (last green = the latest CORRECTNESS_r*.json whose row was
     fully green: hash_match, or err == "no_oracle" for the
     by-design rows-only path), ties broken by name.

Prints the 50-name list as a ready-to-paste Python literal plus a
per-seat provenance table on stderr. The WINDOW edit in
suite/__init__.py stays a reviewed manual paste — this script is the
policy's deterministic reference implementation, and
tests/test_rotation_policy.py pins its invariants against the real
history files.

Usage: python scripts/next_window.py [--rewritten a,b] [--seats 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Rename lineage (VERDICT r10 ask #5): CORRECTNESS history keys rows
# by the name a spec had THAT round, so a promotion/rename would
# otherwise reset the spec's oldest-checked age (its new name has no
# history) or — worse — credit the new meaning with the old
# meaning's greens. Each entry is (name as recorded, last round the
# record carried that MEANING, the spec's current name); a row is
# re-credited to the current name before the last-green scan. The
# mapping applies once per row (no chaining), so a name that appears
# on both sides — `rag_retrieval` below — stays unambiguous: r<=9
# rows under it were the float fold, r10+ rows the quant headline.
RENAMES: list[tuple[str, int, str]] = [
    # r10 promotion (SCALE.md round 10): the float fold's r5-r9 rows
    # continue as rag_retrieval_float_baseline ...
    ("rag_retrieval", 9, "rag_retrieval_float_baseline"),
    # ... and the quant twin's single r9 row continues as the
    # rag_retrieval headline.
    ("unit_rag_retrieval_quant", 9, "rag_retrieval"),
]


def lineage_name(name: str, rnd: int) -> str:
    """The CURRENT name of the spec a round-``rnd`` CORRECTNESS row
    named ``name`` (identity when no rename applies)."""
    for old, last_rnd, new in RENAMES:
        if name == old and rnd <= last_rnd:
            return new
    return name


def last_green_rounds(repo: str = REPO) -> dict[str, int]:
    """spec name -> latest round whose CORRECTNESS row was fully
    green (0 = never driver-checked under this name), with rows
    re-credited across renames via :data:`RENAMES`."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) or row.get("err") == "no_oracle"
            if green:
                name = lineage_name(name, rnd)
                out[name] = max(out.get(name, 0), rnd)
    return out


def next_window(
    all_names: list[str],
    core: list[str],
    last_green: dict[str, int],
    rewritten: list[str] = (),
    seats: int = 50,
) -> list[str]:
    window: list[str] = list(core)

    def seat(names):
        for n in names:
            if n not in window and len(window) < seats:
                window.append(n)

    seat([n for n in rewritten if n in all_names])
    rotating = sorted(
        (n for n in all_names if n not in core),
        key=lambda n: (last_green.get(n, 0), n),
    )
    seat(rotating)
    return window


def main() -> None:
    from validation_database_spark.suite import PARITY_CORE, _collect_all

    rewritten: list[str] = []
    if "--rewritten" in sys.argv:
        rewritten = sys.argv[sys.argv.index("--rewritten") + 1].split(",")
    seats = 50
    if "--seats" in sys.argv:
        seats = int(sys.argv[sys.argv.index("--seats") + 1])

    all_names = list(_collect_all())
    lg = last_green_rounds()
    window = next_window(all_names, PARITY_CORE, lg, rewritten, seats)

    for n in window:
        tag = (
            "core" if n in PARITY_CORE
            else "rewritten" if n in rewritten
            else f"last green r{lg[n]}" if n in lg
            else "never checked"
        )
        print(f"{n:45s} {tag}", file=sys.stderr)
    print("WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
