"""What-if blast-radius planner: measure the driver-budget impact of
editing one or more carbondata_spark modules BEFORE writing the edit.

Round 17's lesson: the planned bloom+similarity+pipeline core blast
measured fine per-module in everyone's head (~45 rows) but composed to a
131-row changed block with 82 aged rows — an unfixable hard fail —
because similarity.py sits inside pipeline.py's module closure via the
per-query nested imports. This tool makes that math a one-liner instead
of a round-end surprise: it simulates an edit to the named modules (by
appending a byte to their source in the digest function only — nothing
on disk changes) and prints the budget report the gate would produce.

Usage:
  python tools/blast_radius.py carbondata_spark.bloom [more.modules ...]
  python tools/blast_radius.py --file carbondata_spark/bloom.py [...]

Exit 0 iff the simulated tree would pass the budget gate (possibly via a
declarable current-round-only carry), 1 otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_module(arg: str) -> str:
    if arg.endswith(".py") or "/" in arg:
        rel = arg[:-3] if arg.endswith(".py") else arg
        return rel.replace("/", ".").removesuffix(".__init__")
    return arg


def main(argv: list[str]) -> int:
    from carbondata_spark.ledger import (
        CARRY_ALLOWANCE,
        budget_report,
        read_source_worktree,
    )
    from carbondata_spark.queries import registry

    mods = {_to_module(a) for a in argv if a != "--file"}
    if not mods:
        print(__doc__)
        return 2

    def rs(modname: str) -> bytes | None:
        src = read_source_worktree(modname)
        if src is not None and modname in mods:
            return src + b"\n# blast-radius probe\n"
        return src

    reg = registry()
    rep = budget_report(
        {n: (q.fn.__module__, q.fn.__name__) for n, q in reg.items()},
        read_source=rs,
        headline={n for n, q in reg.items() if q.headline},
        debt=None,  # simulate a clean round: no pre-declared carry
    )
    print(f"simulated edit to: {', '.join(sorted(mods))}")
    print(
        f"changed block: {rep['changed']} / budget {rep['budget']}; "
        f"displaced {len(rep['displaced'])} "
        f"(allowance {CARRY_ALLOWANCE} without a declaration)"
    )
    if rep["aged_displaced"]:
        print(
            f"HARD FAIL — {len(rep['aged_displaced'])} AGED rows displaced "
            "(no debt declaration can lift this; split the edit):"
        )
        print("  " + ", ".join(rep["aged_displaced"]))
        return 1
    if rep["new_displaced"]:
        print(
            f"HARD FAIL — {len(rep['new_displaced'])} never-verified rows "
            "displaced: " + ", ".join(rep["new_displaced"])
        )
        return 1
    if len(rep["displaced"]) > rep["budget"]:
        print(
            "HARD FAIL — displaced set exceeds next round's whole prefix; "
            "no declaration can carry it"
        )
        return 1
    if len(rep["displaced"]) > CARRY_ALLOWANCE:
        print(
            "passes ONLY with a driver_debt.json declaration naming exactly "
            "these displaced rows (all current-round):"
        )
        print("  " + ", ".join(rep["displaced"]))
        return 0
    print("passes outright (carry within allowance)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
