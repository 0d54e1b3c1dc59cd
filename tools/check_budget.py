"""CI-style gate: does the current working tree overrun the driver's
checked-prefix budget?

Run after any commit that touches carbondata_spark/ source (idempotent,
read-only). Prints the changed-block size vs the 50-row driver budget
and exits non-zero when the overrun is unacceptable per
ledger.budget_report: any AGED row displaced from the prefix (its hard
signal would go >=2 rounds stale — the r4 starvation class), or more
current-round carried-dirt rows than CARRY_ALLOWANCE (the r5 failure:
a shared-module edit silently re-dirtied all 50 just-verified rows).

Usage: python tools/check_budget.py   (from anywhere inside the repo)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import json

    from carbondata_spark.ledger import budget_report
    from carbondata_spark.queries import registry

    from carbondata_spark.ledger import round_mode_status

    state, mode, active = round_mode_status()
    if state == "suspended":
        print(
            f"round {active}: optimization round declared "
            "(driver_round_mode.json) — the driver re-verifies the FULL "
            "registry, so the prefix-budget gate is suspended this "
            "round; the declaration self-expires when BENCH_r"
            f"{active}.json lands (delete the file in the next build "
            "round, or this gate hard-fails)"
        )
        return 0
    if state == "expired":
        print(
            f"STALE driver_round_mode.json: declares round "
            f"{mode.get('round')!r} but the active round is {active} "
            "(latest committed BENCH artifact + 1). A forgotten "
            "optimization declaration must not silently bypass the "
            "budget gate — delete or update the file."
        )
        return 1

    reg = registry()
    rep = budget_report(
        {n: (q.fn.__module__, q.fn.__name__) for n, q in reg.items()},
        headline={n for n, q in reg.items() if q.headline},
    )
    print(
        f"changed block: {rep['changed']} / budget {rep['budget']} "
        f"(newest verified round: r{rep['max_round']})"
    )
    if rep["displaced"]:
        print(
            f"displaced from prefix ({len(rep['displaced'])}, "
            f"allowance {rep['carry_allowance']}): "
            + ", ".join(rep["displaced"])
        )
    if rep["aged_displaced"]:
        print(
            "AGED rows displaced (hard signal would go >=2 rounds stale): "
            + ", ".join(rep["aged_displaced"])
        )
    if rep["new_displaced"]:
        print(
            "NEW queries starved (never driver-verified, outside the "
            "prefix): " + ", ".join(rep["new_displaced"])
        )
    if not rep["ok"]:
        print(
            "FAIL: prefix budget overrun — back out, narrow the edit, or "
            "(core-module fix only) declare the carry in driver_debt.json"
        )
        return 1
    if rep["declared_debt"]:
        print(
            f"ok (declared debt: {len(rep['displaced'])} current-round rows "
            "carry to next round's prefix — see driver_debt.json)"
        )
    else:
        print("ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
