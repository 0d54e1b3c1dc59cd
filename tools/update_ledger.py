"""Refresh driver_ledger.json from CORRECTNESS_r*.json + git history.

Run at the start of each round (idempotent, safe to re-run anytime): for
every query with at least one driver CORRECTNESS row, record the LATEST
round a row exists and the source-closure digest computed from the git
tree the driver verified that round — so later edits to the working tree
are detected as staleness, not silently absorbed.

Round -> verified commit resolution: the driver commits
"round N: end-of-round snapshot" and then runs verification, so that
snapshot IS the verified tree. Round 1 predates the snapshot convention;
its verified tree is the parent of the "round 1: verdict/..." commit.

Usage: python tools/update_ledger.py   (from anywhere inside the repo)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carbondata_spark.ledger import (  # noqa: E402
    LEDGER_PATH,
    PINS_PATH,
    REPO_ROOT,
    closure_digest,
    fn_digest,
    load_pins,
    module_relpath,
    read_source_worktree,
)


def round_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    commits: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): end-of-round snapshot", subject)
        if m:
            commits.setdefault(int(m.group(1)), sha)
            continue
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # fallback: tree the driver verified = parent of the verdict
            # commit (used for rounds without a snapshot commit, e.g. r1)
            commits.setdefault(int(m.group(1)), sha + "^")
    return commits


def git_reader(commit: str):
    cache: dict[str, bytes | None] = {}

    def read(modname: str) -> bytes | None:
        if modname not in cache:
            res = subprocess.run(
                ["git", "show", f"{commit}:{module_relpath(modname)}"],
                cwd=REPO_ROOT,
                capture_output=True,
            )
            cache[modname] = res.stdout if res.returncode == 0 else None
        return read_cached(modname)

    def read_cached(modname: str) -> bytes | None:
        return cache[modname]

    return read


def last_rounds() -> tuple[dict[str, int], dict[str, int]]:
    """query -> (latest round with any driver row, latest GREEN round).

    Green = full hash match, or a successful rows-only check for queries
    that declare no oracle (err == 'no_oracle').
    """
    latest: dict[str, int] = {}
    latest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            latest[name] = max(latest.get(name, 0), rnd)
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest, latest_green


def debt_check(rounds: dict[str, int], registered: set[str]) -> tuple[bool, list[str]]:
    """The declared-debt absorption gate, extracted from main() so tests
    can drive it by BEHAVIOR (exit-code contract) instead of pinning
    source strings: returns (failed, messages). Reads the declaration
    via ledger.load_debt()/DEBT_PATH (monkeypatchable), deletes the file
    when the debt is fully absorbed, and fails LOUDLY — ill-shaped file
    or violated declaration -> failed=True, which main() turns into a
    nonzero process exit."""
    from carbondata_spark import ledger as _ledger

    failed = False
    messages: list[str] = []
    debt = _ledger.load_debt()
    if debt is None and os.path.exists(_ledger.DEBT_PATH):
        # a declaration file EXISTS but failed shape validation: treating
        # it as "no debt" would silently drop the absorption check the
        # ledger docstring promises — fail as loudly as a violation
        failed = True
        messages.append(
            f"debt: FAILURE — {os.path.basename(_ledger.DEBT_PATH)} exists "
            "but is ill-shaped (declared_round must be an int, rows a list "
            "of strings); fix or remove the declaration"
        )
    if debt:
        declared = int(debt.get("declared_round", -1))
        state, unabsorbed = _ledger.debt_absorption_status(debt, rounds, registered)
        if state == "pending":
            # Declared while building round N (whose driver run checks the
            # prefix the debt was displaced FROM), so the debt rows' own
            # verification lands in round N+1's driver run.
            messages.append(
                f"debt: declared for r{declared}, pending "
                f"({len(debt.get('rows', []))} rows carry into r{declared + 1})"
            )
        elif state == "violated":
            failed = True
            messages.append(
                f"debt: FAILURE — r{declared} declaration NOT absorbed; "
                f"{len(unabsorbed)} rows still lack a post-declaration "
                "driver row: " + ", ".join(unabsorbed)
            )
        else:
            os.remove(_ledger.DEBT_PATH)
            messages.append(
                f"debt: r{declared} declaration fully absorbed "
                f"({len(debt.get('rows', []))} rows re-verified) — cleared"
            )
    return failed, messages


def main() -> int:
    """Returns a process exit code: 0 normally, 1 when a past debt
    declaration was VIOLATED (its rows outlived re-verification). The
    ledger docstring promises absorption is machine-enforced with a loud
    failure — loud must mean a nonzero exit so scripted/CI invocations
    can detect the breach, exactly like tools/check_budget.py."""
    from carbondata_spark.queries import registry

    commits = round_commits()
    rounds, green_rounds = last_rounds()
    reg = registry()
    readers = {rnd: git_reader(sha) for rnd, sha in commits.items()}
    ledger: dict[str, dict] = {}
    for name, q in reg.items():
        rnd = rounds.get(name)
        if rnd is None or rnd not in readers:
            continue  # never driver-verified -> no entry -> front-blocked
        mod = q.fn.__module__
        ledger[name] = {
            "last_round": rnd,
            "last_green_round": green_rounds.get(name, 0),
            "digest": closure_digest([mod], readers[rnd]),
            "fn_digest": fn_digest(mod, q.fn.__name__, readers[rnd]),
        }
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    n_changed = len(reg) - len(ledger)
    print(f"ledger: {len(ledger)} entries written, {n_changed} never-verified")

    # Prune behavior pins that have served their purpose: once the
    # pinned query's closure digest at its latest verified round again
    # matches the worktree, the rewrite it flagged has been re-verified.
    pins = load_pins()
    if pins:
        keep = set()
        for name in pins:
            if name not in reg:
                continue  # query retired -> drop the pin
            entry = ledger.get(name)
            if entry is None:
                keep.add(name)  # never verified -> pin still pending
                continue
            mod = reg[name].fn.__module__
            if closure_digest([mod], read_source_worktree) != entry["digest"]:
                keep.add(name)  # still stale -> keep the pin
        if keep != pins:
            with open(PINS_PATH, "w") as f:
                json.dump(sorted(keep), f, indent=1)
                f.write("\n")
        print(f"pins: {len(keep)} active ({len(pins) - len(keep)} pruned)")

    # Declared-debt absorption check (see ledger.DEBT_PATH doc): a past
    # round's driver_debt.json must be CLEARED by re-verification, never
    # silently outlived. While rotation sits at the declaration round the
    # debt is pending (its rows head the new changed block); once a later
    # round has been rotated in, every declared row must have a driver row
    # from after the declaration — then the file is deleted. Anything else
    # is a loud failure (and those rows are aged now, so the budget gate
    # below hard-fails too).
    failed, debt_messages = debt_check(rounds, set(reg))
    for line in debt_messages:
        print(line)

    # Round-start convenience: show where the refreshed ledger leaves the
    # driver-prefix budget (same report as tools/check_budget.py).
    from carbondata_spark.ledger import budget_report

    rep = budget_report(
        {n: (q.fn.__module__, q.fn.__name__) for n, q in reg.items()},
        headline={n for n, q in reg.items() if q.headline},
    )
    # The last printed line must agree with the exit code: a debt
    # failure above would otherwise end a failing run with "-> ok"
    # (budget_report ran with the ill-shaped/violated debt ignored).
    if failed:
        status = "FAILURE (debt)"
    else:
        status = "ok" if rep["ok"] else "OVERRUN"
    print(
        f"budget: changed {rep['changed']} / {rep['budget']} "
        f"(displaced {len(rep['displaced'])}, aged "
        f"{len(rep['aged_displaced'])}) -> {status}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
