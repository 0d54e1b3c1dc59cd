"""Structural stale-row detection for the driver correctness prefix.

The driver checks a bounded PREFIX of the query registry each round, so
iteration order decides which queries get fresh hard-signal rows. Rounds
2 and 3 both leaked the same process failure: an operator was rewritten
AFTER its queries' last driver verification, and the hand-maintained
priority list didn't notice. This module replaces editorial judgment with
a ledger.

``driver_ledger.json`` (repo root, committed) records for every query the
last round a driver CORRECTNESS row existed and the md5 digest of the
query's source closure AT THAT round's verified commit:

    {"q01_pricing_summary": {"last_round": 3, "digest": "ab12..."}, ...}

At registry() time the CURRENT source closure digest is recomputed and
the priority order is derived:

    1. queries whose digest differs from the ledger (code changed since
       last driver row) or that have no ledger entry (never verified) —
       these need hard signal most;
    2. everything else, oldest driver row first (stale-tail rotation).

The "source closure" of a query is the module defining its callable plus
every ``carbondata_spark.*`` module it (transitively) imports, plus a
small always-included core set (catalog/functions — the delegation
targets of the registry helpers). ``queries.py`` itself and this module
are excluded: they hold registration/ordering plumbing whose edits do not
change query semantics, and hashing them would mark every query stale on
any registry reshuffle — defeating the rotation the ledger exists to
drive.

``tools/update_ledger.py`` refreshes the ledger from CORRECTNESS_r*.json
+ git history at the start of each round (digests are read from the
verified round's snapshot commit via ``git show``, so it is correct to
run it even after the working tree has diverged).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Callable

PACKAGE = "carbondata_spark"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO_ROOT, "driver_ledger.json")
# Builder-asserted behavior pins (committed): query names whose RESULT
# PATH was rewritten even though their own fn body is unchanged (the
# rewrite lives in an operator module shared by many closures, so
# fn_digest cannot see it — the r4 starvation class). Pinned names rank
# like direct body edits in the changed block. update_ledger prunes a
# pin once the query has been re-verified and its closure digest again
# matches the worktree.
PINS_PATH = os.path.join(REPO_ROOT, "driver_pins.json")

# Always part of every closure: targets of the queries.py helper shims
# (t -> catalog.load_table, r2 -> functions.dround).
CORE_MODULES = (f"{PACKAGE}.catalog", f"{PACKAGE}.functions")
# Plumbing whose changes never alter query results (see module doc).
EXCLUDED = {f"{PACKAGE}.queries", f"{PACKAGE}.ledger"}

_IMPORT_RE = re.compile(
    rf"^\s*(?:from\s+({PACKAGE}[\w.]*)\s+import|import\s+({PACKAGE}[\w.]*))",
    re.M,
)


def module_relpath(modname: str) -> str:
    """Dotted module name -> repo-relative file path (packages ->
    __init__.py)."""
    parts = modname.split(".")
    as_file = os.path.join(*parts) + ".py"
    as_pkg = os.path.join(*parts, "__init__.py")
    if os.path.isdir(os.path.join(REPO_ROOT, os.path.join(*parts))):
        return as_pkg
    return as_file


def read_source_worktree(modname: str) -> bytes | None:
    """Read a module's source from the current working tree."""
    path = os.path.join(REPO_ROOT, module_relpath(modname))
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError:
        return None


def imports_of(source: bytes) -> set[str]:
    """Intra-package modules imported by ``source``.

    ast-based so that every alias of ``import a, b`` and imports nested
    inside functions (``def f(): import carbondata_spark.x``) are seen —
    the earlier line-regex took only the first comma-separated module, so
    a closure edge could be silently dropped and a changed query
    under-prioritized. Falls back to the regex only if the source doesn't
    parse (a broken module shouldn't break ordering for everyone else).
    """
    import ast

    text = source.decode("utf-8", errors="replace")
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return {m.group(1) or m.group(2) for m in _IMPORT_RE.finditer(text)}
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PACKAGE):
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            # level>0 (relative) can't target the package root from inside
            # it by absolute name; the package uses absolute imports only.
            if node.level == 0 and node.module and node.module.startswith(PACKAGE):
                found.add(node.module)
                # ``from pkg.sub import mod`` may import a SUBMODULE, not a
                # name; add the candidate — module_closure drops entries
                # whose source file doesn't exist, so false candidates
                # (plain functions/classes) cost nothing.
                for alias in node.names:
                    if alias.name != "*":
                        found.add(f"{node.module}.{alias.name}")
    return found


def module_closure(
    roots: list[str], read_source: Callable[[str], bytes | None]
) -> dict[str, bytes]:
    """BFS the intra-package import graph from ``roots`` + CORE_MODULES,
    skipping EXCLUDED. Unreadable modules are simply absent (their
    importers' digests still change when they appear/disappear)."""
    todo = [*roots, *CORE_MODULES]
    seen: dict[str, bytes] = {}
    while todo:
        mod = todo.pop()
        if mod in seen or mod in EXCLUDED:
            continue
        src = read_source(mod)
        if src is None:
            continue
        seen[mod] = src
        todo.extend(m for m in imports_of(src) if m not in seen)
    return seen


def closure_digest(
    roots: list[str], read_source: Callable[[str], bytes | None]
) -> str:
    closure = module_closure(roots, read_source)
    h = hashlib.md5()
    for mod in sorted(closure):
        h.update(mod.encode())
        h.update(b"\x00")
        h.update(closure[mod])
        h.update(b"\x00")
    return h.hexdigest()


def fn_digest(
    modname: str, fn_name: str, read_source: Callable[[str], bytes | None]
) -> str | None:
    """md5 of the query function's own source segment (ast-extracted) —
    a FINER staleness signal than the module closure: a direct edit to
    the query's body marks it higher-priority than a change that reaches
    it only through a shared module. Returns None when the function can't
    be located (treated as changed)."""
    import ast

    src = read_source(modname)
    if src is None:
        return None
    try:
        text = src.decode("utf-8", errors="replace")
        tree = ast.parse(text)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == fn_name:
            seg = ast.get_source_segment(text, node)
            if seg is not None:
                return hashlib.md5(seg.encode()).hexdigest()
    return None


def load_ledger() -> dict[str, dict]:
    try:
        with open(LEDGER_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def load_pins() -> set[str]:
    try:
        with open(PINS_PATH) as f:
            return set(json.load(f))
    except (OSError, json.JSONDecodeError):
        return set()


MODE_PATH = os.path.join(REPO_ROOT, "driver_round_mode.json")


def latest_completed_round(repo_root: str | None = None) -> int:
    """Highest N among the committed BENCH_rN.json driver artifacts —
    the last round the driver finished. The ACTIVE round is this + 1
    (robust to ledger folding lag, unlike the ledger head)."""
    import re

    best = 0
    for f in os.listdir(repo_root or REPO_ROOT):
        m = re.match(r"BENCH_r(\d+)\.json$", f)
        if m:
            best = max(best, int(m.group(1)))
    return best


def round_mode_status(
    mode_path: str | None = None, active_round: int | None = None
) -> tuple[str, dict | None, int]:
    """Self-expiring optimization-round declaration (r18 ADVICE): returns
    (state, declaration, active_round) where state is

    - ``"absent"``    — no declaration (or not an optimization one):
                        build-round gates apply;
    - ``"suspended"`` — the declaration names the ACTIVE round: the
                        driver verifies the full registry, prefix-budget
                        gates legitimately stand down;
    - ``"expired"``   — the declaration names some OTHER round: a stale
                        file left behind. Consumers must HARD-FAIL, not
                        skip — a forgotten declaration must never become
                        a permanent bypass of the budget gate.
    """
    if active_round is None:
        active_round = latest_completed_round() + 1
    path = mode_path or MODE_PATH
    try:
        with open(path) as f:
            mode = json.load(f)
    except (OSError, json.JSONDecodeError):
        return ("absent", None, active_round)
    if not isinstance(mode, dict) or mode.get("mode") != "optimization":
        return ("absent", mode if isinstance(mode, dict) else None, active_round)
    try:
        declared = int(mode.get("round", -1))
    except (TypeError, ValueError):
        declared = -1
    if declared != active_round:
        return ("expired", mode, active_round)
    return ("suspended", mode, active_round)


def load_debt() -> dict | None:
    """The committed carried-dirt declaration (see DEBT_PATH), or None.

    Shape-validated, not just parse-validated: downstream consumers call
    ``int(debt["declared_round"])`` and iterate ``debt["rows"]`` — a
    declaration with ``declared_round: "nine"`` or a non-list ``rows``
    must read as *invalid* (None -> allowance applies), not crash the
    budget gate with an unhandled exception."""
    try:
        with open(DEBT_PATH) as f:
            debt = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if not isinstance(debt, dict) or "rows" not in debt:
        return None
    if not isinstance(debt.get("declared_round"), int) or isinstance(
        debt.get("declared_round"), bool
    ):
        return None
    rows = debt["rows"]
    if not isinstance(rows, list) or not all(isinstance(r, str) for r in rows):
        return None
    return debt


def debt_absorption_status(
    debt: dict,
    rounds: dict[str, int],
    registered: set[str],
) -> tuple[str, list[str]]:
    """Classify a declaration against the rotated ledger's per-query
    newest driver rounds. Returns (state, unabsorbed_rows) where state is

    * ``"pending"`` — rotation still sits at (or before) the declaration
      round: the declared rows' own verification lands in the NEXT
      round's driver run; nothing to enforce yet;
    * ``"absorbed"`` — every declared row still in the registry has a
      driver row from AFTER the declaration round: the carry was repaid
      and the declaration file should be deleted;
    * ``"violated"`` — a later round has been rotated in but some
      declared rows still lack a post-declaration driver row: the debt
      was silently outlived (the budget gate's aged-displacement check
      hard-fails on these same rows, but this check reports the breach
      by name at round start rather than at the next commit).

    Pure (no filesystem): tools/update_ledger.py acts on the verdict,
    tests/test_ledger.py pins the three states.
    """
    declared = int(debt.get("declared_round", -1))
    newest = max(rounds.values(), default=0)
    if newest <= declared:
        return "pending", []
    unabsorbed = [
        n
        for n in debt.get("rows", [])
        if n in registered and rounds.get(n, 0) <= declared
    ]
    return ("violated" if unabsorbed else "absorbed"), unabsorbed


# The driver's correctness harness checks a fixed-size prefix of the
# registry: 50 rows every round since r1 (CORRECTNESS_r1: 50 of 66;
# r5: 50 of 100). Observed behavior, not a published contract — keep
# the constant in one place so a driver change is a one-line fix.
DRIVER_PREFIX_BUDGET = 50
# Carried-dirt allowance: changed rows beyond the prefix budget whose
# last driver row is CURRENT (== the newest verified round) are debt
# the NEXT round's budget can absorb — but only if there are few of
# them. The allowance bounds deliberate trade-offs (e.g. round 6
# dirtying 2 non-headline closures to land ranking guards) while making
# a shared-module rewrite that dirties ~all fresh closures fail loudly.
CARRY_ALLOWANCE = 8
# Declared-debt escape hatch for the one case the allowance cannot
# model: a deliberate fix to a CORE module (store/catalog/functions)
# whose closure reaches ~every query, so the changed block exceeds the
# prefix budget no matter how the edit is sequenced — e.g. the r9
# compaction-provenance fix to store.py dirtied 86 of 114 closures;
# 50 is the hard per-round ceiling, so the current-round remainder
# carries (the exact row list lives in driver_debt.json, not here).
# Rather than silently committing through a red gate (the r8 failure)
# or shipping a known wrong-answer path for a round, the builder
# DECLARES the carry in ``driver_debt.json`` (committed):
#
#     {"declared_round": 9, "reason": "...", "rows": [...]}
#
# budget_report honors the declaration ONLY when every condition holds:
#   * no never-verified or aged row is displaced (hard fails stand);
#   * the declared rows EXACTLY equal the displaced set — any further
#     edit that changes the overflow invalidates the declaration and
#     the gate goes red again until the builder re-declares;
#   * the debt fits a single round's budget (next round CAN absorb it);
#   * declared_round == newest-verified-round + 1 (a declaration only
#     covers the round it was written in, never a later one).
# Absorption is machine-enforced, not aspirational: the carried rows'
# driver signal is one round stale, so next round they form the head of
# the changed block; if anything displaces them again they become AGED
# and the gate hard-fails. tools/update_ledger.py verifies at round
# start that a past declaration's rows were re-verified and deletes it
# (loud failure otherwise).
DEBT_PATH = os.path.join(REPO_ROOT, "driver_debt.json")


def _blocks(
    query_modules: dict[str, str | tuple[str, str]],
    ledger: dict[str, dict] | None = None,
    read_source: Callable[[str], bytes | None] = read_source_worktree,
    headline: frozenset[str] | set[str] = frozenset(),
    pins: set[str] | None = None,
) -> tuple[list[str], list[str]]:
    """(changed block, fresh block), each internally sorted.

    Changed-block key (headline first, then directly-edited-fn first,
    then last green round ASC): a headline query whose closure changed
    in any way must never miss the driver's bounded prefix — its bench
    number is the repo's public face — and a query whose OWN body was
    rewritten is higher-risk than one touched only transitively through
    a shared module (e.g. functions.py, whose edits reach every
    closure). Round 4 proved the old key wrong: (green_round, fn_same)
    let 15 new queries and the r1/r2 stale tail starve the
    directly-rewritten flagship q01 out of the 50-row prefix.
    Fresh block: oldest driver row first (stale-tail rotation).
    """
    if ledger is None:
        ledger = load_ledger()
    if pins is None:
        pins = load_pins()
    digest_cache: dict[str, str] = {}

    def digest(mod: str) -> str:
        if mod not in digest_cache:
            digest_cache[mod] = closure_digest([mod], read_source)
        return digest_cache[mod]

    changed: list[tuple[int, int, int, int, str]] = []
    fresh: list[tuple[int, int, str]] = []
    for i, (name, spec) in enumerate(query_modules.items()):
        mod, fname = spec if isinstance(spec, tuple) else (spec, None)
        entry = ledger.get(name)
        if entry is None or entry.get("digest") != digest(mod):
            # Red-last-row and never-verified count as green round 0.
            green = int(entry.get("last_green_round", 0)) if entry else 0
            fn_same = 1  # default: not directly edited
            if entry is None:
                fn_same = 0  # brand new -> treat as direct
            elif fname is not None and entry.get("fn_digest") is not None:
                cur = fn_digest(mod, fname, read_source)
                fn_same = 1 if cur == entry["fn_digest"] else 0
            if name in pins:
                # builder-asserted behavior rewrite in a shared operator
                # module — rank like a direct body edit (see PINS_PATH)
                fn_same = 0
            changed.append((0 if name in headline else 1, fn_same, green, i, name))
        else:
            fresh.append((int(entry.get("last_round", 0)), i, name))
    changed.sort()
    fresh.sort()
    return [n for *_, n in changed], [n for *_, n in fresh]


def priority_order(
    query_modules: dict[str, str | tuple[str, str]],
    ledger: dict[str, dict] | None = None,
    read_source: Callable[[str], bytes | None] = read_source_worktree,
    headline: frozenset[str] | set[str] = frozenset(),
    pins: set[str] | None = None,
) -> list[str]:
    """Derive registry iteration order from the ledger.

    ``query_modules``: query name -> defining module (or (module,
    fn_name)), in registry insertion order (which breaks ties within
    each group). ``headline``: names of bench-headline queries.

    Order: [closure-changed queries] then [unchanged, oldest driver row
    first]; see ``_blocks`` for the within-block keys.
    """
    changed, fresh = _blocks(query_modules, ledger, read_source, headline, pins)
    return [*changed, *fresh]


def budget_report(
    query_modules: dict[str, str | tuple[str, str]],
    ledger: dict[str, dict] | None = None,
    read_source: Callable[[str], bytes | None] = read_source_worktree,
    headline: frozenset[str] | set[str] = frozenset(),
    pins: set[str] | None = None,
    budget: int = DRIVER_PREFIX_BUDGET,
    debt: dict | None | str = "load",
) -> dict:
    """Size the changed block against the driver's checked-prefix budget.

    Round 5's lesson: wide shared-module edits landed AFTER the driver
    verified 50 rows, silently re-dirtying all 50 — the overrun was
    discovered at verdict time, a round too late. This makes it loud at
    commit time (tools/check_budget.py + test_ledger.py).

    Three-tier verdict, because not all overflow is equal:

    - ``new_displaced`` (HARD FAIL): a NEVER-VERIFIED query (no driver
      row in any round — a registry entry added this round) sorts
      outside the prefix. Adding a query the driver cannot reach means
      shipping an operator with zero hard signal; the registry grew
      past what the round's budget can absorb.
    - ``aged_displaced`` (HARD FAIL): a changed query whose last driver
      row predates the newest verified round sorts OUTSIDE the prefix —
      its hard signal would go >=2 rounds stale. This is the r4
      starvation class and is never acceptable.
    - ``displaced`` beyond CARRY_ALLOWANCE (FAIL): overflow rows whose
      signal is current (newest round) are one-round debt the next
      round can absorb — but only a bounded number of them. An
      unbounded carry is how a functions.py edit re-dirties 50 fresh
      closures in one commit. EXCEPTION: a committed declaration in
      ``driver_debt.json`` (see DEBT_PATH doc) lifts the allowance for
      one round when the displaced set is exactly the declared one, all
      current-round, and fits next round's budget.
    """
    if ledger is None:
        ledger = load_ledger()
    if debt == "load":
        debt = load_debt()
    changed, _fresh = _blocks(query_modules, ledger, read_source, headline, pins)
    max_round = max(
        (int(e.get("last_round", 0)) for e in ledger.values()), default=0
    )
    displaced = changed[budget:]
    new_displaced = [
        n for n in displaced if int(ledger.get(n, {}).get("last_round", 0)) == 0
    ]
    aged_displaced = [
        n
        for n in displaced
        if n not in new_displaced
        and int(ledger.get(n, {}).get("last_round", 0)) < max_round
    ]
    debt_honored = bool(
        debt
        and not new_displaced
        and not aged_displaced
        and len(displaced) > CARRY_ALLOWANCE
        and set(debt.get("rows", [])) == set(displaced)
        and len(displaced) <= budget
        and int(debt.get("declared_round", -1)) == max_round + 1
    )
    ok = debt_honored or (
        not new_displaced
        and not aged_displaced
        and len(displaced) <= CARRY_ALLOWANCE
    )
    return {
        "changed": len(changed),
        "budget": budget,
        "displaced": displaced,
        "new_displaced": new_displaced,
        "aged_displaced": aged_displaced,
        "carry_allowance": CARRY_ALLOWANCE,
        "max_round": max_round,
        "declared_debt": debt_honored,
        "ok": ok,
    }
