"""Registry-wide numeric-robustness audit of rounded double aggregates.

The r3 escape (`q_complex_sql_load`): an oracle's `round(sum(double), 2)`
landed 3.8e-5 from a half-cent boundary while cross-engine summation
order drifts ~1e-4 at that magnitude — Spark and DuckDB rounded to
different cents. This audit makes that failure mode measurable for EVERY
registered oracle:

For each oracle containing `round(expr, n)`, the rounding is stripped
(balanced-paren rewrite) and the query re-run in DuckDB at the target sf.
For every float column produced by a stripped round, each value v is
scored:

    margin(v, n) = | frac(|v| * 10^n) - 0.5 |   (distance to the nearest
                                                 rounding boundary, in
                                                 scaled units)
    drift(v, n)  = |v| * 10^n * 1e-12           (generous cross-engine
                                                 summation-order drift:
                                                 ~1e5 terms x ulp, i.e.
                                                 relative ~2e-12)

A value is FRAGILE when margin < 100 * drift (less than a 100x safety
factor between the boundary and plausible engine drift) — including the
degenerate case where drift alone exceeds any possible margin (|v| >~
2.5e7 at n=2), where rounding a double sum to cents is unsound no matter
where the data lands and the query must sum decimals instead.

Reported ``min_margin``/``max_drift`` are the (margin, drift) of the
single WORST value-scale pair — the minimizer of margin - SAFETY*drift —
not independent extremes across values (pairing one value's margin with
a different value's drift would conflate unrelated cells).

Usage:
    python tools/margin_audit.py [--round N] [sf_dir ...]
    (default sfs: sf0.01 + sf0.1; default round: latest CORRECTNESS + 1)

Writes MARGIN_AUDIT_r{N}.json {query: {min_margin, max_drift, fragile,
n_values}} and exits non-zero if any query is fragile — also invoked by
tests/test_margin_audit.py so a fragile oracle fails CI.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAFETY = 100.0
REL_DRIFT = 1e-12

_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)


def strip_rounds(sql: str) -> tuple[str, list[int], bool]:
    """Replace every top-level-or-nested ``round(expr, n)`` with
    ``(expr)``; return (rewritten SQL, scales found, accumulative?).

    ``accumulative`` is True when any stripped expression contains an
    order-dependent float aggregate (sum/avg over doubles drifts between
    engines; a ratio/scalar computed per-row from identical doubles is
    bit-identical in both engines and carries zero cross-engine drift, so
    its distance-to-boundary is irrelevant).

    Paren balancing and the argument-comma split skip quoted literals
    (single or double; a doubled '' escape reads as close-then-reopen,
    which nets out) — an oracle like ``round(sum(instr(s, '(')), 2)``
    previously mis-sliced the expression."""
    scales: list[int] = []
    accumulative = False
    while True:
        m = _ROUND_RE.search(sql)
        if not m:
            return sql, scales, accumulative
        start = m.end()  # position after "round("
        depth, i, quote = 1, start, None
        while depth:
            ch = sql[i]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        inner = sql[start : i - 1]
        # split "expr, n" at the last top-level comma (quote-aware too)
        depth2, split, quote = 0, -1, None
        for j, ch in enumerate(inner):
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                split = j
        if split < 0:
            expr, n = inner, 0  # round(x) = scale 0
        else:
            expr, tail = inner[:split], inner[split + 1 :]
            try:
                n = int(tail.strip())
            except ValueError:
                expr, n = inner, 0
        scales.append(n)
        # sum/avg over DOUBLES drifts with partial-agg order; a sum over a
        # DECIMAL cast is exact in both engines (the registry's remedy for
        # flagged queries), so it does not count as drifting.
        if re.search(r"\b(sum|avg)\s*\(", expr, re.IGNORECASE) and not re.search(
            r"\bdecimal\b", expr, re.IGNORECASE
        ):
            accumulative = True
        sql = sql[: m.start()] + "(" + expr + ")" + sql[i:]


def audit_value(v: float, n: int) -> tuple[float, float]:
    scaled = abs(v) * (10.0**n)
    frac = scaled - math.floor(scaled)
    margin = abs(frac - 0.5)
    drift = scaled * REL_DRIFT
    return margin, drift


def audit_query(con, name: str, sql: str) -> dict | None:
    stripped, scales, accumulative = strip_rounds(sql)
    if not scales:
        return None
    if not accumulative:
        return None  # per-row/ratio rounding of identical doubles: no drift
    try:
        pdf = con.execute(stripped).fetchdf()
    except Exception as e:  # stripped SQL failed (e.g. round on non-numeric)
        # an unauditable accumulative oracle must FAIL the gate loudly,
        # not vanish: treat as fragile
        return {"error": str(e)[:200], "fragile": True}

    # A fragile value is fragile at ITS column's scale; column->scale
    # mapping is not recoverable from the stripped SQL, so score every
    # value at EVERY scale the query uses and take the worst — coarser
    # scales do not subsume finer ones (x.005 has margin 0 at n=2 but 0.5
    # at n=4). Conservative by design: a false flag costs one decimal
    # conversion, a miss ships the r3 failure mode.
    min_margin, max_drift, count = math.inf, 0.0, 0
    for col in pdf.columns:
        if pdf[col].dtype.kind != "f":
            continue
        for v in pdf[col]:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            for n in set(scales):
                margin, drift = audit_value(float(v), n)
                if margin - SAFETY * drift < min_margin - SAFETY * max_drift:
                    min_margin, max_drift = margin, drift
            count += 1
    if count == 0:
        return None
    return {
        "min_margin": min_margin,
        "max_drift": max_drift,
        "fragile": min_margin < SAFETY * max_drift,
        "n_values": count,
        "scales": sorted(set(scales)),
    }


def current_round() -> int:
    """Round being BUILT now = latest driver CORRECTNESS round + 1 (the
    driver writes CORRECTNESS_r{N}.json after the round's snapshot)."""
    import glob

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def main(sf_dirs: list[str], round_no: int | None = None) -> int:
    from carbondata_spark.oracle import duckdb_connection
    from carbondata_spark.queries import registry

    report: dict[str, dict] = {}
    fragile = []
    for sf_dir in sf_dirs:
        con = duckdb_connection(sf_dir)
        for name, q in registry().items():
            if not q.oracle:
                continue
            res = audit_query(con, name, q.oracle)
            if res is None:
                continue
            prev = report.get(name)
            # keep the worst observation across sfs: fragile (incl.
            # error-as-fragile) always sticks and is never overwritten by
            # a later clean measurement; among clean ones keep the
            # smallest safety headroom
            if prev is None:
                report[name] = {**res, "sf_dir": sf_dir}
            elif prev.get("fragile"):
                pass  # already failing: a cleaner later run must not hide it
            elif res.get("fragile") or (
                "min_margin" in res
                and "min_margin" in prev
                and res["min_margin"] - SAFETY * res["max_drift"]
                < prev["min_margin"] - SAFETY * prev["max_drift"]
            ):
                report[name] = {**res, "sf_dir": sf_dir}
        con.close()
    for name, res in sorted(report.items()):
        if res.get("fragile"):
            fragile.append(name)
            if "error" in res:
                print(f"FRAGILE {name}: audit error {res['error'][:120]}")
            else:
                print(f"FRAGILE {name}: margin={res['min_margin']:.3g} "
                      f"drift={res['max_drift']:.3g} at {res['sf_dir']}")
    rnd = current_round() if round_no is None else round_no
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       f"MARGIN_AUDIT_r{rnd:02d}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True, default=str)
        f.write("\n")
    print(f"audited {len(report)} rounded oracles, {len(fragile)} fragile -> {out}")
    return 1 if fragile else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    rnd = None
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        del argv[i : i + 2]
    dirs = argv or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    raise SystemExit(main(dirs, round_no=rnd))
