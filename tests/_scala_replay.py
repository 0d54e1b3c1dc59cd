"""Generic replay harness for the reference's Scala golden test suites.

Extracts, at test time, the (beforeAll statements, per-test operation
scripts) from a reference Scala test class — nothing is copied into the
repo — and replays every statement through the repo's own SQL front
door (carbondata_spark.sql.CarbonSession). Two kinds of checkAnswer are
supported:

- ``checkAnswer(sql(q), Seq(Row(...), ...))`` — literal golden rows,
  compared as multisets with numeric tolerance and timestamp
  normalization;
- ``checkAnswer(sql(q1), sql(q2))`` — the reference's carbon-vs-hive
  differential form. The Hive side is emulated faithfully: the Scala
  ``create table ... row format delimited`` statements become plain
  ``spark.read.csv`` temp views (no header consumed — delimited Hive
  tables treat every line as data; the reference's own ORDER-equality
  checks only pass under that reading, so a ``skip.header.line.count``
  TBLPROPERTY on a headerless fixture is a no-op there too), and
  repeated LOADs accumulate as unions. Everything else (CREATE CUBE,
  LOAD DATA FACT/INPATH, DROP CUBE, SELECT) runs verbatim through
  CarbonSession.

The reference harness (CarbonHiveContext.scala:51) sets the global
property carbon.timestamp.format = "dd-MM-yyyy" before any suite runs;
suites that override it via CarbonProperties in their beforeAll (e.g.
directdictionary) declare their own properties in the SUITES table.
"""

from __future__ import annotations

import datetime
import decimal
import math
import re
from functools import reduce

RES = "/root/reference/integration/spark/src/test/resources"
BASE = (
    "/root/reference/integration/spark/src/test/scala/org/carbondata/"
    "integration/spark/testsuite"
)


# --------------------------------------------------------------------------
# Scala source scanning (string-literal aware)
# --------------------------------------------------------------------------


def strip_comments(src: str) -> str:
    """Remove /* */ blocks and // line comments (the reference leaves
    whole test bodies inside block comments — those are NOT part of its
    acceptance surface and must not be extracted).

    Quote-aware: a ``/*`` inside a Scala string literal (e.g. a SQL hint
    or glob in a future reference suite) must NOT open a comment — a
    regex strip would truncate extraction mid-statement and silently
    drop every op/checkAnswer after it."""
    out, i, n = [], 0, len(src)
    while i < n:
        ch = src[i]
        if ch == "'" and (
            (i + 2 < n and src[i + 1] != "\\" and src[i + 2] == "'")
            or (i + 3 < n and src[i + 1] == "\\" and src[i + 3] == "'")
        ):
            # Scala char literal ('x', '\n', '"', '\\'): copy verbatim so
            # a '"' literal does not open a pseudo-string that would
            # swallow real comments until the next double quote. A bare
            # apostrophe (Scala symbol / Hive-style quote inside SQL
            # text) falls through — only quote-char-quote shapes match.
            width = 4 if src[i + 1] == "\\" else 3
            out.append(src[i : i + width])
            i += width
        elif ch == '"':
            # copy the string literal verbatim (escape-aware); triple-
            # quoted strings copy as three adjacent literals, of which
            # the middle sees no escapes worth interpreting here
            out.append(ch)
            i += 1
            while i < n and src[i] != '"':
                if src[i] == "\\" and i + 1 < n:
                    out.append(src[i : i + 2])
                    i += 2
                else:
                    out.append(src[i])
                    i += 1
            if i < n:
                out.append('"')
                i += 1
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j  # keep the newline
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\r\n":
        i += 1
    return i


def _read_string(s: str, i: int) -> tuple[str, int]:
    """s[i] == '\"' → (unescaped text, index after closing quote)."""
    assert s[i] == '"', s[i : i + 20]
    out, i = [], i + 1
    while s[i] != '"':
        if s[i] == "\\":
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out), i + 1


def _read_concat_string(s: str, i: int) -> tuple[str, int]:
    """Reads `"a" + s"b" + ...` starting at/before the first quote;
    returns (concatenated text, index after the last literal)."""
    parts = []
    while True:
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == "s" and s[i + 1] == '"':  # s-interpolator
            i += 1
        if i >= len(s) or s[i] != '"':
            break
        text, i = _read_string(s, i)
        parts.append(text)
        j = _skip_ws(s, i)
        if j < len(s) and s[j] == "+":
            i = j + 1
        else:
            break
    return "".join(parts), i


def _balanced(s: str, i: int) -> int:
    """s[i] == '(' → index AFTER the matching ')', skipping strings."""
    assert s[i] == "("
    depth = 0
    while True:
        c = s[i]
        if c == '"':
            _, i = _read_string(s, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1


def _read_sql_arg(s: str, i: int) -> tuple[str, int]:
    """s[i] == '(' of a sql( call → (concatenated statement text, index
    after the matching ')')."""
    end = _balanced(s, i)
    inner = s[i + 1 : end - 1]
    text, _ = _read_concat_string(inner, 0)
    return text, end


_TOKEN = re.compile(r"\bcheckAnswer\s*\(|\bsql\s*\(")


def extract_ops(block: str) -> list[tuple]:
    """Ordered ops: ("stmt", text) | ("golden", q, seq_src) |
    ("pair", q1, q2)."""
    ops, i = [], 0
    while True:
        m = _TOKEN.search(block, i)
        if not m:
            return ops
        if m.group(0).lstrip().startswith("checkAnswer"):
            outer_end = _balanced(block, m.end() - 1)
            j = _skip_ws(block, m.end())
            assert block.startswith("sql", j), block[j : j + 40]
            q1, j = _read_sql_arg(block, block.index("(", j))
            j = _skip_ws(block, j)
            assert block[j] == ",", block[j : j + 40]
            j = _skip_ws(block, j + 1)
            if block.startswith("sql", j):
                q2, _ = _read_sql_arg(block, block.index("(", j))
                ops.append(("pair", q1, q2))
            else:
                assert block.startswith("Seq", j), block[j : j + 40]
                k = block.index("(", j)
                ops.append(("golden", q1, block[k : _balanced(block, k)]))
            i = outer_end
        else:
            text, i = _read_sql_arg(block, m.end() - 1)
            ops.append(("stmt", text))


def parse_suite(scala_path: str) -> tuple[list[tuple], list[tuple[str, list[tuple]]]]:
    """(beforeAll ops, [(test name, ops)]) from a Scala suite file."""
    src = strip_comments(open(scala_path).read())
    before_ops: list[tuple] = []
    m = re.search(r"def\s+beforeAll\s*\{", src)
    if m:
        start = src.index("{", m.start())
        depth, i = 0, start
        while True:
            c = src[i]
            if c == '"':
                _, i = _read_string(src, i)
                continue
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        before_ops = extract_ops(src[start : i + 1])
    tests: list[tuple[str, list[tuple]]] = []
    for tm in re.finditer(r"\btest\s*\(", src):
        name, j = _read_concat_string(src, tm.end())
        j = _skip_ws(src, j)
        if src[j] != ")":
            continue
        j = _skip_ws(src, j + 1)
        if src[j] != "{":
            continue
        depth, i = 0, j
        while True:
            c = src[i]
            if c == '"':
                _, i = _read_string(src, i)
                continue
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        tests.append((name, extract_ops(src[j : i + 1])))
    return before_ops, tests


# --------------------------------------------------------------------------
# Golden Seq(Row(...)) parsing (Timestamp.valueOf → quoted string)
# --------------------------------------------------------------------------


def parse_seq(s: str) -> list[tuple]:
    s = re.sub(r"Timestamp\.valueOf\(\s*\"([^\"]+)\"\s*\)", r'"\1"', s)

    def conv(tok: str, quoted: bool):
        if quoted:
            return tok
        if tok == "null":
            return None
        try:
            return int(tok)
        except ValueError:
            return float(tok)

    rows, i = [], 0
    while True:
        j = s.find("Row(", i)
        if j < 0:
            return rows
        i = j + 4
        depth, cur, buf, instr, quoted = 1, [], "", False, False
        while depth:
            c = s[i]
            if instr:
                if c == "\\":
                    buf += s[i + 1]
                    i += 2
                    continue
                if c == '"':
                    instr = False
                else:
                    buf += c
            elif c == '"':
                instr, quoted = True, True
            elif c == "(":
                depth += 1
                buf += c
            elif c == ")":
                depth -= 1
                if depth == 0:
                    cur.append(conv(buf.strip(), quoted))
                else:
                    buf += c
            elif c == "," and depth == 1:
                cur.append(conv(buf.strip(), quoted))
                buf, quoted = "", False
            else:
                buf += c
            i += 1
        rows.append(tuple(cur))


# --------------------------------------------------------------------------
# Multiset comparison with numeric / timestamp normalization
# --------------------------------------------------------------------------

_TS_RE = re.compile(r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})(\.0+)?$")


def _ts_norm(v):
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, str):
        m = _TS_RE.match(v)
        if m:
            return m.group(1)
    return v


def canon(v) -> str:
    v = _ts_norm(v)
    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return "∅" if math.isnan(v) else f"{v:.4f}"
    return str(v)


def cell_eq(a, b) -> bool:
    a, b = _ts_norm(a), _ts_norm(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, decimal.Decimal):
        a = float(a)
    if isinstance(b, decimal.Decimal):
        b = float(b)
    if isinstance(a, (int, float)) or isinstance(b, (int, float)):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def assert_rows_equal(got: list[tuple], expected: list[tuple], label: str):
    assert len(got) == len(expected), (
        f"{label}: {len(got)} rows vs expected {len(expected)}\n"
        f"got={sorted(got, key=lambda r: [canon(x) for x in r])[:5]}\n"
        f"exp={sorted(expected, key=lambda r: [canon(x) for x in r])[:5]}"
    )
    gs = sorted(got, key=lambda r: [canon(x) for x in r])
    es = sorted(expected, key=lambda r: [canon(x) for x in r])
    for g, e in zip(gs, es):
        assert len(g) == len(e) and all(cell_eq(a, b) for a, b in zip(g, e)), (
            f"{label}: row {g} != expected {e}"
        )


# --------------------------------------------------------------------------
# Suite runner: CarbonSession + Hive-table emulation
# --------------------------------------------------------------------------

_HIVE_CREATE = re.compile(
    r"create table (\w+)\s*\((.+)\)\s*row format delimited"
    r"(?:\s+fields terminated by '(.)')?.*",
    re.I | re.S,
)
_HIVE_LOAD = re.compile(
    r"load data local inpath\s*'([^']+)'\s*(overwrite\s+)?into table (\w+)\s*"
    r"(?:options\s*\(.*\))?$",
    re.I,
)
_DROP_TABLE = re.compile(r"drop table (\w+)$", re.I)


class SuiteSession:
    """One reference suite replayed against a fresh store."""

    def __init__(self, spark, scala_path: str, properties: dict[str, str]):
        from carbondata_spark.query_defs._tmpdirs import mkdtemp
        from carbondata_spark.sql import CarbonSession
        from carbondata_spark.store import CarbonStore

        self.spark = spark
        self.cs = CarbonSession(
            spark, CarbonStore(spark, mkdtemp(prefix="carbondata_refsuite_")),
            properties=properties,
        )
        self.hive: dict[str, dict] = {}
        self.before_ops, tests = parse_suite(scala_path)
        self.tests = dict(tests)
        for op in self.before_ops:
            assert op[0] == "stmt", f"unexpected beforeAll op {op[0]}"
            self.execute(op[1])

    # -- statement dispatch -------------------------------------------------
    def execute(self, stmt: str) -> None:
        s = " ".join(
            stmt.replace("./src/test/resources/", RES + "/").strip().rstrip(";").split()
        )
        m = _HIVE_CREATE.fullmatch(s)
        if m:
            name, cols, delim = m.group(1), m.group(2), m.group(3) or ","
            self.hive[name.lower()] = {
                "name": name, "cols": cols, "delim": delim, "parts": [],
            }
            self._refresh_hive(name.lower())
            return
        m = _HIVE_LOAD.fullmatch(s)
        if m and m.group(3).lower() in self.hive:
            spec = self.hive[m.group(3).lower()]
            if m.group(2):  # overwrite
                spec["parts"] = [m.group(1)]
            else:
                spec["parts"].append(m.group(1))
            self._refresh_hive(m.group(3).lower())
            return
        m = _DROP_TABLE.fullmatch(s)
        if m and m.group(1).lower() in self.hive:
            spec = self.hive.pop(m.group(1).lower())
            self.spark.catalog.dropTempView(spec["name"])
            return
        self.cs.sql(s)

    def _refresh_hive(self, key: str) -> None:
        spec = self.hive[key]
        if not spec["parts"]:
            df = self.spark.createDataFrame([], spec["cols"])
        else:
            reads = [
                self.spark.read.schema(spec["cols"])
                .option("header", False)
                .option("delimiter", spec["delim"])
                .csv(p)
                for p in spec["parts"]
            ]
            df = reduce(lambda a, b: a.unionAll(b), reads)
        df.createOrReplaceTempView(spec["name"])

    # -- test replay ---------------------------------------------------------
    def run_test(self, name: str) -> int:
        """Replays one test's ops; returns the number of checkAnswers."""
        checks = 0
        for op in self.tests[name]:
            if op[0] == "stmt":
                self.execute(op[1])
            elif op[0] == "golden":
                got = [tuple(r) for r in self.cs.sql(op[1]).collect()]
                assert_rows_equal(got, parse_seq(op[2]), f"{name}: {op[1]}")
                checks += 1
            else:  # pair
                got = [tuple(r) for r in self.cs.sql(op[1]).collect()]
                exp = [tuple(r) for r in self.cs.sql(op[2]).collect()]
                assert_rows_equal(got, exp, f"{name}: {op[1]} VS {op[2]}")
                checks += 1
        return checks
