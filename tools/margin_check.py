#!/usr/bin/env python
"""Transcendental rounding-margin audit (VERDICT r08 'Next round' #3).

The r08 driver red (`survival_km`) was caused by hashing
``round(<transcendental>, d)``: ln/exp/log are NOT bit-specified across
engines (JVM Math vs libm vs DuckDB differ by ~1 ulp), so a value
sitting within a few ulps of its rounding boundary flips a digit on a
different box and the whole-result hash dies. On the sf0.01 fixture the
fatal margin was 7.1e-11 — invisible to any green test run on a single
machine.

This tool makes thin margins a FAILURE before the driver box finds
them. For every ``oracle_sql()`` query whose SQL uses a
non-correctly-rounded transcendental (ln / exp / log / log2 / log10 /
pow / acos / asin / atan — IEEE-754 only mandates correct rounding for
sqrt, +, -, *, /), it:

1. locates every syntactically-direct ``round(EXPR, d)`` site whose
   EXPR contains such a function (paren-matched, innermost-first);
2. rewrites the site to a ``margin_round(EXPR, d, tag)`` DuckDB macro
   that ERRORS when |EXPR| sits within MARGIN_ULPS ulps of its
   round-half boundary, and otherwise returns ``round(EXPR, d)``
   unchanged;
3. runs the rewritten oracle on the sf0.01 fixture. A clean run proves
   every rounded transcendental on this fixture has at least
   MARGIN_ULPS ulps of slack — engine libm differences (~1 ulp) cannot
   flip the hashed digit.

A query that uses a transcendental but has NO direct round site is an
audit gap (the rounding may happen downstream of a CTE column) and
FAILS unless listed in ``NO_DIRECT_SITE_OK`` with a reason. Unflagged
round sites inside flagged queries are listed as warnings for manual
review (their inputs may still be transcendental-derived via a CTE
column; the flagged FINAL sites are the hashed ones, which is what the
driver compares).

Exit 0 = all margins safe; exit 1 = thin margin / audit gap / rewrite
breakage. Wired into tools/verify_all.sh.
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
MARGIN_ULPS = 1000.0

# Functions whose results are engine-dependent at the ulp level.
# sqrt is excluded: IEEE-754 requires it correctly rounded, so both
# engines produce the identical double for identical inputs.
TRANS = re.compile(
    r"\b(ln|exp|log2|log10|log|pow|acos|asin|atan2|atan)\s*\(", re.I
)

# transcendental-using queries where NO direct round site is expected,
# with the reason the absence is safe
NO_DIRECT_SITE_OK: dict[str, str] = {}


def _mask_quantized(expr: str) -> str:
    """Blank out ``round(...)::DECIMAL(p,s)`` subexpressions before the
    transcendental test: that pattern is the repo's QUANTIZATION BARRIER
    (exact re-quantization of a libm value at a fixed scale — the
    trigram/lr/gumbel recipe). Everything downstream of the barrier is
    exact decimal arithmetic, bit-identical across engines, so a
    transcendental INSIDE the barrier must not flag the OUTER round
    (the inner site is still independently audited). Exact decimals can
    legitimately sit exactly ON a tie boundary — deterministic in both
    engines (half-away-from-zero) — which the double-margin test would
    falsely flag."""
    out = expr
    while True:
        replaced = False
        for m in re.finditer(r"\bround\s*\(", out, re.I):
            i = m.end()
            depth, j = 1, i
            while depth and j < len(out):
                if out[j] == "(":
                    depth += 1
                elif out[j] == ")":
                    depth -= 1
                j += 1
            cast = re.match(
                r"\s*::\s*DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)", out[j:], re.I
            )
            if cast:
                out = out[: m.start()] + "__QUANTIZED__" + out[j + cast.end():]
                replaced = True
                break
        if not replaced:
            return out

MACRO = f"""
CREATE OR REPLACE MACRO margin_round(x, d, tag) AS (
    CASE WHEN abs(abs(x * pow(10.0, d)) % 1.0 - 0.5)
              < {MARGIN_ULPS} * abs(x) * 2.220446049250313e-16
                * pow(10.0, d)
         THEN error('THIN MARGIN ' || tag || ' value=' || x::VARCHAR)
         ELSE round(x, d) END
)
"""


def _round_sites(sql: str) -> list[tuple[int, int, str, str]]:
    """All ``round(...)`` call spans as (start, end, expr, digits);
    paren-matched, top-level-comma split."""
    sites = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        i = m.end()
        depth, j = 1, i
        while depth and j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        arg = sql[i : j - 1]
        depth, cut = 0, None
        for idx, ch in enumerate(arg):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                cut = idx
                break
        if cut is None:
            continue  # round(x) single-arg: integer round, no digits
        sites.append((m.start(), j, arg[:cut].strip(), arg[cut + 1 :].strip()))
    return sites


def rewrite(name: str, sql: str) -> tuple[str, int, int]:
    """Replace every round-of-transcendental site with margin_round.

    Innermost-first (single replacement per scan, then rescan) so nested
    sites like trigram's ``round(sum(round(ln(..), 8)..), 6)`` both get
    checked and offsets never go stale.
    """
    flagged = 0
    while True:
        done = True
        for start, end, expr, digits in _round_sites(sql):
            masked = _mask_quantized(expr)
            if (
                TRANS.search(masked)
                and "margin_round(" not in expr
                and "__QUANTIZED__" not in expr
            ):
                tag = f"{name}#{flagged}"
                sql = (
                    sql[:start]
                    + f"margin_round({expr}, {digits}, '{tag}')"
                    + sql[end:]
                )
                flagged += 1
                done = False
                break
        if done:
            break
    # outer rounds containing a margin_round rewrite (nested case) get
    # their own check when their REMAINING text still has an unquantized
    # transcendental. Count unaudited rounds for the warning report.
    unflagged = len(
        [
            1
            for _s, _e, expr, _d in _round_sites(sql)
            if not TRANS.search(_mask_quantized(expr))
        ]
    )
    return sql, flagged, unflagged


def main() -> int:
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    con.execute(MACRO)

    oracles = entry.oracle_sql()
    # banked-but-undeclared oracles are audited too (r12 ADVICE): a thin
    # margin must surface BEFORE the round that declares the query
    for bname, bsql in getattr(entry, "banked_oracle_sql", dict)().items():
        assert bname not in oracles, f"banked {bname} already declared"
        oracles[f"{bname} [banked]"] = bsql
    failures: list[str] = []
    checked = 0
    clean = 0
    for name in sorted(oracles):
        sql = oracles[name]
        if not TRANS.search(sql):
            clean += 1  # scanned and transcendental-free — reported below
            continue
        new_sql, flagged, unflagged = rewrite(name, sql)
        if flagged == 0:
            if name in NO_DIRECT_SITE_OK:
                print(f"skip {name}: {NO_DIRECT_SITE_OK[name]}")
                continue
            failures.append(
                f"{name}: uses a transcendental but has no direct "
                "round() site — audit gap; add the final rounding "
                "inline or document in NO_DIRECT_SITE_OK"
            )
            continue
        checked += 1
        try:
            con.execute(new_sql).fetchall()
            note = (
                f" ({unflagged} non-transcendental round site(s) "
                "unaudited)" if unflagged else ""
            )
            print(f"ok   {name}: {flagged} site(s) >= {MARGIN_ULPS:.0f} ulps"
                  f"{note}")
        except Exception as exc:  # noqa: BLE001 — report and fail
            msg = str(exc)
            if "THIN MARGIN" in msg:
                failures.append(f"{name}: {msg.splitlines()[0]}")
            else:
                failures.append(
                    f"{name}: rewrite broke the oracle — {msg.splitlines()[0]}"
                )
    print(f"\n{checked} transcendental quer{'y' if checked == 1 else 'ies'} "
          f"audited at the {MARGIN_ULPS:.0f}-ulp margin; "
          f"{clean} scanned transcendental-free of {len(oracles)} total")
    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(f"  {f}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
