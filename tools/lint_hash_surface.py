#!/usr/bin/env python3
"""Hash-surface lint: flag query outputs whose values could diverge in a
comparator that coerces decimals through float64.

The r8 driver adjudication showed q332 — the only query of 369 whose
output carried DECIMAL(38,0) values beyond 2^53 — hash-red while the
local gate passed bit-for-bit: any comparator-side decimal->float64
coercion silently rounds such values, so the hash surface must stay
float64-exact even when the arithmetic is exact on both engines
(VERDICT r8 #1/#3).

Scans a Verify output dir (run at sf0.1, where magnitudes are largest)
and flags, per query/column:
  * any decimal-typed parquet column whose |value| exceeds 2^53
  * any integer column whose |value| exceeds 2^53 (same coercion risk)
  * decimal columns with scale > 0 (the suite's convention is exact
    integer surfaces; fractional decimals are listed for awareness,
    flagged only if they also exceed 2^53 in magnitude)

Exit 1 iff a hard flag fires that is not justified in docs/NOTES.md
(justification = the literal query name appearing in the NOTES.md
"hash-surface" section); the flag text tells you which.

Usage: python3 tools/lint_hash_surface.py <verifyOutDir> [query ...]
"""
import os
import re
import sys

import duckdb

LIMIT = 2 ** 53
# Epoch-microsecond timestamps are SCALE-INVARIANT (they never grow with
# corpus size), so the --margin heuristic built for sums must not apply;
# they are exempt from the margin iff they stay under the year-2255
# magnitude (the point where an epoch-us value crosses 2^53 and a
# float64-coercing comparator starts rounding it). Recognized by the
# suite's `_us` column-name convention AND a plausibility floor (year
# 2000) so an ordinary sum can't ride the exemption by name alone.
YEAR_2255_US = 8_993_721_600_000_000  # 2255-01-01T00:00:00Z in epoch us
YEAR_2000_US = 946_684_800_000_000    # 2000-01-01T00:00:00Z in epoch us


def justified(notes_text, name):
    # A justification is a LIST ENTRY starting with the query name inside
    # the hash-surface section ("- q243_twap: ..."), not any prose mention
    # of the name — narrative text must not silently suppress a flag.
    m = re.search(r"## hash-surface[\s\S]*?(?=\n## |\Z)", notes_text)
    if not m:
        return False
    return bool(re.search(rf"^\s*[-*]\s+{re.escape(name)}\b",
                          m.group(0), re.MULTILINE))


def main():
    # --margin N divides the 2^53 limit: gate runs at small SFs pass
    # --margin so a column that would exceed 2^53 at sf0.1 (sums scale
    # ~linearly with corpus size) is flagged at authoring time, not only
    # in the close-chain sf0.1 sweep.
    args = sys.argv[1:]
    margin = 1
    if args and args[0] == "--margin":
        margin = int(args[1])
        args = args[2:]
    global LIMIT
    LIMIT = LIMIT // margin
    out_dir = args[0]
    only = set(args[1:])
    notes_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                              "NOTES.md")
    notes = ""
    if os.path.exists(notes_path):
        with open(notes_path) as f:
            notes = f.read()
    con = duckdb.connect()
    n_flag = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        try:
            rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"SKIP {name}: unreadable: {str(e).splitlines()[0]}")
            continue
        for col, dtype in zip(rel.columns, rel.types):
            ds = str(dtype)
            is_dec = ds.startswith("DECIMAL")
            is_int = ds in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                            "UBIGINT")
            if not (is_dec or is_int):
                continue
            q = f'SELECT max(abs(CAST("{col}" AS HUGEINT))) FROM rel'
            if is_dec and ",0)" not in ds:
                # fractional decimal: flag on the integer part of the
                # VALUE's magnitude (past 2^53 even the integer digits
                # are unrepresentable in float64). trunc DIRECTLY on the
                # DECIMAL — exact; routing through DOUBLE first would
                # itself round a just-above-2^53 value back to exactly
                # 2^53 and let it escape the check (r9 advice).
                q = f'SELECT max(abs(CAST(trunc("{col}") AS HUGEINT))) FROM rel'
            try:
                mx = con.sql(q).fetchone()[0]
            except Exception as e:
                print(f"SKIP {name}.{col}: {str(e).splitlines()[0]}")
                continue
            col_limit = LIMIT
            if (col.endswith("_us") and mx is not None
                    and YEAR_2000_US <= int(mx) < YEAR_2255_US):
                # scale-invariant epoch-us timestamp: exempt from the
                # sum-scaling margin, still bound by the full 2^53 limit
                # (== "below year-2255 magnitude"; beyond that it flags
                # like any other column, no NOTES prose can ride this).
                # A SUM that merely lands in the epoch window must not
                # ride the exemption: instants cluster — every value sits
                # in the window — while a sum's range dips below it, so
                # the min is checked too.
                try:
                    mn = con.sql(f'SELECT min(abs(CAST("{col}" AS HUGEINT)))'
                                 ' FROM rel').fetchone()[0]
                except Exception:
                    mn = None
                if mn is not None and int(mn) >= YEAR_2000_US:
                    col_limit = 2 ** 53
            if mx is not None and int(mx) > col_limit:
                tag = "JUSTIFIED" if justified(notes, name) else "FLAG"
                if tag == "FLAG":
                    n_flag += 1
                lim = ("2^53" if col_limit == 2 ** 53
                       else f"2^53/{margin} (gate margin)")
                print(f"{tag} {name}.{col} ({ds}): max |value| = {mx}"
                      f" > {lim} — a float64-coercing comparator rounds"
                      f" this; rescale to an exact coarser unit or"
                      f" justify in docs/NOTES.md '## hash-surface'")
    if n_flag:
        print(f"\n{n_flag} unjustified hash-surface flag(s)")
        sys.exit(1)
    print("hash-surface lint clean")


if __name__ == "__main__":
    main()
