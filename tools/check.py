#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # generated-scale sweeps (sf1): cap DuckDB's thread pool so several
    # check shards can run side by side, and skip an oracle whose own
    # brute-force SQL exceeds the per-query budget (the TIMEOUT marks the
    # ORACLE's cost, not an engine mismatch — record and move on)
    if os.environ.get("CHECK_THREADS"):
        con.sql(f"SET threads={int(os.environ['CHECK_THREADS'])}")
    timeout_s = int(os.environ.get("CHECK_TIMEOUT_S", "0"))
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata is a single parquet FILE per table; ScaleData
        # (sf1 sweeps) writes a Spark DIRECTORY per table — glob it
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        alarm_fired = [False]  # ADVICE r11: only an alarm that actually
        # fired may reclassify DuckDB's InterruptException as a timeout —
        # a genuine failure mentioning 'interrupt' must stay a FAIL
        try:
            if timeout_s:
                import signal

                def _alarm(sig, frm):
                    alarm_fired[0] = True
                    raise TimeoutError(f"oracle exceeded {timeout_s}s")
                signal.signal(signal.SIGALRM, _alarm)
                signal.alarm(timeout_s)
                try:
                    want = con.sql(sql).df()
                finally:
                    signal.alarm(0)
            else:
                want = con.sql(sql).df()
        except TimeoutError as e:
            print(f"TIMEOUT {name}: {e}")
            n_timeout += 1
            continue
        except Exception as e:
            # the SIGALRM lands inside DuckDB's C loop, which reports it
            # as its own InterruptException — classify as the timeout it
            # is, but ONLY when our alarm demonstrably fired
            if alarm_fired[0] and "interrupt" in str(e).lower():
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s")
                n_timeout += 1
                continue
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        # driver-style compare: sort columns by name, then compare values
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(want.columns)}"
                  f"\n  spark:  {list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ oracle={len(want)} spark={len(got)}")
            n_fail += 1
            continue
        # dtype-strict gate: the driver hashes REPRESENTATIONS, so an
        # int64 column on one side and float64 on the other hash-differ
        # even when every value compares equal (the r3-q27 / r5-x6 trap).
        # Compare dtype KIND (i/u vs f vs O/b/M): the driver demonstrably
        # tolerates int32-vs-int64 (q75's rank is green) but not
        # int-vs-float, so exact-dtype equality would over-reject.
        def kind(dt):
            return "i" if dt.kind in "iu" else dt.kind
        dtype_diffs = [
            f"col {c}: dtype kind differs oracle={want[c].dtype} "
            f"spark={got[c].dtype}"
            for c in want.columns
            if kind(want[c].dtype) != kind(got[c].dtype)]
        if dtype_diffs:
            print(f"FAIL {name}:")
            for d in dtype_diffs:
                print("  " + d)
            n_fail += 1
            continue
        ws = want.sort_values(by=list(want.columns), ignore_index=True)
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        diffs = []
        for c in want.columns:
            a, b = ws[c], gs[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c}: {int(neq.sum())} mismatches, first@row{i}: "
                             f"oracle={a[i]!r} spark={b[i]!r} "
                             f"(dtypes {a.dtype}/{b.dtype})")
        if diffs:
            print(f"FAIL {name}:")
            for d in diffs:
                print("  " + d)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {len(want.columns)} cols)")
            n_pass += 1
    # queries without oracles: rows-only smoke
    import glob
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles or (only and name not in only):
            continue
        n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows (no oracle)")
    # timeouts are reported explicitly so a sweep with skipped oracles can
    # never read as full gate coverage (ADVICE r11); exit 2 marks a clean
    # run whose coverage nonetheless shrank
    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} timeout")
    sys.exit(1 if n_fail else (2 if n_timeout else 0))


if __name__ == "__main__":
    main()
