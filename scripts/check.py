#!/usr/bin/env python3
"""Local differential check mirroring the driver's correctness gate.

Loads each Verify output parquet and runs the matching oracle SQL in
DuckDB over the same scale-factor tables; sorts columns by name and
rows by all columns, then compares cell-by-cell (exact for
ints/strings/dates, 1e-9 relative for floats so we notice even tiny
drift before the driver's stricter hash does).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table = directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            failures.append((name, "missing spark output"))
            continue
        got = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        rel = con.sql(sql)
        # HUGEINT lint: pandas coerces DuckDB INT128 to float, so a hash
        # mismatch in the driver's bit-exact gate (which q22/q38/q44/q47
        # and q158 all hit via uncast SUMs) is invisible to the value
        # compare below.  Fail loudly on the TYPE instead.
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            failures.append((name, f"oracle columns type as HUGEINT "
                             f"(cast to BIGINT): {huge}"))
            print(f"FAIL {name}: HUGEINT oracle columns {huge}")
            continue
        want = rel.fetchdf()
        ok, why = compare(got, want)
        status = "OK " if ok else "FAIL"
        print(f"{status} {name}: spark={len(got)} oracle={len(want)}"
              + (f" — {why}" if why else ""))
        if not ok:
            failures.append((name, why))
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: {gc} vs {wc}"
    got = got[gc].sort_values(by=gc, ignore_index=True)
    want = want[wc].sort_values(by=wc, ignore_index=True)
    if len(got) != len(want):
        return False, f"row count {len(got)} vs {len(want)}"
    for c in gc:
        for i, (a, b) in enumerate(zip(got[c], want[c])):
            if not cell_eq(a, b):
                return False, f"col {c} row {i}: {a!r} != {b!r}"
    return True, ""


def cell_eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb), 1.0)
    if a is None or b is None:
        return a is None and b is None
    return str(a) == str(b)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
