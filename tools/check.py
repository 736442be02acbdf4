#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's output
against DuckDB oracles on the same parquet tables and diff values.

Usage: python tools/check.py <sfDir> <verifyOutDir> [receiptJsonPath]

When a third argument is given, a machine-readable receipt of the run
(per-query pass/fail + reasons, versions, totals) is written there —
committed per round so the round stays signed even if the driver's own
CORRECTNESS artifact comes back empty (round-18: the gate passed but the
artifact was `{}`).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, receipt_path=None):
    # version stamp: oracle semantics can shift across duckdb releases and
    # Spark float formatting across JDKs — make every gate run attributable
    import platform
    versions = f"duckdb={duckdb.__version__} python={platform.python_version()}"
    print(f"versions: {versions}")
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        import glob
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            results[name] = "FAIL: no spark result written"
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        try:
            exp = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            results[name] = f"FAIL: oracle error {e}"
            n_fail += 1
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            results[name] = f"FAIL: columns {gcols} != {ecols}"
            n_fail += 1
            continue
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            results[name] = f"FAIL: rows {len(g)} != {len(e)}"
            n_fail += 1
            continue
        bad = None
        maxdiff = 0.0
        for i, (rg, re_) in enumerate(zip(g, e)):
            for c in gcols:
                a, b = norm(rg[c]), norm(re_[c])
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    d = abs(a - b)
                    maxdiff = max(maxdiff, d)
                    if d > 0:
                        bad = bad or (i, c, a, b)
                else:
                    bad = bad or (i, c, a, b)
        if bad:
            i, c, a, b = bad
            exact = "EXACT-MISMATCH" if maxdiff == 0 else f"maxdiff={maxdiff:.3e}"
            print(f"FAIL {name}: row {i} col {c}: {a!r} != {b!r} ({exact})")
            results[name] = f"FAIL: row {i} col {c}: {a!r} != {b!r} ({exact})"
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            results[name] = f"PASS ({len(g)} rows)"
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if receipt_path:
        import time
        json.dump({"versions": versions, "sf_dir": sf_dir,
                   "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                   "pass": n_pass, "fail": n_fail, "results": results},
                  open(receipt_path, "w"), indent=1, sort_keys=True)
        print(f"receipt -> {receipt_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
