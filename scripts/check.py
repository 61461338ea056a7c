#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query...]

Loads each <verifyOutDir>/<name> parquet (Spark's output), runs the
matching SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), and compares: schema (column names), row count,
and values (columns sorted by name, rows sorted by all columns).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # The value_quantiles_approx oracle equates Spark percentile_approx
    # (exact regime) with DuckDB quantile_disc; both must pick the value
    # at rank ceil(p*n). Pin DuckDB's convention here so a semantics
    # drift fails with a NAMED cause instead of an opaque hash mismatch.
    probe = con.sql(
        "SELECT quantile_disc(x, 0.95), quantile_disc(x, 0.5), "
        "quantile_disc(x, 0.05) FROM range(1, 11) t(x)").fetchone()
    assert probe == (10, 5, 1), (
        f"DuckDB quantile_disc rank convention drifted: expected value at "
        f"rank ceil(p*n) == (10, 5, 1) on 1..10, got {probe}; the "
        f"value_quantiles_approx oracle equivalence no longer holds")
    # The span_dedup oracle slices token lists as ts[a : b] expecting
    # 1-based, BOTH-ends-inclusive semantics (mirroring Spark's
    # slice(ts, a, b-a+1)), and rebuilds text with string_agg(... ORDER
    # BY span_idx) expecting a deterministic, argument-ordered join.
    # Pin both so an engine drift fails with a named cause.
    probe = con.sql("SELECT range(1, 11)[2:4]").fetchone()[0]
    assert list(probe) == [2, 3, 4], (
        f"DuckDB list-slice convention drifted: expected [a:b] 1-based "
        f"inclusive == [2, 3, 4] on range(1,11)[2:4], got {probe}; the "
        f"span_dedup oracle's span slicing no longer mirrors Spark slice()")
    probe = con.sql("SELECT range(1, 11)[8:99]").fetchone()[0]
    assert list(probe) == [8, 9, 10], (
        f"DuckDB list-slice tail clamping drifted: expected [8, 9, 10] "
        f"on range(1,11)[8:99], got {probe}; the span_dedup oracle's "
        f"remainder-keeping tail span no longer mirrors Spark slice()")
    probe = con.sql(
        "SELECT string_agg(s, ' ' ORDER BY i) FROM (VALUES (2, 'b'), "
        "(1, 'a'), (3, 'c')) t(i, s)").fetchone()[0]
    assert probe == "a b c", (
        f"DuckDB string_agg ORDER BY drifted: expected 'a b c', got "
        f"{probe!r}; the span_dedup oracle's text reassembly is no "
        f"longer deterministic")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got ORDER BY ALL").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} duckdb={exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} duckdb={len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gs, es = [norm(x) for x in g], [norm(x) for x in e]
            if gs != es:
                bad = (i, gs, es)
                break
        if bad:
            i, gs, es = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {got_cols}\n  spark: {gs}\n  duck : {es}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
