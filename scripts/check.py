#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query...]
       python3 scripts/check.py --selftest

Loads each <verifyOutDir>/<name> parquet (Spark's output), runs the
matching SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), and compares the driver's triple: schema (column
names), row count, and a value hash (columns sorted by name, rows
sorted by all columns, values joined under control-character
separators so embedded text can never alias a field or row boundary).

--selftest property-tests the comparator itself on pathological values
(embedded separators/newlines, empty vs NULL, multi-kB strings with a
single deep flip, NaN) — added after round 10's span_dedup false-green,
where this stand-in passed bit-identical outputs that the driver's
comparator rejected on a multi-kB free-text column. That column is now
shipped as hash56+length (comparator-proof projection); the selftest
keeps THIS comparator honest about the failure modes we could name.
"""
import hashlib, json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def row_hash(rows):
    """Driver-style value hash over pre-sorted rows: unit separator
    (0x1f) between fields, record separator (0x1e) between rows — a
    field value containing commas/newlines/pipes cannot collide with a
    boundary (the ambiguity class the selftest pins). Every non-NULL
    value is tagged 0x01 and NULL is the bare tag 0x00, so NULL is
    distinct from EVERY string — including '', the literal 'None', and
    a lone NUL character."""
    h = hashlib.md5()
    for r in rows:
        for v in r:
            if v is None:
                h.update(b"\x00")
            else:
                h.update(b"\x01" + norm(v).encode("utf-8"))
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

def norm_row(r):
    """Row normalization for the row-by-row compare: None-ness is part
    of the value (norm alone would render NULL as the string 'None' and
    call a genuine data difference a comparator defect)."""
    return [(v is None, None if v is None else norm(v)) for v in r]

def selftest():
    long_a = "x" * 4096 + "y" + "x" * 4096
    long_b = "x" * 4096 + "z" + "x" * 4096
    cases = [
        # (name, rows_a, rows_b, must_be_equal)
        ("identical", [("a", 1)], [("a", 1)], True),
        ("deep flip in multi-kB string", [(long_a,)], [(long_b,)], False),
        ("embedded field separator", [("a,b", "c")], [("a", "b,c")], False),
        ("embedded newline vs two rows", [("a\nb",)], [("a",), ("b",)], False),
        ("trailing empty field", [("a", "")], [("a",)], False),
        ("empty string vs NULL", [("",)], [(None,)], False),
        ("literal 'None' vs NULL", [("None",)], [(None,)], False),
        ("lone NUL char vs NULL", [("\x00",)], [(None,)], False),
        ("NaN equals NaN", [(float("nan"),)], [(float("nan"),)], True),
        ("unicode vs escape", [("é",)], [("\\u00e9",)], False),
        ("field shift across columns", [("ab", "c")], [("a", "bc")], False),
    ]
    bad = 0
    for name, a, b, want_eq in cases:
        got_eq = row_hash(a) == row_hash(b)
        ok = got_eq == want_eq
        print(f"{'PASS' if ok else 'FAIL'} selftest: {name}")
        bad += 0 if ok else 1
    # Row-sort determinism: duplicate leading keys must still order by
    # the remaining columns before hashing (the driver sorts by ALL).
    rows = [("k", 2), ("k", 1)]
    assert row_hash(sorted(rows)) == row_hash([("k", 1), ("k", 2)])
    print(f"== selftest {'FAILED' if bad else 'ok'} ==")
    sys.exit(1 if bad else 0)

def main():
    if sys.argv[1] == "--selftest":
        selftest()
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
            gs, es = norm_row(g), norm_row(e)
            if gs != es:
                bad = (i, gs, es)
                break
        gh, eh = row_hash(got_rows), row_hash(exp_rows)
        if bad:
            i, gs, es = bad
            print(f"FAIL {name}: row {i} differs (hash {gh[:8]} vs {eh[:8]})\n"
                  f"  cols : {got_cols}\n  spark: {gs}\n  duck : {es}")
            n_fail += 1
        elif gh != eh:
            # Row-by-row said equal but the hashes disagree: a
            # comparator bug, not a data bug — fail loudly.
            print(f"FAIL {name}: rows compare equal but hashes differ "
                  f"({gh} vs {eh}) — comparator defect")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows, hash {gh[:8]})")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
