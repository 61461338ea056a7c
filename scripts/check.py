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

# SURVEY §8 portability rule, machine-enforced (round 13): every oracle
# result column must land in a type the driver's comparator renders
# identically to Spark's parquet output. DuckDB silently widens integer
# sums to HUGEINT and decimal math to DECIMAL — both render differently
# on the driver and false-green here if we only compare python values
# (this normalization blind spot cost round 10 [span_dedup] AND round 12
# [docs_jsonl/embeddings_jsonl]). Any oracle returning a type outside
# this set must CAST it, even when the values would compare equal.
# The set is EMPIRICAL, not aspirational: exactly the types returned by
# oracles with a hash-green driver row in CORRECTNESS_r12 (BIGINT 116,
# VARCHAR 57, DOUBLE 56, INTEGER 42, TIMESTAMP 13, BOOLEAN 11 queries).
# Extending it requires a driver-green gate that returns the new type.
PORTABLE_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "TIMESTAMP",
                  "INTEGER", "BOOLEAN"}

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
    # The span_dedup oracle derives spans from token ORDINALS: zipped
    # `unnest(ts)` + `generate_subscripts(ts, 1)` in one SELECT must
    # yield exactly len(ts) rows pairing each element with its 1-based
    # position (the round-11 driver red was an oracle construct the
    # driver's DuckDB evaluated differently; after the port, every
    # construct the oracle uses uniquely is pinned here by name).
    probe = con.sql(
        "SELECT unnest(['a','b','c']) AS tok, "
        "generate_subscripts(['a','b','c'], 1) AS ord").fetchall()
    assert probe == [("a", 1), ("b", 2), ("c", 3)], (
        f"DuckDB zipped unnest/generate_subscripts drifted: expected "
        f"[('a',1),('b',2),('c',3)], got {probe}; the span_dedup "
        f"oracle's ordinality derivation no longer pairs tokens with "
        f"their 1-based positions")
    # Span bucketing: floor((ord-1)/10.0) must map ordinals 1..10 to
    # span 0 and 11 to span 1 (the remainder-keeping tail span falls
    # out of grouping — no slice clamping involved).
    probe = con.sql(
        "SELECT CAST(floor((x - 1) / 10.0) AS INT) FROM "
        "(VALUES (1), (10), (11)) t(x) ORDER BY x").fetchall()
    assert [r[0] for r in probe] == [0, 0, 1], (
        f"DuckDB floor-division span bucketing drifted: expected "
        f"[0, 0, 1] for ordinals 1/10/11 at span size 10, got {probe}; "
        f"the span_dedup oracle's span_idx no longer matches Spark's")
    probe = con.sql(
        "SELECT string_agg(s, ' ' ORDER BY i) FROM (VALUES (2, 'b'), "
        "(1, 'a'), (3, 'c')) t(i, s)").fetchone()[0]
    assert probe == "a b c", (
        f"DuckDB string_agg ORDER BY drifted: expected 'a b c', got "
        f"{probe!r}; the span_dedup oracle's span/text reassembly is no "
        f"longer deterministic")
    # The bpe_train/bpe_encode oracle guards its per-round rewrite with
    # `LEFT JOIN best ON TRUE` so an empty argmax (no pairs anywhere)
    # preserves the corpus instead of annihilating it: 1-row right side
    # must attach to every left row, 0-row right side must keep left
    # rows with NULLs.
    probe = con.sql(
        "SELECT l.x, r.m FROM (VALUES (1), (2)) l(x) "
        "LEFT JOIN (SELECT 'ab' AS m) r ON TRUE ORDER BY l.x").fetchall()
    assert probe == [(1, "ab"), (2, "ab")], (
        f"DuckDB LEFT JOIN ON TRUE (1-row) drifted: expected the scalar "
        f"attached to every row, got {probe}; the BPE oracle's rewrite "
        f"stride join is broken")
    probe = con.sql(
        "SELECT l.x, r.m FROM (VALUES (1), (2)) l(x) "
        "LEFT JOIN (SELECT 'ab' AS m WHERE 1 = 0) r ON TRUE "
        "ORDER BY l.x").fetchall()
    assert probe == [(1, None), (2, None)], (
        f"DuckDB LEFT JOIN ON TRUE (0-row) drifted: expected left rows "
        f"kept with NULLs, got {probe}; the BPE oracle's empty-argmax "
        f"guard no longer preserves the corpus")
    # The BPE greedy rewrite selects every other match inside islands
    # of CONSECUTIVE match positions (the a==b run case): positions
    # [1,2,3,7] must select [1,3,7].
    probe = con.sql(
        "SELECT i FROM ("
        "  SELECT i, min(i) OVER (PARTITION BY grp) AS i0 FROM ("
        "    SELECT i, i - row_number() OVER (ORDER BY i) AS grp "
        "    FROM (VALUES (1), (2), (3), (7)) t(i))) "
        "WHERE (i - i0) % 2 = 0 ORDER BY i").fetchall()
    assert [r[0] for r in probe] == [1, 3, 7], (
        f"DuckDB island-alternation selection drifted: expected [1, 3, 7] "
        f"from match positions [1, 2, 3, 7], got {probe}; the BPE "
        f"oracle's greedy left-to-right rewrite no longer matches Spark's "
        f"fold")
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
            bad_types = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
                         if str(t) not in PORTABLE_TYPES]
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: non-portable oracle column type(s) "
                  f"{bad_types} — the driver renders these differently "
                  f"than Spark's parquet output; wrap in CAST "
                  f"(SURVEY §8 portability rule)")
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
