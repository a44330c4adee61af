#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs their DuckDB oracles.

Replicates the driver's t2 gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then:

    python3 tools/oracle_check.py <sfDir> <outDir>

For each query: loads the Spark parquet result and the DuckDB oracle
result, sorts columns by name, compares row counts, schemas (loosely)
and cell values. Exit 1 on any mismatch.
"""
import sys, json, glob, math
import duckdb

def family(duck_type):
    """Collapse a DuckDB type name to the family the driver's hasher
    distinguishes. Round 5's only red row was value-identical but typed
    HUGEINT (DuckDB's SUM(BIGINT) result) vs Spark's int64 — a class of
    bug the old value-only compare could not see. int widths <= 64 are
    one family (the driver tolerated INTEGER-vs-BIGINT all round)."""
    t = str(duck_type).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith(("STRUCT", "MAP")):
        return "struct"
    if "[]" in t or t.startswith("LIST"):
        return "list"
    for fam, names in [
        ("int", ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                 "USMALLINT", "UINTEGER", "INT")),
        ("hugeint", ("HUGEINT", "UBIGINT", "UHUGEINT")),
        ("float", ("FLOAT", "DOUBLE", "REAL")),
        ("string", ("VARCHAR", "STRING", "TEXT", "CHAR")),
        ("binary", ("BLOB", "BYTEA", "BINARY")),
        ("bool", ("BOOLEAN", "BOOL")),
        ("timestamp", ("TIMESTAMP", "DATETIME")),
        ("date", ("DATE",)),
    ]:
        if any(t.startswith(n) for n in names):
            return fam
    return t

def norm(v):
    if v is None:
        # NULLs sort before everything (Python can't compare None<int);
        # "" as the payload keeps the tuple comparable against any type
        # only when the non-null side also wraps — so wrap everything
        return (0, "")
    if isinstance(v, float):
        return (1, round(v, 9))
    # duckdb sha256 may return blobs in some versions
    if isinstance(v, (bytes, bytearray)):
        return (1, bytes(v).hex())
    return (1, v)

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # graft.Verify writes <name>.err with the failure cause —
            # surface it so a missing row self-diagnoses from this output
            try:
                why = open(f"{out_dir}/{name}.err").read().strip()
                why = "no spark output: " + " ".join(why.split())[:500]
            except OSError:
                why = "no spark output (no .err file — query never ran?)"
            failures.append((name, why))
            continue
        spark_rel = con.sql(f"SELECT * FROM parquet_scan({files!r})")
        spark_cols = list(spark_rel.columns)
        spark_types = dict(zip(spark_cols, spark_rel.types))
        spark_rows = spark_rel.fetchall()
        try:
            ora_rel = con.sql(sql)
        except Exception as e:
            failures.append((name, f"oracle sql error: {e}"))
            continue
        ora_cols = list(ora_rel.columns)
        ora_types = dict(zip(ora_cols, ora_rel.types))
        ora_rows = ora_rel.fetchall()
        if sorted(spark_cols) != sorted(ora_cols):
            failures.append((name, f"columns differ: {sorted(spark_cols)} vs {sorted(ora_cols)}"))
            continue
        # shape gate (the round-12 media_roundtrip class of bug): the
        # driver's pandas-based hasher throws on ndarray-valued cells
        # (`TypeError: unhashable type`), so list/struct result columns
        # must fail HERE even though this script's structural compare
        # could handle them — the local gate must predict the driver's
        nonscalar = [
            f"{c}: spark={spark_types[c]}" for c in sorted(spark_cols)
            if family(spark_types[c]) in ("list", "struct")
        ] + [
            f"{c}: oracle={ora_types[c]}" for c in sorted(ora_cols)
            if family(ora_types[c]) in ("list", "struct")]
        if nonscalar:
            failures.append((name,
                "non-scalar result column (driver's checker cannot hash "
                "lists/structs — flatten to scalar columns): "
                + "; ".join(nonscalar)))
            continue
        # type-family gate (the round-5 mix_sources class of bug): the
        # driver's hasher is type-sensitive, so value-identical results
        # in drifting type families must fail HERE, not at the driver
        drift = [
            f"{c}: spark={spark_types[c]}({family(spark_types[c])}) "
            f"oracle={ora_types[c]}({family(ora_types[c])})"
            for c in sorted(spark_cols)
            if family(spark_types[c]) != family(ora_types[c])]
        if drift:
            failures.append((name, "type drift: " + "; ".join(drift)))
            continue
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_ix = [ora_cols.index(c) for c in sorted(ora_cols)]
        s = sorted(tuple(norm(r[i]) for i in s_ix) for r in spark_rows)
        o = sorted(tuple(norm(r[i]) for i in o_ix) for r in ora_rows)
        if len(s) != len(o):
            failures.append((name, f"row count: spark={len(s)} oracle={len(o)}"))
            continue
        bad = [(a, b) for a, b in zip(s, o) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} mismatched rows, first: {bad[0]}"))
            continue
        print(f"OK   {name}: {len(s)} rows")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    # extra args = check only the named queries (local spot-check of a
    # new query without dumping the whole registry)
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
