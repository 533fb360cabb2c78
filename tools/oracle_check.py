#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: row count, column names (sorted), and values (doubles rounded to
4 dp, timestamps normalized to naive us). Exits nonzero on any mismatch.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used to detect int-vs-float drift BEFORE the lossy
    int64 coercion in normalize(). The driver's hash gate distinguishes Spark
    int64 from a DuckDB HUGEINT (which pandas receives as float64), so an
    un-cast integer SUM in an oracle must fail here too, not be papered over."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def duck_dtype_class(type_name: str) -> str:
    """Oracle-side dtype class from the DuckDB result type, not the pandas
    frame: pandas decodes a NULL-containing BIGINT as float64, which would
    spuriously class oracle=float. HUGEINT deliberately stays 'float' — the
    driver's pandas-based gate receives it as float64, and flagging un-cast
    HUGEINT sums is this check's whole purpose."""
    t = type_name.upper()
    if t == "BOOLEAN":
        return "bool"
    if t == "HUGEINT" or t == "UHUGEINT":
        return "float"  # pandas receives float64 — the drift we must catch
    if "INT" in t and "INTERVAL" not in t:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if "TIMESTAMP" in t or t == "DATE":
        return "datetime"
    return "other"


def arrow_dtype_class(field_type) -> str:
    """Spark-side dtype class from the parquet (arrow) schema, NOT the pandas
    dtype: pandas decodes a nullable int64 column containing NULLs as float64,
    which would spuriously class spark=float vs oracle=int."""
    import pyarrow as pa
    if pa.types.is_boolean(field_type):
        return "bool"
    if pa.types.is_integer(field_type):
        return "int"
    if pa.types.is_floating(field_type):
        return "float"
    if pa.types.is_timestamp(field_type) or pa.types.is_date(field_type):
        return "datetime"
    return "other"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
            df[c] = s.map(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(4)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.reset_index(drop=True)


def parity_canary(con) -> list:
    """Fail LOUDLY if the oracle engine's arithmetic changed. The float
    queries' parity contract is bit-identical-before-rounding; an engine
    upgrade that drifts a decimal cast or a fold by ~1e-7 would otherwise
    surface only as a lottery over borderline 4dp roundings (the r8 x8c
    lesson). Constants pinned against duckdb 1.0.0 == Spark 4.1 semantics."""
    probes = [
        # exact decimal SUM at scale 8 (the ADC-fold contract)
        ("SELECT CAST(SUM(x) AS DOUBLE) FROM "
         "(SELECT CAST(3.0e-8 AS DECIMAL(30,8)) x FROM range(16))", 4.8e-7),
        # double->decimal rounding is HALF-UP (Spark's Decimal.changePrecision)
        ("SELECT CAST(CAST(CAST(2.5e-8 AS DOUBLE) AS DECIMAL(20,8)) AS DOUBLE)", 3e-8),
        ("SELECT CAST(CAST(CAST(3.5e-8 AS DOUBLE) AS DECIMAL(20,8)) AS DOUBLE)", 4e-8),
        # left-to-right double fold (the list_reduce cosine shape)
        ("SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
         "list_transform(range(1,11), i -> CAST(i AS DOUBLE)/7.0)), "
         "(a,b)->a+b)", 7.857142857142857),
    ]
    bad = []
    for sql, want in probes:
        got = con.sql(sql).fetchone()[0]
        if got != want:
            bad.append(f"canary {sql!r}: got {got!r}, want {want!r}")
    return bad


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    versions = {}
    vpath = os.path.join(outdir, "versions.json")
    if os.path.exists(vpath):
        versions = json.load(open(vpath))
    versions["duckdb"] = duckdb.__version__
    versions["pandas"] = pd.__version__
    print("engine versions: " +
          ", ".join(f"{k}={v}" for k, v in sorted(versions.items())))
    json.dump(versions, open(vpath, "w"))
    canary = parity_canary(con)
    if canary:
        for c in canary:
            print(f"  ✗ {c}")
        print("ORACLE ENGINE ARITHMETIC CHANGED — float parity contracts "
              "(bit-identical before rounding) need re-audit")
        return 1
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = []
    dirs = sorted(d for d in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, d)))
    # Expected set = every declared query (query_names.json, written by
    # Verify) ∪ whatever is on disk — a query that crashed in Verify writes
    # no directory and must FAIL here, not silently shrink the compared set.
    expected = set(dirs) | set(oracle)
    if os.path.exists(f"{outdir}/query_names.json"):
        expected |= set(json.load(open(f"{outdir}/query_names.json")))
    verify_failures = {}
    if os.path.exists(f"{outdir}/failures.json"):
        verify_failures = json.load(open(f"{outdir}/failures.json"))
    names = sorted(expected)
    for name in names:
        if name in verify_failures:
            failures.append((name, f"query FAILED in Verify: {verify_failures[name]}"))
            continue
        if name not in dirs:
            failures.append((name, "no spark output directory (query never ran?)"))
            continue
        parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not parts:
            failures.append((name, "no spark output parts"))
            continue
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if name not in oracle:
            print(f"  ~ {name}: rows-only check, rows={len(got)}")
            if len(got) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            rel = con.sql(oracle[name])
            oracle_class = {c: duck_dtype_class(str(t))
                            for c, t in zip(rel.columns, rel.types)}
            exp = rel.df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns differ: {list(g.columns)} vs {list(e.columns)}"))
            continue
        # int-vs-float dtype drift fails the driver's hash gate even when the
        # values are numerically identical — check raw dtypes before coercion.
        # Spark side from the parquet (arrow) schema: pandas would decode a
        # NULL-containing BIGINT as float64 and fail this check spuriously.
        # Verify coalesces to one part; if that ever changes, dtype drift in
        # later parts would escape a parts[0]-only read — fail loudly instead.
        if len(parts) != 1:
            failures.append((name, f"expected 1 output part, got {len(parts)} "
                                   "(schema drift check reads part 0 only)"))
            continue
        schema = pq.read_schema(parts[0])
        spark_class = {f.name: arrow_dtype_class(f.type) for f in schema}
        drift = []
        for c in g.columns:
            kg = spark_class.get(c, dtype_class(got[c]))
            ke = oracle_class.get(c, dtype_class(exp[c]))
            if {kg, ke} == {"int", "float"}:
                drift.append(f"{c}: spark={kg} oracle={ke}")
        if drift:
            failures.append((name, "dtype class mismatch (wrap oracle SUM in "
                             "CAST(... AS BIGINT)?): " + "; ".join(drift)))
            continue
        if len(g) != len(e):
            failures.append((name, f"row count {len(g)} vs {len(e)}"))
            continue
        diff_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = ((a.isna() & b.isna()) | (a == b))
            else:
                eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
            if not bool(eq.all()):
                bad = (~eq).idxmax()
                diff_cols.append(f"{c}[row {bad}]: {a.iloc[bad]!r} != {b.iloc[bad]!r}")
        if diff_cols:
            failures.append((name, "; ".join(diff_cols[:3])))
        else:
            print(f"  ✓ {name}: {len(g)} rows match")
    print()
    if failures:
        for n, msg in failures:
            print(f"  ✗ {n}: {msg}")
        return 1
    print(f"ALL {len(names)} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
