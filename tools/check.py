#!/usr/bin/env python3
"""Local mirror of the driver's t2 DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the paired
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sfDir
tables, sorts columns by name, and compares values exactly. Dev-only
tool (duckdb/pandas are driver-side deps, not library deps).
"""
import sys, json, math, glob
import datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            # arrow date32 -> datetime.date objects (fetchdf coerced these;
            # to_pandas does not) — same "datetime" class as timestamps
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
               and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # unify int widths / nullable ints
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif df[c].dtype == object:
            # array columns -> tuples so equality is scalar
            df[c] = df[c].apply(
                lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v)
                if isinstance(v, (list, np.ndarray)) else v)
    return df


def type_check(name, spark_files, duck_tbl):
    """Strict arrow-level schema comparison, mirroring the driver's
    dtype-sensitive hash: DECIMAL vs DOUBLE, HUGEINT vs BIGINT, int-width
    differences, and any list/struct column (driver's row-sort chokes on
    unhashable cells) are all failures even when values compare equal."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    def clazz(t):
        # equivalence classes the driver's normalization collapses
        # (observed round 1: int widths and ts units/dates hash alike;
        # decimal vs double/int, int vs double, nested types do NOT)
        if pt.is_integer(t): return "int"
        if pt.is_floating(t): return "float"
        if pt.is_decimal(t): return "DECIMAL"
        if pt.is_temporal(t): return "datetime"
        if pt.is_boolean(t): return "bool"
        if pt.is_string(t) or pt.is_large_string(t): return "str"
        if pt.is_nested(t): return f"NESTED({t})"
        return str(t)

    schemas = [pq.read_schema(f) for f in spark_files]
    if any(not s.equals(schemas[0]) for s in schemas[1:]):
        # stale mixed outputs would otherwise validate file[0]'s schema
        # against values concatenated from every file
        return [f"part files disagree on schema ({len(spark_files)} files)"]
    ss = {f.name: f.type for f in schemas[0]}
    ds = {f.name: f.type for f in duck_tbl.schema}
    problems = []
    for c in sorted(set(ss) | set(ds)):
        st, dt = ss.get(c), ds.get(c)
        if st is not None and pt.is_nested(st):
            problems.append(f"col {c}: spark type {st} is driver-unsortable")
            continue
        if st is None or dt is None:
            continue  # column-set diff reported by compare()
        if clazz(st) != clazz(dt):
            problems.append(f"col {c}: spark {st} vs duck {dt}")
    return problems


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} duck={len(b)}"
    problems = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64"); bv = bv.astype("float64")
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {av[i]!r} vs {bv[i]!r} (absdiff {abs(av[i]-bv[i]) if not (math.isnan(av[i]) or math.isnan(bv[i])) else 'nan'})")
        else:
            av = av.astype(object).where(~pd.isna(av), None)
            bv = bv.astype(object).where(~pd.isna(bv), None)
            neq = av.combine(bv, lambda x, y: x != y)
            if neq.any():
                i = neq.idxmax()
                problems.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {av[i]!r} vs {bv[i]!r}")
    return "PASS" if not problems else "FAIL " + "; ".join(problems[:3])


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    produced = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")}
    for name in sorted(produced):
        # sorted: glob order is filesystem order; multi-part outputs would
        # otherwise concatenate out of the query's ORDER BY order
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            results[name] = "FAIL no spark output"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            # single execution: schema and values both come from one
            # arrow materialization (the dedup/kmeans oracles are heavy)
            duck_tbl = con.sql(oracle[name]).arrow()
            tprobs = type_check(name, files, duck_tbl)
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            results[name] = f"FAIL oracle error: {e}"
            continue
        r = compare(name, spark_df, duck_df)
        if tprobs:
            r = ("FAIL " if r == "PASS" else r + "; ") + "TYPES: " + "; ".join(tprobs[:4])
        results[name] = r
    npass = sum(1 for v in results.values() if v == "PASS")
    for k, v in sorted(results.items()):
        print(f"{k:35s} {v}")
    print(f"== {npass}/{len(results)} listed, {npass} PASS, "
          f"{sum(1 for v in results.values() if v.startswith('FAIL'))} FAIL, "
          f"{sum(1 for v in results.values() if v.startswith('NO-ORACLE'))} no-oracle")


if __name__ == "__main__":
    main()
