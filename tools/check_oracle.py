#!/usr/bin/env python3
"""Local self-check approximating the driver's DuckDB-oracle compare:
for each query dir under OUT, run the oracle SQL on the same sf parquet
tables, sort columns by name and rows by all values, compare cell-wise.

STRICT by default (round-6 hardening; VERDICT r5 "What's wrong" #2):
the r5 driver gate failed 9 queries the loose local gate passed, because
pandas conversion hides DuckDB HUGEINT widening (-> float64/object) and
TIMESTAMP_NS nanos (-> datetime64[ns] on BOTH sides). Strict mode:
  1. TYPE AUDIT: any HUGEINT / UHUGEINT / TIMESTAMP_NS / TIMESTAMP WITH
     TIME ZONE column in the ORACLE result is an error by itself —
     those types cannot round-trip the driver comparator losslessly.
     Cast to BIGINT / epoch_us in the oracle SQL instead.
  2. EXACT cell compare — no float tolerance (the driver hashes values;
     an ulp off is a hash mismatch). Null-likes (None/NaN/NaT) still
     compare equal to each other.
Pass --loose for the old rel_tol=1e-9 behavior (debugging only; a loose
pass is NOT evidence the driver gate will pass).

Usage: check_oracle.py SF_DIR OUT_DIR [name] [--loose]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ANY timestamp flavor is driver-unsafe: the events parquet is
# TIMESTAMP(NANOS), which the driver's DuckDB keeps at nano precision
# while Spark truncates to micros — a raw timestamp output can never
# hash-match (r5: scd2_history). No current oracle emits one (checked
# r6); emit epoch_us longs instead. DATE stays allowed (day precision
# agrees everywhere).
BAD_TYPES = ("HUGEINT", "UHUGEINT", "TIMESTAMP", "TIMESTAMP_NS",
             "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_S", "TIMESTAMP_MS")

def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)

def is_null_like(x):
    # None, float NaN, pandas NaT — anything self-unequal or None
    if x is None:
        return True
    try:
        return x != x
    except Exception:
        return False

def cells_equal(a, b, strict):
    if is_null_like(a) and is_null_like(b):
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            if strict:
                return fa == fb
            return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        # pandas NaN vs None
        fa = a if a is not None else float("nan")
        fb = b if b is not None else float("nan")
        try:
            return math.isnan(float(fa)) and math.isnan(float(fb))
        except (TypeError, ValueError):
            return False
    return a == b

def main():
    args = [a for a in sys.argv[1:] if a != "--loose"]
    strict = "--loose" not in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = args[2] if len(args) > 2 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"read_parquet('{p}')"
        else:
            continue
        sel = "*"
        if t == "events":
            # driver files carry TIMESTAMP(NANOS) (DuckDB reads TIMESTAMP);
            # Spark-derived corpora (ScaleUp) store the same nanos as plain
            # INT64 (Spark cannot write nanos timestamps). Normalize the
            # INT64 form exactly like the Spark reader: nanos div 1000 -> us.
            # guard: empty events parquet -> fetchone() is None; fall
            # back to the schema-level type (works on zero rows too)
            row = con.sql(f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()
            if row is None:
                row = con.sql(
                    f"SELECT column_type FROM (DESCRIBE SELECT ts FROM {src})").fetchone()
            if row is not None and row[0] == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name != only:
            continue
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            rel = con.sql(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if strict:
            # Type audit BEFORE any pandas conversion can mask the type.
            hazards = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                       if str(t).upper() in BAD_TYPES]
            if hazards:
                cols = ", ".join(f"{c}:{t}" for c, t in hazards)
                print(f"FAIL {name}: driver-unsafe oracle type(s) [{cols}] — "
                      f"CAST(... AS BIGINT) / epoch_us(...) in the oracle SQL")
                n_bad += 1
                continue
        try:
            exp = norm(rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got = norm(con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df())
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        bad = None
        ev, gv = exp.values, got.values
        for i in range(len(exp)):
            for j in range(len(exp.columns)):
                a, b = ev[i][j], gv[i][j]
                if not cells_equal(a, b, strict):
                    bad = (i, exp.columns[j], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows x {len(exp.columns)} cols)")
            n_ok += 1
    mode = "strict" if strict else "LOOSE"
    print(f"== {n_ok} ok, {n_bad} bad ({mode}) ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
