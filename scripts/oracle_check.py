#!/usr/bin/env python3
"""Dev-only parity check mirroring the driver's t2 gate: reads Verify's
parquet dumps + oracle_sql.json, runs each oracle in DuckDB over the same
testdata parquet, and compares values column-name-sorted (like the driver).
Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                n_bad += 1
                continue
            # the driver's hash is dtype-sensitive: DuckDB HUGEINT / wide
            # DECIMAL vs Spark BIGINT / narrower DECIMAL hash differently even
            # when values are equal — so compare dtypes strictly here too
            ed, gd = [str(t) for t in exp.dtypes], [str(t) for t in got.dtypes]
            if ed != gd:
                print(f"FAIL {name}: dtypes {gd} != {ed}")
                n_bad += 1
                continue
            er = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
            gr = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
            if er == gr:
                print(f"ok   {name} ({len(er)} rows)")
                n_ok += 1
            else:
                # also try order-insensitive compare to localize the issue
                if sorted(map(repr, er)) == sorted(map(repr, gr)):
                    print(f"FAIL {name}: same rows, different ORDER")
                else:
                    diff = [(a, b) for a, b in zip(er, gr) if a != b][:3]
                    print(f"FAIL {name}: {len(er)} vs {len(gr)} rows; first diffs: {diff}")
                n_bad += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
