#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with the sf tables registered
as views. Compares schema (column names), row count, and value hash with
columns sorted by name and rows sorted by all columns (stringified,
floats rounded to 9 significant digits).
"""
import json, sys, hashlib, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Types that hash identically across Spark-parquet and DuckDB in the
# driver's normalizer. Anything else (HUGEINT from an uncast integer
# sum(), INTEGER, DECIMAL, ...) stringifies the same under Python here
# but NOT under the driver — so local green would lie. Round 1 lost
# q_profile/q_funnel/q_dedup_canonical to exactly this.
PORTABLE = re.compile(
    r"^(BIGINT|DOUBLE|VARCHAR|DATE|BOOLEAN|TIMESTAMP(_NS)?( WITH TIME ZONE)?)$")


def type_violations(label, cols, types):
    return [f"{label}.{c}: {t}" for c, t in zip(cols, map(str, types))
            if not PORTABLE.match(str(t))]


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c.lower() for c in spark_rel.columns]
            s_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols = [c.lower() for c in duck_rel.columns]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            failures += 1
            continue
        bad_types = (type_violations("spark", s_cols, spark_rel.types)
                     + type_violations("duck", d_cols, duck_rel.types))
        if bad_types:
            print(f"FAIL {name}: non-portable result types "
                  f"(driver hash WILL diverge): {', '.join(bad_types)}")
            failures += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
            continue
        hs, hd = norm_rows(s_rows, s_cols), norm_rows(d_rows, d_cols)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            # first rows whose multiplicity differs (Counter, not set:
            # duplicate-row count mismatches must also surface)
            from collections import Counter
            def norm_counter(rows, cols):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                return Counter(
                    tuple(f"{r[i]:.9g}" if isinstance(r[i], float)
                          else str(r[i]) for i in order)
                    for r in rows)
            s_ctr, d_ctr = norm_counter(s_rows, s_cols), norm_counter(d_rows, d_cols)
            for label, diff in (("spark-only", s_ctr - d_ctr),
                                ("duck-only", d_ctr - s_ctr)):
                for row in sorted(diff)[:3]:
                    print(f"       {label} (x{diff[row]}): {row}")
            failures += 1
            continue
        print(f"ok   {name} ({len(s_rows)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
