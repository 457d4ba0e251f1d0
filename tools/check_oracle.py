"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # full-precision repr: IEEE-equal values canonicalize identically
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        "\x1f".join(canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def to_pandas_canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        # normalize integer-ish columns (duckdb int128/uint) to python ints
        if str(out[c].dtype).startswith(("int", "uint", "Int")):
            out[c] = out[c].map(lambda x: None if pd.isna(x) else int(x))
        elif str(out[c].dtype) == "object":
            out[c] = out[c].map(
                lambda x: int(x) if isinstance(x, int) and not isinstance(x, bool) else x
            )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from nlp_entity_linking_spark.conf import get_spark

    spark = get_spark(app_name="check_oracle", master="local[16]")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spdf = to_pandas_canon(sdf.toPandas())
        if name not in oracles:
            print(f"{name:28s} rows={len(spdf):>8} (rows-only check, no oracle)")
            if len(spdf) == 0:
                failures.append((name, "0 rows on rows-only query"))
            continue
        ddf = to_pandas_canon(con.execute(oracles[name]).df())
        problems = []
        if len(spdf) != len(ddf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(ddf)}")
        if sorted(map(str.lower, spdf.columns)) != sorted(map(str.lower, ddf.columns)):
            problems.append(f"cols spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}")
        hs, hd = value_hash(spdf), value_hash(ddf)
        if hs != hd:
            problems.append(f"value-hash mismatch {hs[:10]} vs {hd[:10]}")
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:28s} rows={len(spdf):>8} {status}")
        if problems:
            failures.append((name, problems))
            # dump small diff aid
            if len(spdf) == len(ddf) and len(spdf) <= 20:
                print("  spark:", spdf.sort_values(sorted(spdf.columns)[0]).to_dict("records")[:5])
                print("  duck :", ddf.sort_values(sorted(ddf.columns)[0]).to_dict("records")[:5])
    spark.stop()
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
