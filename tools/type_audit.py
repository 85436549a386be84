#!/usr/bin/env python
"""Compare Spark result dtypes vs DuckDB oracle result types per query.

The driver's value-hash is type-sensitive (Spark decimal(28,2) vs DuckDB
DECIMAL(38,2) hash-mismatches even when values are identical), so every
query must pin identical output types on both sides. This audit runs each
registered query's plan (schema only — no execution) and its oracle in
DuckDB (LIMIT 0) and prints per-column type pairs that don't agree.

Usage: python tools/type_audit.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type name -> Spark simpleString equivalent
DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
    "HUGEINT": "decimal(38,0)",  # no Spark equivalent — always a mismatch to fix
    "UBIGINT": "decimal(20,0)",
}


def duck_type_to_spark(t: str) -> str:
    t = t.strip().upper()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    return DUCK_TO_SPARK.get(t, t.lower())


# Round-1 empirical calibration of the driver's value-hash: queries whose
# only type drift was integer WIDTH (spark int vs duck bigint —
# token_stats, quality_score, topn_per_group, xref_dispatch,
# multimodal_meta) all hash-matched, while decimal-width drift
# (pricing_summary et al.) and HUGEINT-vs-bigint (audit_aggregates)
# hash-failed. So int-family width diffs are reported but non-fatal.
_INT_FAMILY = {"tinyint", "smallint", "int", "bigint"}


def equivalent(spark_t: str, duck_t: str) -> bool:
    return spark_t == duck_t or (
        spark_t in _INT_FAMILY and duck_t in _INT_FAMILY
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entry_mod
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions="4")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or [n for n in qs if n in oracles]
    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            stypes = dict(sdf.dtypes)
        except Exception as e:
            print(f"ERR   {name}: spark: {e}")
            bad.append(name)
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
            dtypes = {c: duck_type_to_spark(str(t)) for c, t in zip(rel.columns, rel.types)}
        except Exception as e:
            print(f"ERR   {name}: duckdb: {e}")
            bad.append(name)
            continue
        diffs = []
        notes = []
        for c in stypes:
            if c in dtypes and stypes[c] != dtypes[c]:
                msg = f"{c}: spark={stypes[c]} duck={dtypes[c]}"
                if equivalent(stypes[c], dtypes[c]):
                    notes.append(msg)
                else:
                    diffs.append(msg)
        only_s = set(stypes) - set(dtypes)
        only_d = set(dtypes) - set(stypes)
        if only_s or only_d:
            diffs.append(f"cols spark-only={sorted(only_s)} duck-only={sorted(only_d)}")
        if diffs:
            print(f"DIFF  {name}: " + "; ".join(diffs))
            bad.append(name)
        elif notes:
            print(f"ok    {name} (int-width only: " + "; ".join(notes) + ")")
        else:
            print(f"ok    {name}")
    print(f"\n{len(names) - len(bad)}/{len(names)} type-aligned")
    if bad:
        print("mismatched:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
