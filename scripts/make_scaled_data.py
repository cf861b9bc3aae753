#!/usr/bin/env python
"""Generate an sf1.0-equivalent dataset by tiling sf0.1 `copies`
times with per-copy key offsets, preserving join structure (each
copy's orders reference that copy's customers, lineitems reference
that copy's orders/parts/suppliers, etc.). Dimensions (region,
nation) keep their real-world cardinality — dims don't scale with
fact data, which is exactly why they stay broadcast-able at 100 TB.

Usage: python scripts/make_scaled_data.py [copies] [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rialto_airflow_spark.session import get_spark, load_tables

# table -> columns that carry entity keys needing a per-copy offset
# (offset = copy_idx * (max_key + 1) of the key's OWNING table, so
# foreign keys keep pointing at the same copy's rows)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
UNSCALED = ["region", "nation"]

KEY_SOURCE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def tile(df: DataFrame, offsets: dict[str, int], copies: int) -> DataFrame:
    parts = []
    for i in range(copies):
        part = df
        for col, stride in offsets.items():
            part = part.withColumn(col, F.col(col) + F.lit(i * stride))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/rspark_scaled_x{copies}"
    spark = get_spark("make-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(
        spark, src, *sorted(set(UNSCALED) | set(KEYED))
    )

    strides: dict[str, int] = {}
    for name, (tbl, col) in KEY_SOURCE.items():
        strides[name] = int(tables[tbl].agg(F.max(col)).collect()[0][0]) + 1

    os.makedirs(out, exist_ok=True)
    for t in UNSCALED:
        tables[t].write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "copied")
    for t, keycols in KEYED.items():
        offsets = {col: strides[owner] for col, owner in keycols.items()}
        tiled = tile(tables[t], offsets, copies)
        # keep file counts proportional to data volume so scans
        # parallelize the way a real big table would
        tiled.repartition(max(copies, 4)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(t, f"x{copies} ->", tiled.count(), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
