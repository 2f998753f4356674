"""Deterministic 10× amplification of sf0.1 → a local "sf1" for
scaling-curve measurement (tools/scaling_curve.py --extra).

The driver ships testdata at sf{0.001,0.01,0.1}; those three points
give the 0.01→0.1 growth decade the SCALE.md table rests on. This tool
adds one more decade so "sub-linear" claims rest on THREE decades, by
replicating sf0.1 K times with disjoint key spaces — the same move
TPC-H's own scale factors make (fact tables grow, nation/region stay
fixed):

- every key-family column is offset per copy by (max_key + 1) of the
  family, applied consistently across tables (orders.o_custkey and
  customer.c_custkey shift together), so join fan-outs per key match
  the base data and copies never cross-join;
- nation/region are NOT replicated (fixed dimensions, as in TPC-H);
  nationkey references stay in the fixed 0..24 domain;
- documents.content is salted with a short per-copy suffix so
  near-dup/shingle operators see a K×-corpus with the same duplicate
  DENSITY as the base, instead of K exact copies of everything (which
  would grow candidate pairs K²× by construction of the data, not the
  plan);
- embeddings.emb gets a tiny per-copy deterministic jitter for the
  same reason (SemDeDup/ANN see new near-neighbors, not K-way exact
  ties).

PERFORMANCE DATA ONLY: the amplified tables are for plan-shape/scaling
measurement, never for the oracle-parity gate (value distributions are
amplification artifacts). Output lands in .scratch/sf1 (gitignored).

Usage: python tools/gen_scaled_data.py [--copies 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# key families: (table, column) pairs sharing one offset constant
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
REPLICATED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
FIXED = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-gen-scaled")
    os.makedirs(args.out, exist_ok=True)

    # one pass to size each key family's offset constant
    offsets: dict[str, int] = {}
    tables = {t: load_table(spark, SRC, t) for t in REPLICATED}
    for fam, cols in KEY_FAMILIES.items():
        hi = 0
        for tbl, col in cols:
            v = tables[tbl].agg(F.max(col)).collect()[0][0]
            hi = max(hi, int(v))
        offsets[fam] = hi + 1

    col_offset: dict[tuple[str, str], int] = {
        (tbl, col): offsets[fam]
        for fam, cols in KEY_FAMILIES.items()
        for tbl, col in cols
    }

    for t in FIXED:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: fixed dimension copied")

    for t in REPLICATED:
        base = tables[t]
        copies = []
        for i in range(args.copies):
            df = base
            for (tbl, col), off in col_offset.items():
                if tbl == t:
                    df = df.withColumn(col, F.col(col) + F.lit(i * off))
            if t == "documents" and i > 0:
                salt = f" c{i}x"
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(salt))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(salt)))
            if t == "embeddings" and i > 0:
                jit = 1e-4 * i
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", lambda x: (x + F.lit(jit)).cast("float")
                    ),
                )
            copies.append(df)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        path = os.path.join(args.out, f"{t}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"{t}: {args.copies}x -> {path}")

    print("done:", args.out)


if __name__ == "__main__":
    main()
