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
- documents.text gets a PER-COPY ALPHABET ROTATION (a bijective char
  map: every letter shifts by the copy index) — within-copy duplicate
  structure is preserved EXACTLY (bijections preserve shingle-set
  equality and Jaccard), while cross-copy shingle overlap drops to ~0,
  so near-dup operators see a K×-corpus with the same duplicate
  DENSITY as the base. (The r6 version appended a short per-copy
  suffix instead — measured insufficient: a 1-token tail change leaves
  minhash signatures equal, so every base doc became a K-way near-dup
  cluster and candidate pairs grew K²× by construction of the DATA;
  chaining the amplification to sf10 made dedup_minhash_lsh read 57×
  on the 1→10 decade purely from that artifact);
- embeddings.embedding gets PER-COPY RADEMACHER SIGN FLIPS (dim d
  negated when bit (copy mod 6) of d is set) — norms and within-copy
  geometry are preserved exactly, cross-copy cosines decorrelate, so
  SemDeDup/ANN see K× genuinely distinct vectors, not K-way ties
  (same reasoning; the r6 tiny-jitter variant left copies at
  cosine ≈ 1).

PERFORMANCE DATA ONLY: the amplified tables are for plan-shape/scaling
measurement, never for the oracle-parity gate (value distributions are
amplification artifacts). Output lands in .scratch/sf1 (gitignored).

Usage: python tools/gen_scaled_data.py [--copies 10] [--out DIR]
       [--src DIR] [--tables documents,embeddings]

The fourth decade (r6 verdict item 6) chains the amplification:
    python tools/gen_scaled_data.py --src .scratch/sf1 --copies 10 \
        --out .scratch/sf10 --tables documents,embeddings
amplifies the already-amplified sf1 by another 10× for JUST the tables
the decade-4 watch queries (text_tfidf_topterms, kmeans_update_step,
dedup_minhash_lsh) read — tools/scaling_curve.py includes the sf10
point automatically for queries whose tables exist there.
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
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list; default = all replicated tables + fixed dims",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-gen-scaled")
    os.makedirs(args.out, exist_ok=True)
    src = args.src
    replicated = (
        [t for t in args.tables.split(",") if t in REPLICATED]
        if args.tables
        else list(REPLICATED)
    )
    fixed = [] if args.tables else list(FIXED)

    # one pass to size each key family's offset constant
    offsets: dict[str, int] = {}
    tables = {t: load_table(spark, src, t) for t in replicated}
    for fam, cols in KEY_FAMILIES.items():
        hi = 0
        for tbl, col in cols:
            if tbl not in tables:
                continue
            v = tables[tbl].agg(F.max(col)).collect()[0][0]
            hi = max(hi, int(v))
        offsets[fam] = hi + 1

    col_offset: dict[tuple[str, str], int] = {
        (tbl, col): offsets[fam]
        for fam, cols in KEY_FAMILIES.items()
        for tbl, col in cols
    }

    for t in fixed:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: fixed dimension copied")

    import random
    import string

    out_key = os.path.basename(os.path.normpath(args.out))

    def _copy_permutation(i: int) -> str:
        """Keyed pseudo-random alphabet permutation for copy i — keyed
        by the OUTPUT dir too, so chained amplifications (sf0.1→sf1→
        sf10) compose to distinct bijections instead of colliding
        shift classes."""
        letters = list(string.ascii_lowercase)
        random.Random(f"{out_key}:doc:{i}").shuffle(letters)
        lo = "".join(letters)
        return lo + lo.upper()

    def _copy_signs(i: int) -> list[float]:
        rng = random.Random(f"{out_key}:emb:{i}")
        return [1.0 if rng.random() < 0.5 else -1.0 for _ in range(64)]

    for t in replicated:
        base = tables[t]
        copies = []
        for i in range(args.copies):
            df = base
            for (tbl, col), off in col_offset.items():
                if tbl == t:
                    df = df.withColumn(col, F.col(col) + F.lit(i * off))
            if t == "documents" and i > 0:
                src_alpha = string.ascii_lowercase + string.ascii_uppercase
                df = df.withColumn(
                    "text",
                    F.translate("text", src_alpha, _copy_permutation(i)),
                )
            if t == "embeddings" and i > 0:
                signs = F.array(
                    *[F.lit(s) for s in _copy_signs(i)]
                )
                df = df.withColumn(
                    "embedding",
                    F.zip_with(
                        "embedding",
                        signs,
                        lambda x, s: (x * s).cast("float"),
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
