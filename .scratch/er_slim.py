"""Isolated A/B for entity_resolution_pipeline variants (r14, VERDICT #3).

Variants:
  cur    — registered shape: bucketed applyInPandas union-find
  arrow  — same shape, applyInArrow + only (bucket, pk_a, pk_b, edit_dist)
           crossing the Python boundary
  jvm    — no Python node: min-label propagation fixpoint over the pair
           graph (JVM-only), relational per-component aggregates

Each: clearCache, build, warm-up noop, min-of-N timed noop runs.
Also verifies all variants return identical rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "5"))

from pyspark.sql import functions as F


def build_cur(spark):
    from go_zoom_kinesis_spark.operators.search import entity_resolution_pipeline

    return entity_resolution_pipeline(spark, SF_DIR)


def build_arrow(spark):
    import pyarrow as pa

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.search import (
        ER_UF_BUCKETS,
        _keyed_fuzzy_pairs,
    )

    pairs = _keyed_fuzzy_pairs(spark, SF_DIR).select(
        F.pmod(F.hash("block_noun", "block_size"), F.lit(ER_UF_BUCKETS)).alias(
            "bucket"
        ),
        "pk_a",
        "pk_b",
        "edit_dist",
    )
    bucketed = pairs.repartition(
        spark.sparkContext.defaultParallelism, "bucket"
    )

    def _resolve(table: pa.Table) -> pa.Table:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        av = table.column("pk_a").to_pylist()
        bv = table.column("pk_b").to_pylist()
        dv = table.column("edit_dist").to_pylist()
        for x, y in zip(av, bv):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        members: dict[int, int] = {}
        for x in parent:
            r = find(x)
            members[r] = members.get(r, 0) + 1
        stats: dict[int, list[int]] = {}
        for x, d in zip(av, dv):
            r = find(x)
            s = stats.setdefault(r, [0, 0])
            s[0] += 1
            s[1] = max(s[1], d)
        roots = sorted(stats)
        return pa.table(
            {
                "entity_id": pa.array(roots, pa.int64()),
                "n_members": pa.array([members[r] for r in roots], pa.int64()),
                "n_matched_pairs": pa.array(
                    [stats[r][0] for r in roots], pa.int64()
                ),
                "max_intra_edit_dist": pa.array(
                    [stats[r][1] for r in roots], pa.int32()
                ),
            }
        )

    ents = bucketed.groupBy("bucket").applyInArrow(
        _resolve,
        schema=(
            "entity_id long, n_members long, "
            "n_matched_pairs long, max_intra_edit_dist int"
        ),
    )
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return ents.hint("shuffle_hash").join(part, "entity_id").select(
        "entity_id",
        "canonical_name",
        "n_members",
        "n_matched_pairs",
        "max_intra_edit_dist",
    )


def build_jvm(spark):
    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.search import (
        _keyed_fuzzy_pairs,
        _min_label_propagate,
    )
    from go_zoom_kinesis_spark.persist import pin

    pairs = pin(
        _keyed_fuzzy_pairs(spark, SF_DIR).select("pk_a", "pk_b", "edit_dist")
    )
    edges = pairs.select(
        F.col("pk_a").alias("src"), F.col("pk_b").alias("dst")
    ).union(pairs.select(F.col("pk_b").alias("src"), F.col("pk_a").alias("dst")))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = _min_label_propagate(
        edges, nodes.withColumn("lbl", F.col("node"))
    )
    members = labels.groupBy("lbl").agg(F.count("*").alias("n_members"))
    pstats = (
        pairs.join(labels, pairs.pk_a == labels.node)
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_matched_pairs"),
            F.max("edit_dist").alias("max_intra_edit_dist"),
        )
    )
    ents = members.join(pstats, "lbl").select(
        F.col("lbl").alias("entity_id"),
        "n_members",
        "n_matched_pairs",
        "max_intra_edit_dist",
    )
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return ents.hint("shuffle_hash").join(part, "entity_id").select(
        "entity_id",
        "canonical_name",
        "n_members",
        "n_matched_pairs",
        "max_intra_edit_dist",
    )


def build_slim(spark):
    import pandas as pd

    from go_zoom_kinesis_spark.io import load_table
    from go_zoom_kinesis_spark.operators.search import (
        ER_UF_BUCKETS,
        _keyed_fuzzy_pairs,
    )

    pairs = _keyed_fuzzy_pairs(spark, SF_DIR).select(
        F.pmod(F.hash("block_noun", "block_size"), F.lit(ER_UF_BUCKETS)).alias(
            "bucket"
        ),
        "pk_a",
        "pk_b",
        "edit_dist",
    )
    bucketed = pairs.repartition(
        spark.sparkContext.defaultParallelism, "bucket"
    )

    def _resolve(pdf):
        import pandas as pd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        av = pdf["pk_a"].to_numpy()
        bv = pdf["pk_b"].to_numpy()
        dv = pdf["edit_dist"].to_numpy()
        for x, y in zip(av.tolist(), bv.tolist()):
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        members: dict[int, int] = {}
        for x in parent:
            r = find(x)
            members[r] = members.get(r, 0) + 1
        stats: dict[int, list[int]] = {}
        for x, d in zip(av.tolist(), dv.tolist()):
            r = find(x)
            s = stats.setdefault(r, [0, 0])
            s[0] += 1
            s[1] = max(s[1], d)
        rows = [(r, members[r], s[0], s[1]) for r, s in stats.items()]
        out = pd.DataFrame(
            rows,
            columns=[
                "entity_id",
                "n_members",
                "n_matched_pairs",
                "max_intra_edit_dist",
            ],
        )
        return out.astype(
            {
                "entity_id": "int64",
                "n_members": "int64",
                "n_matched_pairs": "int64",
                "max_intra_edit_dist": "int32",
            }
        )

    ents = bucketed.groupBy("bucket").applyInPandas(
        _resolve,
        schema=(
            "entity_id long, n_members long, "
            "n_matched_pairs long, max_intra_edit_dist int"
        ),
    )
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return ents.hint("shuffle_hash").join(part, "entity_id").select(
        "entity_id",
        "canonical_name",
        "n_members",
        "n_matched_pairs",
        "max_intra_edit_dist",
    )


def main() -> None:
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-er-ab")
    spark.range(1).count()
    builders = {"cur": build_cur, "arrow": build_arrow, "jvm": build_jvm, "slim": build_slim}
    which = sys.argv[1:] or list(builders)
    outs = {}
    for name in which:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = builders[name](spark)
        build = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"er_ab:{name}:warm")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        runs = []
        for i in range(N):
            spark.sparkContext.setJobDescription(f"er_ab:{name}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: build={build:.3f} warm={warm:.3f} "
            f"min={min(runs):.3f} runs={runs}",
            flush=True,
        )
        outs[name] = df
    if len(outs) > 1:
        base_name = next(iter(outs))
        base = {tuple(r) for r in outs[base_name].collect()}
        for name, df in outs.items():
            if name == base_name:
                continue
            rows = {tuple(r) for r in df.collect()}
            print(
                f"rows {base_name} vs {name}: "
                f"{'IDENTICAL' if rows == base else 'DIFF'} "
                f"({len(base)} vs {len(rows)})"
            )


if __name__ == "__main__":
    main()
