"""ER task evaluation + duplicates (SURVEY.md §2.9).

 - ``evaluate_matching`` mirrors ``evaluate_entity_matching``
   (`/root/reference/src/kgpipe_eval/.../er_task_eval.py:354-440`): a
   predicted pair is TP iff both endpoints share a gold cluster.
 - ``duplicate_entities`` mirrors ``eval_duplicates``
   (`src/kgpipe_eval/metrics/duplicates.py:21-42`): >1 actual entity aligned
   to the same reference entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_matching(predicted: DataFrame, gold_clusters: DataFrame) -> DataFrame:
    """predicted(id_1,id_2,...) vs gold_clusters(cluster_id, entity_uri) →
    one row (tp, fp, fn, precision, recall, f1). Gold pairs are all
    unordered within-cluster pairs (cluster.py:134-175 pairwise semantics).
    """
    g = gold_clusters.select("cluster_id", F.col("entity_uri").alias("e"))
    gold_pairs = (
        g.alias("a")
        .join(g.alias("b"), "cluster_id")
        .filter(F.col("a.e") < F.col("b.e"))
        .select(F.col("a.e").alias("id_1"), F.col("b.e").alias("id_2"))
        .distinct()
    )
    pred_pairs = predicted.select(
        F.least("id_1", "id_2").alias("id_1"), F.greatest("id_1", "id_2").alias("id_2")
    ).distinct()

    # ONE job: full-outer + single agg instead of three count jobs
    row = (
        pred_pairs.withColumn("_p", F.lit(1))
        .join(gold_pairs.withColumn("_g", F.lit(1)), ["id_1", "id_2"], "full_outer")
        .agg(
            F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
        )
        .collect()[0]
    )
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return predicted.sparkSession.createDataFrame(
        [(tp, fp, fn, round(precision, 6), round(recall, 6), round(f1, 6))],
        "tp bigint, fp bigint, fn bigint, precision double, recall double, f1 double",
    )


def duplicate_entities(alignment: DataFrame) -> DataFrame:
    """alignment(actual_uri, reference_uri) → reference entities with >1
    aligned actual entity, with the count."""
    return (
        alignment.groupBy("reference_uri")
        .agg(F.countDistinct("actual_uri").alias("n_dupes"))
        .filter(F.col("n_dupes") > 1)
        .orderBy(F.desc("n_dupes"), F.asc("reference_uri"))
    )


def cluster_pairs(clusters: DataFrame, col: str = "uris") -> DataFrame:
    """n-member cluster rows → all unordered within-cluster pairs (id_1 < id_2).

    Mirrors the cluster-format branch of ``load_matches``
    (`/root/reference/src/kgpipe/evaluation/cluster.py:134-175`): a 2-col row
    is a pair, an n-col row yields all pairwise matches. Row-local explode —
    no shuffle beyond the final distinct."""
    a = clusters.select(F.col(col).alias("_us")).select(
        F.explode("_us").alias("id_1"), F.col("_us")
    )
    return (
        a.select("id_1", F.explode("_us").alias("id_2"))
        .filter(F.col("id_1") < F.col("id_2"))
        .distinct()
    )


def evaluate_relation_matching(
    predicted: DataFrame,
    gold_clusters: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Relation-match P/R/F1 (er_task_eval.py:126-166, 385-403): predicted
    'relation' matches above threshold count as TP when the two URIs share a
    local-name suffix OR co-occur in a gold cluster; '-'-suffixed ids are
    skipped.

    Deterministic deviations from the reference: exact-duplicate pairs are
    deduped relationally (the reference's order-dependent both-seen skip),
    and FN is the count of unmatched gold pairs (the reference hardcodes
    ``23 - matched`` as a TODO workaround, er_task_eval.py:165)."""
    suffix = lambda c: F.regexp_extract(c, r"([^/#]*)$", 1)
    rel = (
        predicted.filter(
            (F.col("id_type") == "relation")
            & (F.coalesce(F.col("score"), F.lit(0.0)) > threshold)
        )
        .filter(~F.col("id_1").endswith("-") & ~F.col("id_2").endswith("-"))
        .select(
            F.least("id_1", "id_2").alias("id_1"), F.greatest("id_1", "id_2").alias("id_2")
        )
        .distinct()
    )
    if gold_clusters is not None:
        gold = cluster_pairs(gold_clusters).withColumn("_g", F.lit(1))
    else:
        gold = rel.limit(0).withColumn("_g", F.lit(1))
    judged = rel.join(gold, ["id_1", "id_2"], "left").withColumn(
        "_ok", (suffix(F.col("id_1")) == suffix(F.col("id_2"))) | F.col("_g").isNotNull()
    )
    tp = judged.filter(F.col("_ok")).count()
    fp = judged.filter(~F.col("_ok")).count()
    fn = gold.join(rel, ["id_1", "id_2"], "left_anti").count()
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    return predicted.sparkSession.createDataFrame(
        [(tp, fp, fn, round(precision, 6), round(recall, 6), round(f1, 6))],
        "tp bigint, fp bigint, fn bigint, precision double, recall double, f1 double",
    )
