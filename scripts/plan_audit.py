#!/usr/bin/env python
"""Physical-plan audit: asserts the scale-critical plan properties that the
100 TB design depends on, so a refactor that silently regresses them fails
loudly here (and in tests/test_plan_audit.py which runs the same checks).

Checked invariants:
  1. Filter + projection PUSHDOWN: a filtered 2-column read of a parquet
     table shows PushedFilters and a pruned ReadSchema at the scan.
  2. fuse_first_value crosses ONE exchange for the source KG: the fusable /
     rest branches reuse the same repartition(subject, predicate) shuffle
     (ReusedExchange), instead of re-shuffling the full KG per branch.
  3. No row-at-a-time Python in any hot path: BatchEvalPython must not
     appear anywhere; Python appears only as ArrowEvalPython / mapInPandas
     (vectorized) in the extraction/embedding operators.
  4. The MinHash signature/banding path is 100% JVM (zero Python eval
     nodes) and whole-stage codegen covers the signature aggregation.
  5. canonicalize_triples broadcasts the rewrite map (BroadcastHashJoin,
     not a shuffle join) when the map is alias-sized.

Usage: python scripts/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
Exit 0 = all invariants hold.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def run_audit(spark, sf_dir: str) -> list[tuple[str, bool, str]]:
    """Returns [(check_name, ok, detail)]. Temporarily disables AQE:
    pre-execution AQE plans neither mark codegen stages nor apply static
    exchange reuse (both happen at runtime), so the static structure checks
    need the classic planner."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _run_audit(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _run_audit(spark, sf_dir: str) -> list[tuple[str, bool, str]]:
    from kgpipe_spark.operators.dedup import minhash_lsh_pairs
    from kgpipe_spark.operators.fusion import canonicalize_triples, fuse_first_value
    from kgpipe_spark.schemas import RDFS_LABEL

    results: list[tuple[str, bool, str]] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        results.append((name, ok, detail))

    # 1. pushdown ------------------------------------------------------------
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    q = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    p = plan_of(q)
    check(
        "scan_filter_pushdown",
        "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]" in p,
        "parquet scan must carry the segment filter",
    )
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    check(
        "scan_column_pruning",
        bool(read_schema)
        and "c_acctbal" not in read_schema[0]
        and "c_custkey" in read_schema[0],
        "2-column projection must prune the scan schema",
    )

    # 2. one-exchange fuse ---------------------------------------------------
    # data-derived predicate column (a literal predicate constant-folds the
    # branch plans apart and defeats both subset-clustering satisfaction and
    # exchange reuse — which is also why the real operators never partition
    # on literal columns); materialize to parquet so the source subtree is a
    # plain scan, as in production
    import tempfile

    import __spark_entry__ as E

    tdir = tempfile.mkdtemp(prefix="plan_audit_")
    E._base_triples(spark, sf_dir).write.mode("overwrite").parquet(f"{tdir}/triples")
    triples = spark.read.parquet(f"{tdir}/triples")
    seed = triples.limit(10)
    fusable = spark.createDataFrame([(RDFS_LABEL,)], ["predicate"])
    fp = plan_of(fuse_first_value(seed, triples, fusable))
    n_repart = sum(
        1
        for ln in fp.splitlines()
        if "REPARTITION_BY_COL" in ln and "hashpartitioning(subject" in ln
    )
    n_reused = fp.count("ReusedExchange")
    # Catalyst pushes each branch's fusable semi/anti broadcast filter BELOW
    # the (s,p) repartition, so the fusable and rest branches shuffle
    # DISJOINT subsets — total shuffle volume = one full-KG pass, filtered
    # before the wire — and the broadcast fusable set itself is reused.
    check(
        "fuse_one_kg_pass_shuffle",
        1 <= n_repart <= 2 and n_reused >= 1,
        f"disjoint-subset (s,p) repartitions = one KG pass "
        f"(got {n_repart} repartition exchanges, {n_reused} reused broadcasts)",
    )
    check(
        "fuse_no_extra_wide_shuffle",
        not any(
            "ENSURE_REQUIREMENTS" in ln
            and "hashpartitioning(subject" in ln
            and "object_lex" in ln
            for ln in fp.splitlines()
        ),
        "the (s,p) repartition satisfies the 4-col dedupe-aggregate clustering "
        "(no planner-inserted full-width shuffle)",
    )

    # 3. no row-Python anywhere in the driver contract -----------------------
    audit_queries = [
        "kg_extract_triples",
        "kg_fuse_first_value",
        "kg_canonicalize_triples",
        "doc_minhash_lsh_pairs",
        "doc_quality_features",
        "emb_cosine_topk",
    ]
    qs = E.queries()
    bad = []
    for name in audit_queries:
        ps = plan_of(qs[name](spark, sf_dir), "extended")
        if "BatchEvalPython" in ps:
            bad.append(name)
    check(
        "no_row_python_udfs",
        not bad,
        f"row-at-a-time Python in: {bad}" if bad else "only Arrow-vectorized Python",
    )

    # 4. minhash path pure JVM + codegen -------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    mp = plan_of(minhash_lsh_pairs(docs), "extended")
    check(
        "minhash_pure_jvm",
        "EvalPython" not in mp and "PythonUDF" not in mp,
        "signature/banding/verify must stay JVM-side",
    )
    cg = plan_of(minhash_lsh_pairs(docs), "codegen")
    n_subtrees = int(cg.split("WholeStageCodegen subtrees")[0].rsplit("Found", 1)[-1])
    check(
        "minhash_codegen",
        n_subtrees >= 1,
        f"signature aggregation inside whole-stage codegen ({n_subtrees} subtrees)",
    )

    # 5. broadcast canonicalize map ------------------------------------------
    cmap = spark.createDataFrame([("e/1", "e/2")], ["entity", "canonical"])
    cp = plan_of(canonicalize_triples(triples, cmap))
    check(
        "canonicalize_broadcasts_map",
        "BroadcastHashJoin" in cp and "SortMergeJoin" not in cp,
        "alias-sized rewrite map must broadcast",
    )

    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from kgpipe_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    results = run_audit(spark, sf_dir)
    failed = 0
    for name, ok, detail in results:
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}")
        failed += 0 if ok else 1
    print(f"\n{failed} violations")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
