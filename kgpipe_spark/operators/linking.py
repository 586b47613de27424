"""Entity / relation linking: mention → KG URI (SURVEY.md §2.4).

The reference's native linkers all share one pattern (`SimpleEntityLinker`,
`/root/reference/src/kgpipe_tasks/construction/extract_json.py:52-129`):
build a label dictionary from the KG → embed → cosine top-k → threshold
accept (0.70). Our decomposition keeps the corpus-wide parts relational:

 1. ``label_dictionary``   — KG triples → (uri, normalized label) dim table
 2. ``link_exact``         — broadcast equi-join on the normalized label
                             (the fast path that resolves the vast majority
                             of mentions at corpus scale)
 3. ``link_embedding_topk``— residuals → Arrow-batched pandas UDF computing
                             ``queries @ label_matrix.T`` against a
                             *broadcast* dictionary matrix; top-1 ≥ threshold
                             (mirrors extract_json.py:93-96 argmax ≥ 0.70)
 4. ``link_minhash_lsh``   — long-tail fuzzy candidates via MLlib MinHashLSH
                             over char-3-gram sets (BASELINE.json north star)

Embeddings are feature-flagged deterministic hashed char-ngram vectors
(`hash_embed``) so tests are reproducible without ML deps — mirroring the
reference's optional ``[ml]`` extra (`pyproject.toml:23-25`). A real
sentence-transformer can be slotted in by swapping ``embed_fn``.

Per-key memoization in the reference (extract_json.py:145-168) maps to
``distinct()`` before the expensive UDF + join back after (relational CSE).

The reference's *dynamic* index (newly minted entities appended mid-run,
extract_json.py:84-89,498-510) is order-dependent mutable state; we ship the
two-pass variant (SURVEY.md §4.2.5): ``link_two_pass`` links against the
seed dictionary, then re-links residuals against pass-1 minted entities.
The reference itself ships ``dynamic_index=False`` variants
(extract_json.py:583,624) — those are the semantics we match.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from kgpipe_spark.functions.hashing import mint_uri_sha256
from kgpipe_spark.functions.strings import normalize_label
from kgpipe_spark.schemas import RDFS_LABEL, SKOS_ALT_LABEL

DEFAULT_ACCEPT = 0.70  # extract_json.py:23 ENTITY_ACCEPT
EMBED_DIM = 64


# ---------------------------------------------------------------------------
# dictionary
# ---------------------------------------------------------------------------


def label_dictionary(kg: DataFrame, include_alt: bool = True) -> DataFrame:
    """(uri, label, norm_label) from rdfs:label (+ skos:altLabel).

    Mirrors ``load_kg_labels`` (extract_json.py:52-66).
    """
    preds = [RDFS_LABEL] + ([SKOS_ALT_LABEL] if include_alt else [])
    return (
        kg.filter(F.col("predicate").isin(preds))
        .select(
            F.col("subject").alias("uri"),
            F.col("object_lex").alias("label"),
            normalize_label(F.col("object_lex")).alias("norm_label"),
        )
        .dropDuplicates(["uri", "norm_label"])
    )


# ---------------------------------------------------------------------------
# exact path
# ---------------------------------------------------------------------------


def link_exact(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Broadcast equi-join on normalized label; score 1.0 on hit.

    Result: mentions + (mapping URI or null, score). One candidate per
    normalized label is kept deterministically (min uri) so a mention never
    fans out — matches the reference's argmax-single-link semantics.
    """
    dict_best = dictionary.groupBy("norm_label").agg(F.min("uri").alias("mapping"))
    m = mentions.withColumn("norm_query", normalize_label(F.col("query_text")))
    joined = m.join(F.broadcast(dict_best), m.norm_query == dict_best.norm_label, "left")
    return joined.select(
        *mentions.columns,
        F.col("mapping"),
        F.when(F.col("mapping").isNotNull(), F.lit(1.0)).otherwise(F.lit(None).cast("double")).alias("score"),
    )


# ---------------------------------------------------------------------------
# deterministic hashed embeddings (test-mode embedder)
# ---------------------------------------------------------------------------


def _hash_embed_numpy(texts: "pd.Series", dim: int = EMBED_DIM) -> np.ndarray:
    """Char-3-gram hashed embedding, L2-normalized. Deterministic, no deps.
    (Kept as the module-level fast path; the pluggable provider seam lives
    in ``functions.embedders`` — this is ``HashedGramEmbedder.encode``.)"""
    from kgpipe_spark.functions.embedders import HashedGramEmbedder

    return HashedGramEmbedder(dim).encode(texts)


@F.pandas_udf(ArrayType(FloatType()))  # type: ignore[call-overload]
def hash_embed(texts: pd.Series) -> pd.Series:
    mat = _hash_embed_numpy(texts)
    return pd.Series(list(mat))


# ---------------------------------------------------------------------------
# embedding top-1 against a broadcast dictionary
# ---------------------------------------------------------------------------


def link_embedding_topk(
    mentions: DataFrame,
    dictionary: DataFrame,
    spark: SparkSession,
    accept: float = DEFAULT_ACCEPT,
    max_broadcast: int = 2_000_000,
    embedder=None,
) -> DataFrame:
    """Residual mentions → top-1 cosine against broadcast label matrix.

    The dictionary (uri, label) is collected to the driver, embedded once,
    and broadcast — mirroring the reference's in-memory ``LabelIndex``
    (extract_json.py:73-96) but batched via Arrow. The distinct() before the
    UDF is the relational version of the reference's per-key memo cache.

    ``embedder`` is any ``functions.embedders.Embedder`` (default: the
    process-wide provider, a deterministic HashedGramEmbedder); swap in
    ``SentenceTransformerEmbedder`` for a real model — the reference's
    ``[ml]``-extra seam (st_emb.py:17).

    SCALE GUARD: a seed-KG dictionary broadcasts fine (2M labels × 64 dims
    ≈ 512 MB float32 — the documented ceiling), but a corpus-derived
    dictionary at 100 TB does not. Above ``max_broadcast`` rows this falls
    back to the distributed MinHash-LSH join (``link_minhash_lsh``), whose
    char-3-gram Jaccard is the blocking surrogate the reference itself uses
    for long-tail entities.
    """
    from kgpipe_spark.functions.embedders import get_default_embedder

    emb = embedder if embedder is not None else get_default_embedder()
    over = dictionary.limit(max_broadcast + 1).count() > max_broadcast
    if over:
        linked_q = link_minhash_lsh(
            mentions.select("query_text").distinct(), dictionary
        ).filter(F.col("score") >= accept)
        return mentions.join(linked_q, "query_text", "left")
    dict_rows = dictionary.select("uri", "label").collect()
    uris = [r["uri"] for r in dict_rows]
    labels = pd.Series([r["label"] for r in dict_rows])
    label_mat = emb.encode(labels) if len(labels) else np.zeros((0, emb.dim), np.float32)
    bc = spark.sparkContext.broadcast((uris, label_mat))

    from pyspark.sql.types import StringType, StructField, StructType, DoubleType

    out_schema = StructType(
        [StructField("mapping", StringType()), StructField("score", DoubleType())]
    )

    @F.pandas_udf(out_schema)  # type: ignore[call-overload]
    def topk(queries: pd.Series) -> pd.DataFrame:
        uris_b, mat_b = bc.value
        if len(uris_b) == 0 or len(queries) == 0:
            return pd.DataFrame({"mapping": [None] * len(queries), "score": [None] * len(queries)})
        q = emb.encode(queries)
        sims = q @ mat_b.T  # (batch, dict) — both sides L2-normalized
        best = sims.argmax(axis=1)
        best_sim = sims[np.arange(len(queries)), best].astype(float)
        mapping = [uris_b[i] if s >= accept else None for i, s in zip(best, best_sim)]
        score = [float(s) if m is not None else None for m, s in zip(mapping, best_sim)]
        return pd.DataFrame({"mapping": mapping, "score": score})

    distinct_q = mentions.select("query_text").distinct()
    linked_q = distinct_q.withColumn("res", topk(F.col("query_text"))).select(
        "query_text", F.col("res.mapping").alias("mapping"), F.col("res.score").alias("score")
    )
    return mentions.join(F.broadcast(linked_q), "query_text", "left")


# ---------------------------------------------------------------------------
# MinHash-LSH long-tail candidates (MLlib)
# ---------------------------------------------------------------------------


def link_minhash_lsh(
    mentions: DataFrame,
    dictionary: DataFrame,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 3,
    keep_all: bool = False,
) -> DataFrame:
    """Fuzzy label candidates via MinHashLSH over char-3-gram count vectors.

    Output: (query_text, mapping, score=1-jaccardDistance), top-1 per query
    (Window rerank — LSH join output must be deduped to match the
    reference's argmax semantics, SURVEY.md §4.2.2). With ``keep_all`` every
    pair above threshold is returned (the edge-list form ``link_two_pass``
    clusters on).
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram
    from pyspark.sql.window import Window

    # char array via split on empty pattern (JVM-side), then MLlib NGram
    def with_grams(df: DataFrame) -> DataFrame:
        chars = F.filter(F.split(F.col("norm_text"), ""), lambda c: c != "")
        g = NGram(n=3, inputCol="chars", outputCol="grams")
        return g.transform(df.withColumn("chars", chars))

    q = mentions.select("query_text").distinct().withColumn(
        "norm_text", normalize_label(F.col("query_text"))
    )
    d = dictionary.select("uri", "label").dropDuplicates(["uri", "label"]).withColumn(
        "norm_text", normalize_label(F.col("label"))
    )
    q_g = with_grams(q).filter(F.size("grams") > 0)
    d_g = with_grams(d).filter(F.size("grams") > 0)

    cv = CountVectorizer(inputCol="grams", outputCol="features", binary=True)
    cv_model = cv.fit(d_g.select("grams").unionByName(q_g.select("grams")))
    q_v = cv_model.transform(q_g).filter(F.expr("features IS NOT NULL"))
    d_v = cv_model.transform(d_g)

    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(d_v)
    pairs = model.approxSimilarityJoin(q_v, d_v, 1.0 - jaccard_threshold, distCol="dist")

    flat = pairs.select(
        F.col("datasetA.query_text").alias("query_text"),
        F.col("datasetB.uri").alias("mapping"),
        (1.0 - F.col("dist")).alias("score"),
    )
    if keep_all:
        return flat
    ranked = (
        flat
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_text").orderBy(F.desc("score"), F.asc("mapping"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return ranked


# ---------------------------------------------------------------------------
# link-or-mint + two-pass dynamic index replacement
# ---------------------------------------------------------------------------


def link_or_mint(linked_mentions: DataFrame, accept: float = DEFAULT_ACCEPT) -> DataFrame:
    """Accepted link → reuse URI; else mint ``newE/sha256(surface)``.

    Mirrors ``_link_or_create_entity`` (extract_json.py:478-521) with the
    reference's sha256 minting (benchutils.py:10-14).
    """
    return linked_mentions.withColumn(
        "resolved_uri",
        F.when(
            F.col("mapping").isNotNull() & (F.coalesce(F.col("score"), F.lit(0.0)) >= accept),
            F.col("mapping"),
        ).otherwise(mint_uri_sha256(normalize_label(F.col("query_text")))),
    )


def link_two_pass(
    mentions: DataFrame,
    dictionary: DataFrame,
    accept: float = DEFAULT_ACCEPT,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 3,
) -> DataFrame:
    """Two-pass replacement for the reference's mutable dynamic index
    (extract_json.py:84-89,498-510).

    Pass 1: exact-dictionary link-or-mint. Identical normalized surfaces
    already share one sha256-minted URI. Pass 2: the minted residual's
    surfaces are MinHash-LSH self-joined (all pairs ≥ jaccard_threshold) and
    clustered via connected components, so *near*-identical new surfaces
    collapse to one canonical minted URI (min URI per component — the
    deterministic batch analogue of the reference's order-dependent
    "first minted entity wins").
    """
    from kgpipe_spark.operators.cluster import connected_components

    pass1 = link_or_mint(link_exact(mentions, dictionary), accept)
    minted = pass1.filter(F.col("mapping").isNull())
    # localCheckpoint breaks the twin lineage: both sides of the LSH
    # self-join below descend from `minted`, which trips a Spark 4.x
    # optimizer mis-plan (zero-entry vectors reach the LSH hash UDF) when
    # left as one shared plan — same family as the exceptAll twin-plan bug.
    minted_dict = (
        minted.select(F.col("resolved_uri").alias("uri"), F.col("query_text").alias("label"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fuzzy = link_minhash_lsh(
        minted_dict.select(F.col("label").alias("query_text")),
        minted_dict,
        jaccard_threshold,
        num_hash_tables,
        keep_all=True,
    )
    own = minted_dict.select(
        F.col("label").alias("query_text"), F.col("uri").alias("own_uri")
    )
    edges = (
        fuzzy.join(own, "query_text")
        .filter(F.col("mapping") != F.col("own_uri"))
        .select(F.col("own_uri").alias("src"), F.col("mapping").alias("dst"))
    )
    comp = connected_components(edges)
    rewrite = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("resolved_uri"), F.col("component").alias("_canon")
    )
    return (
        pass1.join(F.broadcast(rewrite), "resolved_uri", "left")
        .withColumn("resolved_uri", F.coalesce("_canon", "resolved_uri"))
        .drop("_canon")
    )
