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


def char_gram_set(norm: "F.Column", n: int = 3) -> "F.Column":
    """Distinct char-n-grams of an (already normalized) string, JVM-side.

    ``sequence(1, length-2)`` would run *descending* for short strings
    (Spark's sequence fills stop < start), so the under-length case is
    guarded to an empty array explicitly.
    """
    return F.when(
        F.length(norm) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - (n - 1)),
                lambda i: F.substring(norm, i, n),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minted_near_edges(
    minted_dict: DataFrame,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """(src, dst) edges between minted URIs whose normalized surfaces are
    near-identical: banded MinHash-LSH candidates over char-3-gram sets,
    verified by exact set Jaccard ≥ threshold.

    Same md5-derived Carter-Wegman hash family as ``dedup.minhash_signatures``
    (sig[i] = min over grams of (a + i·b) mod 2^32 with (a, b) the first two
    32-bit words of md5(gram)) — deterministic and engine-portable, so the
    whole two-pass linker replays bit-exactly in DuckDB (unlike MLlib
    MinHashLSH, whose hash family an external oracle cannot reproduce).
    Pure JVM: candidates are banded/bucketed (no all-pairs), the Jaccard
    verify join touches only bucket-collision survivors — the 100 TB path.

    Input: (uri, norm) — one row per minted uri (uri ↔ norm is 1:1, the uri
    IS sha256(norm)).
    """
    rows_per_band = num_hashes // bands
    grams = minted_dict.select(
        "uri", char_gram_set(F.col("norm")).alias("grams")
    ).filter(F.size("grams") > 0)
    # localCheckpoint: both sides of the band self-join and the verify join
    # descend from `grams` — break the twin lineage once (same rationale as
    # dedup.minhash_lsh_pairs).
    grams = grams.localCheckpoint(eager=False)
    ab = grams.select(
        "uri",
        F.explode("grams").alias("s"),
    ).select(
        "uri",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(F.md5("s"), 9, 8), 16, 10).cast("long").alias("b"),
    )
    mins = ab.groupBy("uri").agg(
        *[
            F.min((F.col("a") + F.lit(i) * F.col("b")) % F.lit(4294967296)).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    sig = mins.select(
        "uri", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )
    banded = sig.select(
        "uri",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("uri", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # in-bucket pair explode instead of a banded self-join (one exchange,
    # no join; identical uri_a < uri_b pair set — see dedup.minhash_lsh_pairs)
    cand = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("uri")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("uri_a"), y.alias("uri_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.uri_a", "p.uri_b")
        .dropDuplicates()
    )
    g = grams.select("uri", "grams")
    verified = (
        cand.join(g.select(F.col("uri").alias("uri_a"), F.col("grams").alias("g_a")), "uri_a")
        .join(g.select(F.col("uri").alias("uri_b"), F.col("grams").alias("g_b")), "uri_b")
        .withColumn("_inter", F.size(F.array_intersect("g_a", "g_b")))
        .withColumn("_union", F.size("g_a") + F.size("g_b") - F.col("_inter"))
        .filter(F.col("_inter") / F.col("_union") >= jaccard_threshold)
    )
    return verified.select(F.col("uri_a").alias("src"), F.col("uri_b").alias("dst"))


def link_two_pass(
    mentions: DataFrame,
    dictionary: DataFrame,
    accept: float = DEFAULT_ACCEPT,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Two-pass replacement for the reference's mutable dynamic index
    (extract_json.py:84-89,498-510).

    Pass 1: exact-dictionary link-or-mint. Identical normalized surfaces
    already share one sha256-minted URI. Pass 2: the minted residual's
    normalized surfaces are MinHash-LSH self-joined (``minted_near_edges`` —
    the repo's own md5-derived, DuckDB-replayable hash family, NOT MLlib)
    and clustered via connected components, so *near*-identical new surfaces
    collapse to one canonical minted URI (min URI per component — the
    deterministic batch analogue of the reference's order-dependent
    "first minted entity wins").
    """
    from kgpipe_spark.operators.cluster import connected_components

    pass1 = link_or_mint(link_exact(mentions, dictionary), accept)
    minted = pass1.filter(F.col("mapping").isNull())
    # uri = sha256(normalized surface), so uri ↔ norm is functional; dedup by
    # uri keeps one deterministic (uri, norm) row even when several raw
    # surfaces normalize identically.
    minted_dict = minted.select(
        F.col("resolved_uri").alias("uri"),
        normalize_label(F.col("query_text")).alias("norm"),
    ).dropDuplicates(["uri"])
    edges = minted_near_edges(minted_dict, jaccard_threshold, num_hashes, bands)
    comp = connected_components(edges)
    rewrite = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("resolved_uri"), F.col("component").alias("_canon")
    )
    return (
        pass1.join(F.broadcast(rewrite), "resolved_uri", "left")
        .withColumn("resolved_uri", F.coalesce("_canon", "resolved_uri"))
        .drop("_canon")
    )
