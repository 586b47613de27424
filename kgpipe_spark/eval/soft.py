"""Soft (embedding) evaluation metrics — SURVEY.md §2.9.

Reimplements the reference's embedding-based acceptance math:

 - ``soft_label_matches`` / ``soft_entity_mapping`` mirror
   ``graph_match_labels_soft``
   (`/root/reference/src/kgpipe/evaluation/aspects/func/soft_metrics.py:47-85`):
   best-cosine entity mapping actual→expected over cleaned rdfs:labels,
   accepted above a threshold (0.95).
 - ``fact_alignment_soft_entities`` mirrors
   ``graph_fact_alginment_soft_entities`` (`soft_metrics.py:87-101`, SoftE):
   rewrite actual subjects/objects through the mapping, then exact alignment.
 - ``fact_alignment_soft_values`` mirrors
   ``graph_fact_alginment_soft_entities_values`` (`soft_metrics.py:104-205`,
   SoftEV): additionally replace URI objects by their labels and compare
   values per (s, p) group by best cosine.
 - ``source_entity_coverage`` / ``source_entity_coverage_fuzzy`` /
   ``source_entity_precision_fuzzy`` mirror ``evaluate_source_entity_*``
   (`integration_eval.py:119-250`).

Engine-symmetric embedding design (the point of this module): instead of
float32 numpy vectors behind a pandas UDF (``linking.hash_embed``), metrics
use a *sparse integer* representation computed entirely JVM-side —
char-3-grams → md5 → signed 64-bin counts — so the DuckDB oracle replicates
every intermediate bit-exactly:

    cosine(a, b) = Σ va·vb / (sqrt(Σ va²) · sqrt(Σ vb²))

All sums are sums of small integers (exact in double regardless of addition
order); the only roundings are two sqrts, one multiply, one divide — all
IEEE-correctly-rounded, hence identical across engines.  The cosine value is
numerically the same as the float32 dense cosine up to 1e-6, far from the
0.95 acceptance threshold on any realistic margin.

Scale design: candidate pairs come from a *shared-gram equi-join* with a
frequency cap (mirroring ``dedup.py``'s blocked joins) rather than the
reference's dense N×M matrix — any pair with cosine ≥ 0.95 shares most of
its grams, so blocking on one shared (non-hot) gram is a superset of the
accepted set while staying linear in corpus size.  Determinism deviations
from the reference (which iterates unordered rdflib sets): one label per
URI = min(cleaned label); argmax ties broken by min expected URI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgpipe_spark.schemas import RDFS_LABEL

SOFT_THRESHOLD = 0.95  # soft_metrics.py:15-16, integration_eval.py:22
EMBED_BINS = 64
DEFAULT_MAX_BLOCK = 1000

_KEY = ["subject", "predicate", "object_lex", "object_kind"]


def clean_label(c: F.Column) -> F.Column:
    """`soft_metrics.py:40-45`: '_'→' ', drop '(...)' spans, trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(c, "_", " "), r"\([^)]*\)", ""))


# ---------------------------------------------------------------------------
# sparse signed-gram vectors (engine-symmetric hashed embedding)
# ---------------------------------------------------------------------------


def gram_bins(df: DataFrame, id_col: str, text_col: str, bins: int = EMBED_BINS) -> DataFrame:
    """(id, bin, v): signed char-3-gram counts, the sparse integer form of
    ``linking._hash_embed_numpy`` (same md5 first-4-bytes-little-endian hash,
    same sign bit 31, same modulus)."""
    s = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    d = (
        df.select(F.col(id_col).alias("id"), s.alias("s"))
        # Spark sequence(1, n<1) is DESCENDING, not empty — guard short strings
        .filter(F.length("s") >= 3)
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.length("s") - 2)))
        .withColumn("m", F.md5(F.col("s").substr(F.col("j"), F.lit(3))))
        .withColumn(
            "h",
            F.conv(
                F.concat(
                    F.col("m").substr(7, 2),
                    F.col("m").substr(5, 2),
                    F.col("m").substr(3, 2),
                    F.col("m").substr(1, 2),
                ),
                16,
                10,
            ).cast("long"),
        )
        .withColumn("bin", F.col("h") % bins)
        .withColumn("sign", F.lit(1) - 2 * F.shiftright("h", 31))
    )
    return d.groupBy("id", "bin").agg(F.sum("sign").alias("v"))


def _with_norms(vec: DataFrame) -> DataFrame:
    """(id, ssq): integer sum of squares per vector (exact)."""
    return vec.groupBy("id").agg(F.sum(F.col("v") * F.col("v")).alias("ssq"))


def _grams_distinct(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    s = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    return (
        df.select(F.col(id_col).alias("id"), s.alias("s"))
        .filter(F.length("s") >= 3)
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.length("s") - 2)))
        .select("id", F.col("s").substr(F.col("j"), F.lit(3)).alias("g"))
        .distinct()
    )


def cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    max_block: int = DEFAULT_MAX_BLOCK,
    prefix_filter: bool = True,
) -> DataFrame:
    """(left.id, right.id, cos) candidate pairs with exact cosine.

    left/right: (id, text). With ``prefix_filter`` (the default), candidate
    generation is a PREFIX FILTER with a global rarity order (ppjoin-style):
    each string keeps only its ``⌊n/10⌋+2`` globally-rarest grams (rank by
    total frequency, then gram), and a pair is a candidate iff the kept
    prefixes intersect — for the near-identical strings a 0.95 threshold
    accepts, the gram sets overlap ~90%+, so their rarity prefixes must
    collide. This keeps candidates LINEAR in corpus size where
    share-any-gram blocking grows quadratically in every mid-frequency
    gram's block (measured: minutes vs seconds at 10× data).

    ``prefix_filter=False`` falls back to share-any-(non-hot)-gram blocking.
    REQUIRED for top-1/argmax consumers (label_alias_embedding_rl links
    every surface to its best property with NO threshold): the rarity
    prefix of two moderately-similar strings is dominated by exactly the
    grams they DON'T share, so it can miss the argmax pair entirely — only
    use the prefix path when a high (≥0.9) similarity cut is applied
    downstream. Grams hotter than ``max_block`` on either side are dropped
    from candidate generation in both modes. The dot product itself is
    exact over all 64 bins.
    """
    lg = _grams_distinct(left, "id", "text")
    rg = _grams_distinct(right, "id", "text")
    freq = (
        lg.groupBy("g").agg(F.count(F.lit(1)).alias("nl"))
        .join(rg.groupBy("g").agg(F.count(F.lit(1)).alias("nr")), "g", "outer")
        .select(
            "g",
            (F.coalesce("nl", F.lit(0)) + F.coalesce("nr", F.lit(0))).alias("freq"),
            F.coalesce("nl", F.lit(0)).alias("nl"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    keep = freq.filter((F.col("nl") <= max_block) & (F.col("nr") <= max_block)).select(
        "g", "freq"
    )

    def prefix(grams: DataFrame) -> DataFrame:
        w = Window.partitionBy("id").orderBy(F.asc("freq"), F.asc("g"))
        n = Window.partitionBy("id")
        return (
            grams.join(keep, "g")
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(n))
            .filter(F.col("_rn") <= F.floor(F.col("_n") / 10) + 2)
            .select("id", "g")
        )

    lg_c = prefix(lg) if prefix_filter else lg.join(keep.select("g"), "g")
    rg_c = prefix(rg) if prefix_filter else rg.join(keep.select("g"), "g")
    cand = (
        lg_c.join(rg_c.withColumnRenamed("id", "rid"), "g")
        .select(F.col("id").alias("lid"), "rid")
        .distinct()
    )
    lv = gram_bins(left, "id", "text")
    rv = gram_bins(right, "id", "text")
    dots = (
        cand.join(lv.withColumnRenamed("id", "lid"), "lid")
        .join(
            rv.select(F.col("id").alias("rid"), "bin", F.col("v").alias("w")),
            ["rid", "bin"],
        )
        .groupBy("lid", "rid")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    ln = _with_norms(lv).select(F.col("id").alias("lid"), F.col("ssq").alias("lssq"))
    rn = _with_norms(rv).select(F.col("id").alias("rid"), F.col("ssq").alias("rssq"))
    return (
        dots.join(ln, "lid")
        .join(rn, "rid")
        .select(
            "lid",
            "rid",
            (
                F.col("dot")
                / (F.sqrt(F.col("lssq").cast("double")) * F.sqrt(F.col("rssq").cast("double")))
            ).alias("cos"),
        )
    )


def cosine_all_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """(lid, rid, cos) over the FULL cross product — same exact integer
    dot / sqrt math as ``cosine_pairs`` (bit-identical scores), no candidate
    blocking. Use only when one side is small (e.g. ontology-sized): the
    small side's binned vectors are broadcast into the join.

    This is the recall-complete fallback for top-1 consumers when blocking
    drops a string whose grams are all hotter than ``max_block``."""
    lv = gram_bins(left, "id", "text")
    rv = gram_bins(right, "id", "text")
    dots = (
        lv.withColumnRenamed("id", "lid")
        .join(
            F.broadcast(rv.select(F.col("id").alias("rid"), "bin", F.col("v").alias("w"))),
            "bin",
        )
        .groupBy("lid", "rid")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    ln = _with_norms(lv).select(F.col("id").alias("lid"), F.col("ssq").alias("lssq"))
    rn = _with_norms(rv).select(F.col("id").alias("rid"), F.col("ssq").alias("rssq"))
    return (
        dots.join(ln, "lid")
        .join(F.broadcast(rn), "rid")
        .select(
            "lid",
            "rid",
            (
                F.col("dot")
                / (F.sqrt(F.col("lssq").cast("double")) * F.sqrt(F.col("rssq").cast("double")))
            ).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# entity mapping (graph_match_labels_soft)
# ---------------------------------------------------------------------------


def _uri_labels(kg: DataFrame) -> DataFrame:
    """One cleaned label per URI (min — the reference's dict keeps an
    arbitrary rdflib-order label; soft_metrics.py:48-56)."""
    return (
        kg.filter(F.col("predicate") == RDFS_LABEL)
        .select(F.col("subject").alias("id"), clean_label(F.col("object_lex")).alias("text"))
        .groupBy("id")
        .agg(F.min("text").alias("text"))
    )


def soft_entity_mapping(
    actual: DataFrame,
    expected: DataFrame,
    threshold: float = SOFT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """(actual_uri, expected_uri, score): best expected per actual, score >
    threshold (strict >, soft_metrics.py:76-83)."""
    pairs = cosine_pairs(_uri_labels(actual), _uri_labels(expected), max_block)
    w = Window.partitionBy("lid").orderBy(F.desc("cos"), F.asc("rid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("cos") > threshold))
        .select(
            F.col("lid").alias("actual_uri"),
            F.col("rid").alias("expected_uri"),
            F.col("cos").alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# SoftE — fact alignment after soft entity rewrite
# ---------------------------------------------------------------------------


def _one_pass_alignment(a: DataFrame, e: DataFrame) -> DataFrame:
    """tp/fp/fn + P/R/F1 in ONE job: full-outer join on the triple key
    (fixes the 3-count-job pattern flagged in round 1)."""
    a = a.select(*_KEY).distinct().withColumn("_a", F.lit(1))
    e = e.select(*_KEY).distinct().withColumn("_e", F.lit(1))
    j = a.join(e, _KEY, "full_outer")
    agg = j.agg(
        F.sum(F.when(F.col("_a").isNotNull() & F.col("_e").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_a").isNotNull() & F.col("_e").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_a").isNull() & F.col("_e").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
    return agg.select(
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)), 6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)), 6).alias("recall"),
        F.round(
            2 * F.col("tp") / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)),
            6,
        ).alias("f1"),
    )


def fact_alignment_soft_entities(
    actual: DataFrame,
    expected: DataFrame,
    threshold: float = SOFT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """SoftE (`soft_metrics.py:87-101`): map actual subjects AND uri objects
    through the soft mapping, then exact alignment."""
    # the mapping cosine chain feeds both the subject and the object rewrite
    # joins — materialize it once
    mapping = soft_entity_mapping(actual, expected, threshold, max_block).select(
        "actual_uri", "expected_uri"
    ).localCheckpoint()
    ms = mapping.withColumnRenamed("actual_uri", "subject").withColumnRenamed(
        "expected_uri", "subject_m"
    )
    mo = mapping.withColumnRenamed("actual_uri", "object_lex").withColumnRenamed(
        "expected_uri", "object_m"
    )
    rewritten = (
        actual.join(F.broadcast(ms), "subject", "left")
        .join(
            F.broadcast(mo),
            (F.col("object_kind") == "uri") & (actual["object_lex"] == mo["object_lex"]),
            "left",
        )
        .select(
            F.coalesce("subject_m", "subject").alias("subject"),
            "predicate",
            F.coalesce("object_m", actual["object_lex"]).alias("object_lex"),
            "object_kind",
        )
    )
    return _one_pass_alignment(rewritten, expected)


# ---------------------------------------------------------------------------
# SoftEV — value-level soft alignment
# ---------------------------------------------------------------------------


def _label_expanded(kg: DataFrame, subject_map: DataFrame | None) -> DataFrame:
    """(subject, predicate, value): URI objects replaced by each of their
    cleaned labels (or the URI string when unlabeled) — `soft_metrics.py:
    109-145` get_label + graph rebuild. Subjects optionally rewritten."""
    labels = (
        kg.filter(F.col("predicate") == RDFS_LABEL)
        .select(
            F.col("subject").alias("_luri"),
            clean_label(F.col("object_lex")).alias("_label"),
        )
        .distinct()
    )
    t = kg.select("subject", "predicate", "object_lex", "object_kind")
    if subject_map is not None:
        sm = subject_map.select(
            F.col("actual_uri").alias("subject"), F.col("expected_uri").alias("_sm")
        )
        t = t.join(F.broadcast(sm), "subject", "left").withColumn(
            "subject", F.coalesce("_sm", "subject")
        ).drop("_sm")
    uris = t.filter(F.col("object_kind") == "uri")
    lits = t.filter(F.col("object_kind") != "uri").select(
        "subject", "predicate", F.col("object_lex").alias("value")
    )
    expanded = (
        uris.join(labels, uris["object_lex"] == labels["_luri"], "left")
        .select(
            "subject",
            "predicate",
            F.coalesce("_label", F.col("object_lex")).alias("value"),
        )
    )
    return expanded.unionByName(lits).distinct()


def fact_alignment_soft_values(
    actual: DataFrame,
    expected: DataFrame,
    threshold: float = SOFT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """SoftEV (`soft_metrics.py:104-205`): subjects soft-mapped, URI objects
    label-expanded on BOTH sides, values compared per (s, p) group by best
    cosine (> threshold → tp, else fp; expected (s,p) groups absent from
    actual contribute their triple count to fn)."""
    mapping = soft_entity_mapping(actual, expected, threshold, max_block).select(
        "actual_uri", "expected_uri"
    )
    # the soft-mapping cosine chain folded into `ga` is referenced by the
    # pair join, the scored join AND the fn anti-join — persist both
    # expanded sides once instead of re-deriving the chain per consumer
    ga = _label_expanded(actual, mapping).localCheckpoint()
    ge = _label_expanded(expected, None).localCheckpoint()

    # embed each distinct value string once (relational CSE of encode_wrapper)
    vals = (
        ga.select(F.col("value").alias("text"))
        .unionByName(ge.select(F.col("value").alias("text")))
        .distinct()
        .withColumn("id", F.col("text"))
    )
    vec = gram_bins(vals, "id", "text").localCheckpoint()
    norms = _with_norms(vec)

    pairs = (
        ga.join(
            ge.select("subject", "predicate", F.col("value").alias("evalue")),
            ["subject", "predicate"],
        ).localCheckpoint()
    )
    dots = (
        pairs.join(vec.withColumnRenamed("id", "value"), "value")
        .join(
            vec.select(F.col("id").alias("evalue"), "bin", F.col("v").alias("w")),
            ["evalue", "bin"],
        )
        .groupBy("subject", "predicate", "value", "evalue")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    scored = (
        pairs.join(dots, ["subject", "predicate", "value", "evalue"], "left")
        .join(norms.withColumnRenamed("id", "value").withColumnRenamed("ssq", "assq"), "value", "left")
        .join(norms.withColumnRenamed("id", "evalue").withColumnRenamed("ssq", "essq"), "evalue", "left")
        .withColumn(
            "cos",
            F.when(
                F.col("dot").isNotNull() & (F.col("assq") > 0) & (F.col("essq") > 0),
                F.col("dot")
                / (F.sqrt(F.col("assq").cast("double")) * F.sqrt(F.col("essq").cast("double"))),
            ).otherwise(F.lit(0.0)),
        )
    )
    per_actual = scored.groupBy("subject", "predicate", "value").agg(
        F.max("cos").alias("best")
    )
    counts = per_actual.agg(
        F.sum(F.when(F.col("best") > threshold, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("best") > threshold, 0).otherwise(1)).alias("fp"),
    )
    sp_actual = ga.select("subject", "predicate").distinct()
    fn_df = (
        ge.join(sp_actual, ["subject", "predicate"], "left_anti")
        .agg(F.count(F.lit(1)).alias("fn"))
    )
    out = counts.crossJoin(fn_df)
    return out.select(
        F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
        F.coalesce(F.col("fp"), F.lit(0)).cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)), 6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)), 6).alias("recall"),
        F.round(
            2 * F.col("tp") / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# source entity coverage (integration_eval.py:119-250)
# ---------------------------------------------------------------------------


def source_entity_coverage(kg: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Exact coverage (`integration_eval.py:119-140`): labeled KG subjects
    overlapping the verified-entity dict by URI or raw label."""
    labeled = kg.filter(F.col("predicate") == RDFS_LABEL).select(
        "subject", F.col("object_lex").alias("label")
    )
    dict_uris = entity_dict.select(F.col("entity_uri").alias("subject")).distinct()
    dict_labels = (
        entity_dict.filter(F.col("entity_label").isNotNull())
        .select(F.col("entity_label").alias("label"))
        .distinct()
    )
    overlap = (
        labeled.join(F.broadcast(dict_uris), "subject", "left_semi")
        .select("subject")
        .unionByName(
            labeled.join(F.broadcast(dict_labels), "label", "left_semi").select("subject")
        )
        .distinct()
    )
    expected_n = entity_dict.select("entity_uri").distinct().count()
    found_n = labeled.select("subject").distinct().count()
    overlap_n = overlap.count()
    cov = overlap_n / expected_n if expected_n else 0.0
    import math

    cov6 = math.floor(min(cov, 1.0) * 1000000) / 1000000  # engine-portable quantize
    return kg.sparkSession.createDataFrame(
        [(expected_n, found_n, overlap_n, cov6)],
        "expected_entities bigint, found_entities bigint, overlapping_entities bigint, coverage double",
    )


def source_entity_coverage_fuzzy(
    kg: DataFrame,
    entity_dict: DataFrame,
    threshold: float = SOFT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Fuzzy coverage (`integration_eval.py:142-177`): found labels matching
    any dict label at cosine ≥ threshold (raw labels, not cleaned — the
    reference embeds them as-is)."""
    found = kg.filter(F.col("predicate") == RDFS_LABEL).select(
        F.col("object_lex").alias("label")
    )
    dict_labels = (
        entity_dict.filter(F.col("entity_label").isNotNull())
        .select(F.col("entity_label").alias("text"))
        .distinct()
        .withColumn("id", F.col("text"))
    )
    found_distinct = found.distinct().select(F.col("label").alias("text"), F.col("label").alias("id"))
    pairs = cosine_pairs(found_distinct, dict_labels, max_block)
    matched = pairs.filter(F.col("cos") >= threshold).select(F.col("lid").alias("label")).distinct()
    expected_n = entity_dict.select("entity_uri").distinct().count()
    found_n = found.count()  # label *occurrences*, integration_eval.py:153-156
    overlap_n = matched.count()
    return kg.sparkSession.createDataFrame(
        [(expected_n, found_n, overlap_n)],
        "expected_entities bigint, found_labels bigint, overlapping_labels bigint",
    )


def source_entity_precision_fuzzy(
    kg: DataFrame,
    entity_dict: DataFrame,
    threshold: float = SOFT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Fuzzy precision (`integration_eval.py:179-244`): each found label
    claims its best dict label ≥ threshold; a dict label claimed more than
    once marks the extra claims as possible duplicates.

    Deterministic deviation: the reference claims in unordered graph
    iteration order; we rank claimants per dict label by (score desc, label
    asc) so the strict set is stable.
    """
    found = kg.filter(F.col("predicate") == RDFS_LABEL).select(
        F.col("object_lex").alias("label")
    )
    occ = found.groupBy("label").agg(F.count(F.lit(1)).alias("n_occ"))
    dict_labels = (
        entity_dict.filter(F.col("entity_label").isNotNull())
        .select(F.col("entity_label").alias("text"))
        .distinct()
        .withColumn("id", F.col("text"))
    )
    found_distinct = occ.select(F.col("label").alias("text"), F.col("label").alias("id"))
    pairs = cosine_pairs(found_distinct, dict_labels, max_block).filter(
        F.col("cos") >= threshold
    )
    best = (
        pairs.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("lid").orderBy(F.desc("cos"), F.asc("rid"))),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("lid").alias("label"), F.col("rid").alias("ref"), "cos")
    )
    claimed = best.join(occ, "label").withColumn(
        "claim_rn",
        F.row_number().over(Window.partitionBy("ref").orderBy(F.desc("cos"), F.asc("label"))),
    )
    agg = claimed.agg(
        F.countDistinct("label").alias("overlapping"),
        F.sum(F.when(F.col("claim_rn") == 1, 1).otherwise(0)).alias("strict"),
        F.sum("n_occ").alias("matched_occ"),
    )
    expected_n = entity_dict.select("entity_uri").distinct().count()
    found_n = found.count()
    row = agg.collect()[0]
    overlapping = row["overlapping"] or 0
    strict = row["strict"] or 0
    dup = (row["matched_occ"] or 0) - strict
    return kg.sparkSession.createDataFrame(
        [(expected_n, found_n, overlapping, strict, dup)],
        "expected_entities bigint, found_labels bigint, overlapping_labels bigint,"
        " strict_overlapping bigint, possible_duplicates bigint",
    )
