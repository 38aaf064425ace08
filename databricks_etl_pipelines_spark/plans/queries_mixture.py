"""Corpus mixture / assembly queries: token-budget selection, domain
reweighting, cross-source overlap, and semantic (embedding-cluster) dedup.

These are the "assemble the training mix" steps that sit downstream of the
cleaning operators in ``plans/queries_llm.py``: once documents are scored
and deduplicated, a pipeline still has to decide HOW MUCH of each domain to
take (token budgets, mixture weights) and needs provenance diagnostics
across corpus slices (overlap). All but the KMeans-backed semantic dedup
are exactly SQL-expressible and carry DuckDB oracles.

Reference scope: the reference repo's gold layer builds per-entity
aggregate features (03_Gold_Aggregates_Features.py:93-128) — the same
aggregate→ratio→join shapes reappear here applied to corpus accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.functions.numeric import (
    sql_stable_round,
    stable_round,
)
from databricks_etl_pipelines_spark.functions.textfns import (
    LANG_STOPWORDS,
    token_count,
)
from databricks_etl_pipelines_spark.operators.curation import (
    domain_mixture_weights,
    quality_score,
    source_overlap,
    token_budget_select_bounded,
)
from databricks_etl_pipelines_spark.sources import table

# Shared SQL fragments (same forms as plans/queries_llm.py oracles) --------

_SQL_TOKS = "string_split_regex(trim(text), '\\s+')"
_SQL_NTOK = f"len({_SQL_TOKS})"
_SQL_EN_STOPWORDS = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

# quality score, identical rubric to operators/curation.py:quality_score
_SQL_QUALITY = f"""
  (CASE WHEN {_SQL_NTOK} BETWEEN 10 AND 1000 THEN 30 ELSE 0 END
   + CASE WHEN CAST(list_sum(list_transform({_SQL_TOKS}, x -> length(x)))
       AS BIGINT) / {_SQL_NTOK} BETWEEN 3 AND 12 THEN 30 ELSE 0 END
   + CASE WHEN len(list_filter({_SQL_TOKS}, x -> x IN
       ({_SQL_EN_STOPWORDS})))
       / {_SQL_NTOK} > 0.05 THEN 20 ELSE 0 END
   + CASE WHEN (length(text) - length(regexp_replace(text, '[.,;:!?]', '',
       'g'))) / length(text) < 0.2
      AND (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
       / length(text) < 0.2 THEN 20 ELSE 0 END)
"""

_BUDGET = 2_000

_TOKEN_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         {_SQL_NTOK} AS n_tokens,
         {_SQL_QUALITY} AS quality
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_tokens, quality,
         CAST(sum(n_tokens) OVER (
           PARTITION BY source
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(quality AS BIGINT) AS quality, cum_tokens
FROM ranked
WHERE cum_tokens <= {_BUDGET}
"""


@query("curation_token_budget_select", _TOKEN_BUDGET_ORACLE)
def curation_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill each source's token budget with its best documents: rank by the
    quality rubric (doc_id tiebreak) and keep the greedy prefix whose
    running token total stays within the budget. Token-denominated quotas
    are how training mixes are actually specified. Runs the bounded-memory
    two-pass variant (bucket partial sums -> bucket-prefix pre-filter ->
    exact window over ~budget-sized survivors) so the driver verifies it
    bit-identical against the single-window oracle SQL; no task sorts a
    whole source."""
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        quality_score("text").cast("bigint").alias("quality"),
    )
    return token_budget_select_bounded(
        scored, "source", "quality", "n_tokens", "doc_id", _BUDGET
    ).select("doc_id", "source", "n_tokens", "quality", "cum_tokens")


_MIXTURE_ORACLE = f"""
WITH per_group AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({_SQL_NTOK}) AS BIGINT) AS group_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(group_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_groups
  FROM per_group
)
SELECT source, n_docs, group_tokens,
  {sql_stable_round('group_tokens / total_tokens', 6)} AS token_share,
  {sql_stable_round('1.0 / n_groups', 6)} AS target_share,
  {sql_stable_round(
      'least((1.0 / n_groups) / (group_tokens / total_tokens), 10.0)', 6
  )} AS weight
FROM per_group, tot
"""


@query("curation_mixture_weights", _MIXTURE_ORACLE)
def curation_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reweighting bookkeeping (DoReMi-style): exact per-source token
    shares vs a uniform target, emitting the capped up/down-sampling weight
    per source. One aggregation pass + broadcast of the single-row global
    total."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("source", token_count("text").alias("n_tokens"))
    out = domain_mixture_weights(toks, "source", "n_tokens")
    return out.select(
        "source",
        "n_docs",
        "group_tokens",
        stable_round(F.col("token_share"), 6).alias("token_share"),
        stable_round(F.col("target_share"), 6).alias("target_share"),
        stable_round(F.col("weight"), 6).alias("weight"),
    )


_OVERLAP_ORACLE = """
WITH gf AS (
  SELECT DISTINCT source AS g, md5(text) AS fp FROM documents
), counts AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_fp FROM gf GROUP BY g
), grid AS (
  SELECT a.g AS group_a, b.g AS group_b, a.n_fp AS fp_a, b.n_fp AS fp_b
  FROM counts a, counts b WHERE a.g < b.g
), inter AS (
  SELECT x.g AS group_a, y.g AS group_b,
         CAST(count(*) AS BIGINT) AS fp_common
  FROM gf x JOIN gf y ON x.fp = y.fp AND x.g < y.g
  GROUP BY x.g, y.g
)
SELECT grid.group_a, grid.group_b, fp_a, fp_b,
       CAST(coalesce(fp_common, 0) AS BIGINT) AS fp_common,
       coalesce(fp_common, 0) / (fp_a + fp_b - coalesce(fp_common, 0))
         AS jaccard
FROM grid LEFT JOIN inter
  ON grid.group_a = inter.group_a AND grid.group_b = inter.group_b
"""


@query("curation_source_overlap", _OVERLAP_ORACLE)
def curation_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise exact content overlap between sources on md5 text
    fingerprints — the cross-slice contamination/provenance report. The
    intersection join is keyed on the FINGERPRINT (cost tracks duplicate
    count, not corpus size squared); the pair grid over per-source counts
    keeps zero-overlap pairs in the report."""
    docs = table(spark, sf_dir, "documents")
    return source_overlap(docs, "source", F.md5("text"))


@query("dedup_semantic_clusters")
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: KMeans-cluster the
    embeddings (learned, data-adaptive blocking), exact cosine within each
    cluster. Rows-only in the harness (KMeans centroids are seeded
    engine-specific state); pytest pins planted-duplicate recall and the
    pairs ⊆ brute-force-pairs invariant."""
    from databricks_etl_pipelines_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    emb = table(spark, sf_dir, "embeddings")
    # threshold 0.3 (not a realistic dup bar) because the synthetic
    # embeddings are near-uniform — max pairwise cosine at sf0.01 is 0.51,
    # so a production-style 0.95 returns zero rows and proves nothing
    return semantic_dedup_pairs(
        emb, "embedding", "vec_id", n_clusters=8, threshold=0.3
    ).orderBy("id_a", "id_b")



def _semdedup_crossengine_oracle(dim: int = 64, nlist: int = 16,
                                 stride: int = 29,
                                 threshold: float = 0.3) -> str:
    """Assignment replayed with the strict-fold squared L2 (ties to the
    lower centroid id), then the per-cluster pair scan with the ROUNDED
    cosine compared against the threshold on both engines."""

    def fold_sq(vec: str, cv: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), "
            f"j -> ({vec}[j] - {cv}[j]) * ({vec}[j] - {cv}[j]))), "
            "(acc, x) -> acc + x)"
        )

    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
  WHERE vec_id % {stride} = 0 ORDER BY vec_id LIMIT {nlist}
),
v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
grid AS (
  SELECT v.id, v.v, cent.cid, {fold_sq('v.v', 'cent.cv')} AS d
  FROM v, cent
),
assigned AS (
  SELECT id, v, cid AS cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
    FROM grid
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.cluster_id,
    floor(list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))) * 1000000 + 0.5) / 1000000
      AS cosine_sim
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.id < b.id
)
SELECT id_a, id_b, cluster_id, cosine_sim
FROM pairs WHERE cosine_sim >= {threshold}
"""


@query("dedup_semdedup_crossengine", _semdedup_crossengine_oracle())
def dedup_semdedup_crossengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under a HARD oracle: deterministic strided centroids make
    the cluster blocking + within-cluster cosine pair scan SQL-replayable
    value-for-value — the differential check the KMeans variant
    (dedup_semantic_clusters) can't have. Same 0.3 threshold rationale:
    the synthetic embeddings are near-uniform, a production 0.95 bar
    would return zero rows and prove nothing."""
    from databricks_etl_pipelines_spark.operators.dedup import (
        semantic_dedup_pairs_deterministic,
    )

    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs_deterministic(
        emb, "embedding", "vec_id", threshold=0.3, n_clusters=16,
        centroid_stride=29,
    )

# -- corpus drift between snapshots -------------------------------------------

_DRIFT_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, lang, {_SQL_NTOK} AS ntok FROM documents
),
stacked AS (
  SELECT doc_id % 2 AS snap, 'source' AS dim, source AS key, ntok FROM d
  UNION ALL
  SELECT doc_id % 2 AS snap, 'lang' AS dim, lang AS key, ntok FROM d
),
g AS (
  SELECT snap, dim, key,
         CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(ntok) AS BIGINT) AS toks
  FROM stacked GROUP BY 1, 2, 3
),
t AS (
  SELECT *, toks / sum(toks) OVER (PARTITION BY snap, dim) AS share FROM g
)
SELECT
  coalesce(a.dim, b.dim) AS dim,
  coalesce(a.key, b.key) AS key,
  coalesce(a.docs, 0) AS docs_a,
  coalesce(b.docs, 0) AS docs_b,
  floor(coalesce(a.share, 0) * 1000000 + 0.5) / 1000000 AS token_share_a,
  floor(coalesce(b.share, 0) * 1000000 + 0.5) / 1000000 AS token_share_b,
  floor((coalesce(b.share, 0) - coalesce(a.share, 0)) * 1000000 + 0.5)
    / 1000000 AS share_delta
FROM (SELECT * FROM t WHERE snap = 0) a
FULL OUTER JOIN (SELECT * FROM t WHERE snap = 1) b
  ON a.dim = b.dim AND a.key = b.key
"""


@query("curation_corpus_drift", _DRIFT_ORACLE)
def curation_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition drift between two corpus snapshots
    (operators/curation.py:corpus_drift_report) — here the even/odd doc_id
    halves stand in for crawl N vs crawl N+1. Each side is one scan
    (stack-unpivot of the dim columns, no self-join), shares normalize
    over the tiny per-dim aggregate, and the comparison is a full-outer
    join of aggregate-sized frames."""
    from databricks_etl_pipelines_spark.operators.curation import (
        corpus_drift_report,
    )

    docs = table(spark, sf_dir, "documents").withColumn(
        "__ntok", token_count("text")
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return corpus_drift_report(a, b, ["source", "lang"], "__ntok")


@query("streaming_corpus_drift", _DRIFT_ORACLE)
def streaming_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift report maintained INCREMENTALLY over the documents stream:
    each micro-batch stack-unpivots its own rows and folds (snap, dim, key)
    doc/token sums ADDITIVELY into a managed aggregate table
    (streaming/structured.py:incremental_aggregate) — per-batch cost tracks
    the batch + the tiny aggregate, never corpus history. The drift
    projection (within-dim shares, full-outer A-vs-B) then reads ONLY the
    maintained aggregate. Drained with availableNow the sums equal the
    batch sums exactly (addition is associative), so the oracle is the
    SAME SQL as the batch drift report — which is the point: incremental
    maintenance must be invisible in the result."""
    from databricks_etl_pipelines_spark.sources.managed_table import (
        ManagedTable,
    )
    from databricks_etl_pipelines_spark.sources.scratch import scratch_dir
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
        incremental_aggregate,
        streaming_documents,
    )
    from pyspark.sql import Window

    stream = streaming_documents(spark, sf_dir)

    def partial(batch: DataFrame) -> DataFrame:
        stacked = batch.select(
            (F.col("doc_id") % 2).alias("snap"),
            F.stack(
                F.lit(2),
                F.lit("source"), F.col("source"),
                F.lit("lang"), F.col("lang"),
            ).alias("dim", "key"),
            token_count("text").cast("bigint").alias("__tok"),
        )
        return stacked.groupBy("snap", "dim", "key").agg(
            F.count("*").alias("docs"), F.sum("__tok").alias("toks")
        )

    target = ManagedTable(scratch_dir("drift_gold_"))
    q = incremental_aggregate(
        stream, target, ["snap", "dim", "key"], partial,
        scratch_dir("drift_ckpt_"),
    )
    await_drained(q, 300)

    g = target.read(spark)
    dim_total = F.sum("toks").over(Window.partitionBy("snap", "dim"))
    t = g.withColumn("share", F.col("toks") / dim_total)
    a = t.filter(F.col("snap") == 0).alias("a")
    b = t.filter(F.col("snap") == 1).alias("b")
    joined = a.join(
        b,
        (F.col("a.dim") == F.col("b.dim")) & (F.col("a.key") == F.col("b.key")),
        "full_outer",
    )
    share_a = F.coalesce(F.col("a.share"), F.lit(0.0))
    share_b = F.coalesce(F.col("b.share"), F.lit(0.0))
    return joined.select(
        F.coalesce(F.col("a.dim"), F.col("b.dim")).alias("dim"),
        F.coalesce(F.col("a.key"), F.col("b.key")).alias("key"),
        F.coalesce(F.col("a.docs"), F.lit(0)).alias("docs_a"),
        F.coalesce(F.col("b.docs"), F.lit(0)).alias("docs_b"),
        stable_round(share_a, 6).alias("token_share_a"),
        stable_round(share_b, 6).alias("token_share_b"),
        stable_round(share_b - share_a, 6).alias("share_delta"),
    )



# Mixture materialization: one row per (document, epoch). The fractional
# epoch picks documents by the same cross-engine md5 rolling hash as
# curation_shard_assignment, so the oracle reproduces the exact schedule.
_EPOCH_PLAN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, CAST({_SQL_NTOK} AS BIGINT) AS n_tokens
  FROM documents
),
a AS (
  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS gtok FROM d GROUP BY lang
),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok FROM d),
g AS (
  SELECT a.lang,
    CAST(floor((0.2 * t.ttok) / a.gtok) AS BIGINT) AS full_epochs,
    CAST(floor(((0.2 * t.ttok) / a.gtok
                - floor((0.2 * t.ttok) / a.gtok)) * 1000000) AS BIGINT)
      AS th
  FROM a, t
),
db AS (
  SELECT d.*,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(md5(CAST(doc_id AS VARCHAR) || ':42'), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647
    ) % 1000000 AS bkt
  FROM d
),
n AS (
  SELECT db.doc_id, db.lang, db.n_tokens,
    least(g.full_epochs + CASE WHEN db.bkt < g.th THEN 1 ELSE 0 END, 8)
      AS n_epochs
  FROM db JOIN g USING (lang)
)
SELECT doc_id, lang, n_tokens,
  CAST(unnest(generate_series(0, CAST(n_epochs AS BIGINT) - 1)) AS INT)
    AS epoch
FROM n WHERE n_epochs > 0
"""


@query("curation_mixture_epoch_plan", _EPOCH_PLAN_ORACLE)
def curation_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized mixture schedule: resample the corpus to a uniform
    20% token share per language — each doc repeats floor(f) epochs plus
    a deterministic-hash fractional epoch. The step that turns DoReMi
    weights (curation_mixture_weights) into actual loader rows; the
    oracle replays the exact (doc, epoch) schedule."""
    from databricks_etl_pipelines_spark.operators.curation import (
        mixture_epoch_plan,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    return mixture_epoch_plan(
        docs, "lang", "n_tokens", "doc_id",
        target_shares={k: 0.2 for k in ("en", "de", "fr", "es", "zh")},
        seed=42, max_epochs=8,
    )


# Temperature-smoothed mixture at alpha = 0.5 (XLM): group weights are
# sqrt(n_g) — the one power IEEE requires correctly rounded, so the
# smoothed shares are engine-exact — normalized by a GROUP-NAME-ordered
# fold (array_agg ORDER BY), then materialized by the same epoch
# machinery as the plan above.
_TEMPERATURE_EPOCHS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, CAST({_SQL_NTOK} AS BIGINT) AS n_tokens
  FROM documents
),
a AS (
  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS gtok FROM d GROUP BY lang
),
t AS (
  SELECT
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        array_agg(sqrt(CAST(gtok AS DOUBLE)) ORDER BY lang)),
      (acc, x) -> acc + x) AS w,
    CAST(sum(gtok) AS BIGINT) AS ttok
  FROM a
),
g AS (
  SELECT a.lang,
    CAST(floor(((sqrt(CAST(a.gtok AS DOUBLE)) / t.w) * t.ttok) / a.gtok)
         AS BIGINT) AS full_epochs,
    CAST(floor((((sqrt(CAST(a.gtok AS DOUBLE)) / t.w) * t.ttok) / a.gtok
        - floor(((sqrt(CAST(a.gtok AS DOUBLE)) / t.w) * t.ttok) / a.gtok))
        * 1000000) AS BIGINT) AS th
  FROM a, t
),
db AS (
  SELECT d.*,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(md5(CAST(doc_id AS VARCHAR) || ':42'), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647
    ) % 1000000 AS bkt
  FROM d
),
n AS (
  SELECT db.doc_id, db.lang, db.n_tokens,
    least(g.full_epochs + CASE WHEN db.bkt < g.th THEN 1 ELSE 0 END, 8)
      AS n_epochs
  FROM db JOIN g USING (lang)
)
SELECT doc_id, lang, n_tokens,
  CAST(unnest(generate_series(0, CAST(n_epochs AS BIGINT) - 1)) AS INT)
    AS epoch
FROM n WHERE n_epochs > 0
"""


@query("curation_temperature_epochs", _TEMPERATURE_EPOCHS_ORACLE)
def curation_temperature_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed multilingual resampling (alpha = 0.5, the XLM
    exponent; same smoothing family as mT5/XLM-R): languages sampled
    proportional to sqrt(token count), boosting low-resource languages
    into repeated epochs and damping high-resource ones at a constant
    total token budget, materialized as the exact (doc, epoch) loader
    schedule. The oracle replays the whole thing — sqrt weights,
    group-ordered normalizer fold, repetition factors, hash-fraction
    epochs."""
    from databricks_etl_pipelines_spark.operators.curation import (
        temperature_epoch_plan,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    return temperature_epoch_plan(
        docs, "lang", "n_tokens", "doc_id", seed=42, max_epochs=8
    )


# DSIR importance weights: hashed-unigram log-likelihood-ratio scoring of
# every raw doc against a target domain (sources src1-src3). The md5+
# Karp-Rabin feature hash is the same cross-engine family as the SimHash
# oracle, so every bucket assignment replays exactly in SQL.

_DSIR_BUCKETS = 64
_DSIR_TARGET = "source IN ('src1', 'src2', 'src3')"


def _sql_rolling_md5_w(prefix: str) -> str:
    """KarpRabin over md5('<prefix>' || w) — w = the exploded token col."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_extract_all(md5('{prefix}' || w), '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(acc, c) -> (acc * 257 + c) % 2147483647)"
    )


_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DSIR_TARGET} AS is_target, unnest({_SQL_TOKS}) AS w
  FROM documents
),
bucketed AS (
  SELECT doc_id, is_target,
    (({_sql_rolling_md5_w('a:')} & 1073741823)
     | (({_sql_rolling_md5_w('b:')} & 1073741823) << 30))
      % {_DSIR_BUCKETS} AS b
  FROM toks
),
raw AS (SELECT b, count(*) AS n_raw FROM bucketed GROUP BY b),
tgt AS (
  SELECT b, count(*) AS n_tgt FROM bucketed WHERE is_target GROUP BY b
),
tot AS (
  SELECT count(*) AS total_raw,
    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS total_tgt
  FROM bucketed
),
ratios AS (
  SELECT raw.b,
    ln((COALESCE(n_tgt, 0) + 1) / (total_tgt + {_DSIR_BUCKETS}))
      - ln((n_raw + 1) / (total_raw + {_DSIR_BUCKETS})) AS log_ratio
  FROM raw LEFT JOIN tgt USING (b), tot
),
doc_bucket AS (
  SELECT doc_id, b, count(*) AS c FROM bucketed GROUP BY doc_id, b
)
SELECT doc_id,
  CAST(sum(c) AS BIGINT) AS n_tokens,
  {sql_stable_round('sum(c * log_ratio)', 6)} AS dsir_weight,
  {sql_stable_round('sum(c * log_ratio) / sum(c)', 6)} AS dsir_weight_per_token
FROM doc_bucket JOIN ratios USING (b)
GROUP BY doc_id
"""


@query("curation_dsir_weights", _DSIR_ORACLE)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score raw docs by hashed-
    unigram importance against the src1-src3 target slice. See
    operators/curation.py:dsir_importance_weights for the scale shape
    (bucket-sized aggregates + broadcast log-ratio join; nothing shuffles
    more than one row per (doc, bucket))."""
    from databricks_etl_pipelines_spark.operators.curation import (
        dsir_importance_weights,
    )

    docs = table(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs,
        "text",
        "doc_id",
        F.col("source").isin("src1", "src2", "src3"),
        n_buckets=_DSIR_BUCKETS,
    )


# Composition: DSIR weights drive the per-domain token-budget cut — the
# "select the most target-like documents per source until the token budget
# fills" step. Ranking uses the ROUNDED per-token weight (identical doubles
# in both engines) with doc_id as the deterministic tiebreak, so duplicate
# documents (identical weights) cannot reorder across engines.

_DSIR_SELECT_BUDGET = 2_000

_DSIR_BUDGET_ORACLE = f"""
WITH dsir AS (SELECT * FROM ({_DSIR_ORACLE})),
j AS (
  SELECT d.doc_id, doc.source, d.n_tokens, d.dsir_weight_per_token
  FROM dsir d JOIN documents doc USING (doc_id)
),
sel AS (
  SELECT *,
    CAST(sum(n_tokens) OVER (
      PARTITION BY source
      ORDER BY dsir_weight_per_token DESC, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM j
)
SELECT doc_id, source, n_tokens, dsir_weight_per_token, cum_tokens
FROM sel WHERE cum_tokens <= {_DSIR_SELECT_BUDGET}
"""


@query("curation_dsir_budget_select", _DSIR_BUDGET_ORACLE)
def curation_dsir_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budgets filled in DSIR-weight order: the importance
    scorer and the greedy budget cut composed end-to-end (both pieces are
    independently oracle-checked; this checks their composition)."""
    from databricks_etl_pipelines_spark.operators.curation import (
        dsir_importance_weights,
        token_budget_select,
    )

    docs = table(spark, sf_dir, "documents")
    weights = dsir_importance_weights(
        docs,
        "text",
        "doc_id",
        F.col("source").isin("src1", "src2", "src3"),
        n_buckets=_DSIR_BUCKETS,
    )
    joined = weights.join(docs.select("doc_id", "source"), "doc_id")
    out = token_budget_select(
        joined,
        "source",
        "dsir_weight_per_token",
        "n_tokens",
        "doc_id",
        _DSIR_SELECT_BUDGET,
    )
    return out.select(
        "doc_id", "source", "n_tokens", "dsir_weight_per_token", "cum_tokens"
    )


# Weighted sampling without replacement (Efraimidis-Spirakis A-ES keys):
# top-k per source by ln(u)/w with a deterministic cross-engine uniform,
# weights = quality rubric + 1 (strictly positive).

_ES_K = 5

_ES_HASH = """list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(md5(CAST(doc_id AS VARCHAR) || ':42'), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647
    ) % 1000000"""

_WEIGHTED_SAMPLE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, ({_SQL_QUALITY}) + 1 AS w FROM documents
),
keyed AS (
  SELECT doc_id, source, w,
    ln(({_ES_HASH} + 1) / 1000001.0) / w AS es_key
  FROM scored
)
SELECT doc_id, source, CAST(w AS BIGINT) AS weight,
  CAST(row_number() OVER (
    PARTITION BY source ORDER BY es_key DESC, doc_id) AS BIGINT)
    AS sample_rank
FROM keyed
QUALIFY sample_rank <= {_ES_K}
"""


@query("curation_weighted_sample", _WEIGHTED_SAMPLE_ORACLE)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsample, k docs per source, no
    replacement — distributed weighted reservoir sampling (A-ES). The
    deterministic uniform makes the exact selection replayable in SQL;
    see operators/curation.py:weighted_sample_without_replacement."""
    from databricks_etl_pipelines_spark.operators.curation import (
        weighted_sample_without_replacement,
    )

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", (quality_score("text") + 1).alias("w")
    )
    out = weighted_sample_without_replacement(
        scored, "source", "w", "doc_id", _ES_K, seed=42
    )
    return out.select(
        "doc_id", "source", F.col("w").cast("bigint").alias("weight"),
        "sample_rank",
    )


@query("streaming_dsir_scores", _DSIR_ORACLE)
def streaming_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scoring as a CONTINUOUS ingest filter: the domain profile is
    built once from the reference corpus, then every arriving micro-batch
    is scored against it (stream-static broadcast join + batch-local
    aggregate; streaming/structured.py:dsir_score_stream). Drained with
    availableNow over the same corpus, the scores equal the batch DSIR
    query exactly — the oracle is the SAME SQL, asserting incremental
    scoring is invisible in the result."""
    from databricks_etl_pipelines_spark.operators.curation import (
        dsir_log_ratios,
    )
    from databricks_etl_pipelines_spark.sources.scratch import scratch_dir
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
        dsir_score_stream,
        streaming_documents,
    )

    docs = table(spark, sf_dir, "documents")
    ratios = dsir_log_ratios(
        docs, "text", F.col("source").isin("src1", "src2", "src3"),
        n_buckets=_DSIR_BUCKETS,
    ).persist()
    try:
        out = scratch_dir("dsir_scores_")
        q = dsir_score_stream(
            streaming_documents(spark, sf_dir),
            ratios,
            out,
            scratch_dir("dsir_ckpt_"),
            n_buckets=_DSIR_BUCKETS,
        )
        await_drained(q, 300)
        return spark.read.parquet(out).select(
            "doc_id", "n_tokens", "dsir_weight", "dsir_weight_per_token"
        )
    finally:
        ratios.unpersist()


# Pairwise source JSD over hashed-unigram distributions (mixture design:
# which domains are linguistically close). Same cross-engine feature hash
# as DSIR; smoothing keeps every bucket finite.

_JSD_BUCKETS = 64

_SOURCE_JSD_ORACLE = f"""
WITH toks AS (
  SELECT source AS g, unnest({_SQL_TOKS}) AS w FROM documents
),
bucketed AS (
  SELECT g,
    (({_sql_rolling_md5_w('a:')} & 1073741823)
     | (({_sql_rolling_md5_w('b:')} & 1073741823) << 30))
      % {_JSD_BUCKETS} AS b
  FROM toks
),
counts AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c
           FROM bucketed GROUP BY g, b),
totals AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY g),
gridkeys AS (
  SELECT t.g, t.tot, u.b
  FROM totals t, unnest(generate_series(0, {_JSD_BUCKETS - 1})) AS u(b)
),
grid AS (
  SELECT gk.g, gk.b, gk.tot,
    (COALESCE(c.c, 0) + 1) / (gk.tot + {_JSD_BUCKETS}) AS p
  FROM gridkeys gk LEFT JOIN counts c ON c.g = gk.g AND c.b = gk.b
),
pairs AS (
  SELECT a.g AS source_a, bb.g AS source_b,
    a.tot AS tokens_a, bb.tot AS tokens_b,
    0.5 * a.p * ln(a.p / ((a.p + bb.p) / 2))
      + 0.5 * bb.p * ln(bb.p / ((a.p + bb.p) / 2)) AS term
  FROM grid a JOIN grid bb ON a.b = bb.b AND a.g < bb.g
)
SELECT source_a, source_b,
  CAST(min(tokens_a) AS BIGINT) AS tokens_a,
  CAST(min(tokens_b) AS BIGINT) AS tokens_b,
  {sql_stable_round('sum(term)', 6)} AS jsd
FROM pairs GROUP BY source_a, source_b
"""


@query("curation_source_divergence", _SOURCE_JSD_ORACLE)
def curation_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    hashed-unigram token distributions (add-one smoothed, bounded by
    ln 2) — see operators/curation.py:source_token_divergence for the
    grid-join scale shape (pair join runs on the bucket GRID, never the
    corpus)."""
    from databricks_etl_pipelines_spark.operators.curation import (
        source_token_divergence,
    )

    docs = table(spark, sf_dir, "documents")
    return source_token_divergence(
        docs, "source", "text", n_buckets=_JSD_BUCKETS
    )


# The round-4 pipeline end to end: PII scrub -> quality gate -> exact
# dedup -> repeated-span gate -> DSIR per-source budget selection, with
# EVERY stage's attrition recomputed independently in SQL. PII is planted
# deterministically (same construction both engines) so the scrub stage
# is exercised, not vacuous.

from databricks_etl_pipelines_spark.functions.privacy import (  # noqa: E402
    PII_EMAIL_PATTERN as _EMAIL_RE,
    PII_PHONE_PATTERN as _PHONE_RE,
    SQL_PLANT_PII as _SQL_PLANT,
    plant_synthetic_pii,
)


def _prepare_corpus_oracle() -> str:
    dsir_hash = (
        f"(({_sql_rolling_md5_w('a:')} & 1073741823)"
        f" | (({_sql_rolling_md5_w('b:')} & 1073741823) << 30)) % 64"
    )
    return f"""
WITH planted AS (
  SELECT doc_id, source, {_SQL_PLANT} AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, source,
    regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{_PHONE_RE}', '[PHONE]', 'g') AS text
  FROM planted
),
q AS (SELECT doc_id, source, text, ({_SQL_QUALITY}) AS quality
      FROM scrubbed),
gated AS (SELECT doc_id, source, text FROM q WHERE quality >= 90),
keep AS (
  SELECT min(doc_id) AS doc_id FROM gated
  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
),
uniq AS (SELECT g.* FROM gated g JOIN keep k USING (doc_id)),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM uniq
),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(t[u.i:u.i+7], ' ') AS g
  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
),
dupg AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM grams)
  GROUP BY g HAVING count(*) >= 2
),
hits AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
covered AS (
  SELECT doc_id, count(*) AS covered_tokens FROM (
    SELECT DISTINCT doc_id, v.p
    FROM hits, unnest(generate_series(pos, pos + 7)) AS v(p)
  ) GROUP BY doc_id
),
spanok AS (
  SELECT u.doc_id, u.source, u.text FROM uniq u
  JOIN toks tk USING (doc_id)
  LEFT JOIN covered c USING (doc_id)
  WHERE floor(COALESCE(c.covered_tokens, 0) / len(tk.t) * 1000000 + 0.5)
        / 1000000 <= 0.5
),
dtok AS (
  SELECT doc_id, source IN ('src1', 'src2', 'src3') AS is_target,
         unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM spanok
),
bucketed AS (SELECT doc_id, is_target, {dsir_hash} AS b FROM dtok),
braw AS (SELECT b, count(*) AS n_raw FROM bucketed GROUP BY b),
btgt AS (SELECT b, count(*) AS n_tgt FROM bucketed WHERE is_target
         GROUP BY b),
btot AS (
  SELECT count(*) AS total_raw,
    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS total_tgt
  FROM bucketed
),
ratios AS (
  SELECT braw.b,
    ln((COALESCE(n_tgt, 0) + 1) / (total_tgt + 64))
      - ln((n_raw + 1) / (total_raw + 64)) AS log_ratio
  FROM braw LEFT JOIN btgt USING (b), btot
),
doc_bucket AS (
  SELECT doc_id, b, count(*) AS c FROM bucketed GROUP BY doc_id, b
),
wts AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
    {sql_stable_round('sum(c * log_ratio) / sum(c)', 6)} AS wpt
  FROM doc_bucket JOIN ratios USING (b) GROUP BY doc_id
),
selq AS (
  SELECT w2.doc_id,
    CAST(sum(w2.n_tokens) OVER (
      PARTITION BY s.source ORDER BY w2.wpt DESC, w2.doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM wts w2 JOIN spanok s USING (doc_id)
),
c0 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM planted),
c1 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM gated),
c2 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uniq),
c3 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM spanok),
c4 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM selq WHERE cum <= 300)
SELECT 'input' AS stage, c0.v AS rows_in, c0.v AS rows_out,
       CAST(0 AS BIGINT) AS rows_dropped FROM c0
UNION ALL SELECT 'pii_scrub', c0.v, c0.v, CAST(0 AS BIGINT) FROM c0
UNION ALL SELECT 'quality_gate', c0.v, c1.v, c0.v - c1.v FROM c0, c1
UNION ALL SELECT 'exact_dedup', c1.v, c2.v, c1.v - c2.v FROM c1, c2
UNION ALL SELECT 'span_gate', c2.v, c3.v, c2.v - c3.v FROM c2, c3
UNION ALL SELECT 'dsir_budget_select', c3.v, c4.v, c3.v - c4.v FROM c3, c4
"""


@query("curation_prepare_corpus", _prepare_corpus_oracle())
def curation_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pretraining-prep pipeline under one differential
    check: plant PII, scrub, quality-gate, exact-dedup, span-gate, then
    fill per-source token budgets in DSIR order — the oracle recomputes
    every stage's attrition count independently (see
    operators/curation.py:prepare_pretraining_corpus)."""
    from databricks_etl_pipelines_spark.operators.curation import (
        prepare_pretraining_corpus,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        plant_synthetic_pii("doc_id", "text").alias("text"),
    )
    _, report = prepare_pretraining_corpus(
        docs, F.col("source").isin("src1", "src2", "src3"),
        budget_tokens=300,
    )
    return report
