"""Scalar expression + filter/predicate queries (SURVEY §2.2, §2.8).

One named, oracle-checked query per operator family: string functions, PII
mask/tokenize (02:67-73), datetime bucketing (02:148-149), math/arithmetic
(01:109-110), conditional bucketing (02:150-154), additive rule scoring
(02:159-164), boolean-OR labeling (03:140-146), array/map literal lookups
(01:101-133, 02:145-147), predicate filters (02:112-118), and JSON
extraction (events.props).

Everything is a pure Column expression — whole-stage-codegen'd, no Python in
the row path; projections/filters push down to the parquet scan, so these
cost one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.functions.enrich import (
    additive_score,
    any_flag,
    array_pick,
    bucketize,
    map_lookup,
)
from databricks_etl_pipelines_spark.functions.numeric import stable_round
from databricks_etl_pipelines_spark.functions.privacy import (
    mask_card_number,
    tokenize_pii,
)
from databricks_etl_pipelines_spark.sources import table

# -- string functions (concat/lit/lpad/substring/length/lower/trim/sha2) ----

_STRING_ORACLE = """
SELECT
  c_custkey,
  concat('CUST-', lpad(CAST(c_custkey AS VARCHAR), 8, '0')) AS cust_id,
  length(c_name) AS name_len,
  lower(trim(c_name)) AS name_norm,
  substring(c_name, -4, 4) AS name_last4,
  sha256(lower(trim(c_name))) AS name_sha
FROM customer
"""


@query("scalar_string_functions", _STRING_ORACLE)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(
            F.lit("CUST-"), F.lpad(F.col("c_custkey").cast("string"), 8, "0")
        ).alias("cust_id"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lower(F.trim(F.col("c_name"))).alias("name_norm"),
        F.substring("c_name", -4, 4).alias("name_last4"),
        F.sha2(F.lower(F.trim(F.col("c_name"))), 256).alias("name_sha"),
    )


# -- PII masking + tokenization (02:67-73 parity) ---------------------------

_PII_ORACLE = """
SELECT
  c_custkey,
  concat('****-****-****-', right(card_number, 4)) AS card_masked,
  sha256(lower(trim(c_name))) AS holder_token
FROM (
  SELECT *,
    concat('4', lpad(CAST(c_custkey * 7919 % 999999999 AS VARCHAR), 15, '0'))
      AS card_number
  FROM customer
)
"""


@query("pii_mask_and_tokenize", _PII_ORACLE)
def pii_mask_and_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    card = F.concat(
        F.lit("4"),
        F.lpad((F.col("c_custkey") * 7919 % 999999999).cast("string"), 15, "0"),
    )
    return cust.select(
        "c_custkey",
        mask_card_number(card).alias("card_masked"),
        tokenize_pii("c_name").alias("holder_token"),
    )


# -- datetime functions (to_date/hour/year/month/date_format, 02:148-149) ---

_DATETIME_ORACLE = """
SELECT
  event_id,
  CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
  year(ts) AS event_year,
  month(ts) AS event_month,
  day(ts) AS event_day,
  hour(ts) AS event_hour,
  minute(ts) AS event_minute,
  strftime(ts, '%Y%m%d') AS date_key
FROM events
"""


@query("scalar_datetime_functions", _DATETIME_ORACLE)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # to_date then cast back to timestamp: a raw DATE crosses the
        # Spark/DuckDB→pandas boundary as different dtypes (object vs
        # datetime64) and breaks value hashing; midnight timestamps agree.
        F.to_date("ts").cast("timestamp").alias("event_date"),
        F.year("ts").cast("bigint").alias("event_year"),
        F.month("ts").cast("bigint").alias("event_month"),
        F.dayofmonth("ts").cast("bigint").alias("event_day"),
        F.hour("ts").cast("bigint").alias("event_hour"),
        F.minute("ts").cast("bigint").alias("event_minute"),
        F.date_format("ts", "yyyyMMdd").alias("date_key"),
    )


# -- math / arithmetic (round/abs/sin/mod/floor, 01:109-110) ----------------

_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
    AS net_revenue,
  floor((abs(sin(l_quantity * 0.1)) * 500 + 1.5) * 100 + 0.5) / 100
    AS synth_amount,
  l_orderkey % 7 AS mod7,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
  floor(l_quantity / 50.0 * 10000 + 0.5) / 10000 AS qty_frac
FROM lineitem
"""


@query("scalar_math_functions", _MATH_ORACLE)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            2,
        ).alias("net_revenue"),
        stable_round(F.abs(F.sin(F.col("l_quantity") * 0.1)) * 500 + 1.5, 2).alias(
            "synth_amount"
        ),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        stable_round(F.col("l_quantity") / 50.0, 4).alias("qty_frac"),
    )


# -- conditional bucketing (02:150-154 amount_bucket) -----------------------

_BUCKET_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice < 50000 THEN 'micro'
       WHEN o_totalprice < 150000 THEN 'small'
       WHEN o_totalprice < 300000 THEN 'medium'
       ELSE 'large' END AS price_bucket
FROM orders
"""


@query("scalar_conditional_bucketing", _BUCKET_ORACLE)
def scalar_conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        bucketize(
            "o_totalprice",
            [50000, 150000, 300000],
            ["micro", "small", "medium", "large"],
        ).alias("price_bucket"),
    )


# -- additive conditional rule scoring (02:159-164 risk_score_raw) ----------

_SCORE_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  (CASE WHEN l_discount > 0.05 THEN 25 ELSE 0 END
   + CASE WHEN l_tax > 0.06 THEN 15 ELSE 0 END
   + CASE WHEN l_quantity > 45 THEN 30 ELSE 0 END
   + CASE WHEN l_extendedprice > 50000 THEN 20 ELSE 0 END
   + CASE WHEN l_returnflag = 'R' THEN 10 ELSE 0 END) AS risk_score_raw
FROM lineitem
"""


@query("scalar_conditional_risk_score", _SCORE_ORACLE)
def scalar_conditional_risk_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        additive_score(
            [
                (F.col("l_discount") > 0.05, 25),
                (F.col("l_tax") > 0.06, 15),
                (F.col("l_quantity") > 45, 30),
                (F.col("l_extendedprice") > 50000, 20),
                (F.col("l_returnflag") == "R", 10),
            ]
        ).alias("risk_score_raw"),
    )


# -- boolean-OR labeling (03:140-146 is_suspicious) -------------------------

_FLAG_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CASE WHEN l_quantity >= 49 OR l_discount >= 0.09
            OR l_extendedprice >= 90000
       THEN 1 ELSE 0 END AS is_suspicious
FROM lineitem
"""


@query("scalar_boolean_or_labeling", _FLAG_ORACLE)
def scalar_boolean_or_labeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        any_flag(
            F.col("l_quantity") >= 49,
            F.col("l_discount") >= 0.09,
            F.col("l_extendedprice") >= 90000,
        ).alias("is_suspicious"),
    )


# -- array literal + element_at positional pick (01:101-133) ----------------

_ARRAY_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  (['VISA','MASTERCARD','AMEX','DISCOVER'])[l_orderkey % 4 + 1] AS network,
  (['CREDIT','DEBIT','PREPAID'])[(l_orderkey + l_linenumber) % 3 + 1]
    AS card_type
FROM lineitem
"""


@query("scalar_array_element_at", _ARRAY_ORACLE)
def scalar_array_element_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        array_pick(
            ["VISA", "MASTERCARD", "AMEX", "DISCOVER"], F.col("l_orderkey")
        ).alias("network"),
        array_pick(
            ["CREDIT", "DEBIT", "PREPAID"],
            F.col("l_orderkey") + F.col("l_linenumber"),
        ).alias("card_type"),
    )


# -- map-literal dim lookup (02:145-147 mcc_category) -----------------------

_SEGMENT_MAP = {
    "AUTOMOBILE": "consumer",
    "BUILDING": "b2b",
    "FURNITURE": "consumer",
    "MACHINERY": "b2b",
    "HOUSEHOLD": "consumer",
}

_MAP_ORACLE = """
SELECT
  c_custkey,
  c_mktsegment,
  coalesce(
    CASE c_mktsegment
      WHEN 'AUTOMOBILE' THEN 'consumer'
      WHEN 'BUILDING' THEN 'b2b'
      WHEN 'FURNITURE' THEN 'consumer'
      WHEN 'MACHINERY' THEN 'b2b'
      WHEN 'HOUSEHOLD' THEN 'consumer'
    END, 'other') AS segment_class
FROM customer
"""


@query("scalar_map_literal_lookup", _MAP_ORACLE)
def scalar_map_literal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        map_lookup("c_mktsegment", _SEGMENT_MAP, default="other").alias(
            "segment_class"
        ),
    )


# -- predicate filters: null / comparison / length / IN / computed ----------
# (02:112-118 DQ gate shapes)

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_returnflag IS NOT NULL
  AND l_quantity > 30
  AND length(l_linestatus) = 1
  AND l_returnflag IN ('A', 'R')
  AND l_orderkey % 2 = 1
"""


@query("filter_predicates", _FILTER_ORACLE)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isNotNull())
        .filter(F.col("l_quantity") > 30)
        .filter(F.length("l_linestatus") == 1)
        .filter(F.col("l_returnflag").isin("A", "R"))
        .filter(F.col("l_orderkey") % 2 == 1)
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
        )
    )


# -- JSON extraction over events.props --------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
  event_type
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


@query("json_extract_events", _JSON_ORACLE)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", prop_k.alias("prop_k"), "event_type")
        .filter(F.col("prop_k") > 50)
    )


# ---------------------------------------------------------------------------
# regex + explode surface (SURVEY §2.8 "absent — engine exposes anyway"):
# regexp_extract/replace/like for text analysis, split+explode for
# tokenized fan-out. Patterns stay in the RE2 ∩ Java-regex dialect so
# Spark and DuckDB agree.
# ---------------------------------------------------------------------------

_REGEXP_ORACLE = """
SELECT doc_id,
  regexp_extract(text, '[0-9]+') AS first_number,
  length(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_len,
  regexp_matches(text, '(data|model|train)') AS mentions_ml
FROM documents
"""


@query("scalar_regexp_functions", _REGEXP_ORACLE)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.length(F.regexp_replace("text", "[aeiou]", ""))
        .cast("bigint")
        .alias("devoweled_len"),
        F.col("text").rlike("(data|model|train)").alias("mentions_ml"),
    )


_EXPLODE_ORACLE = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
)
GROUP BY word
ORDER BY n DESC, word
LIMIT 25
"""


@query("scalar_explode_word_counts", _EXPLODE_ORACLE)
def scalar_explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → count: the tokenize/fan-out shape. Partial
    aggregation runs map-side before the single shuffle on word."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# unpivot (wide → long): stack() — the inverse of pivot.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH long AS (
  SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'price', l_extendedprice FROM lineitem
  UNION ALL SELECT 'discount', l_discount FROM lineitem
)
SELECT measure, CAST(count(*) AS BIGINT) AS n,
  round(sum(val), 2) AS total
FROM long GROUP BY measure
"""


@query("scalar_unpivot_stack", _UNPIVOT_ORACLE)
def scalar_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack() fans each row out to (measure, value) rows INSIDE the
    projection — unlike a UNION ALL of three scans, the table is read
    once."""
    li = table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, val)"
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        stable_round(F.sum("val"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# collection functions: sequence/slice/flatten/position/sort + higher-order
# transform/filter/aggregate — the array algebra the LLM ops build on.
# ---------------------------------------------------------------------------

_COLLECTION_ORACLE = """
SELECT l_orderkey, l_linenumber,
  array_to_string(range(1, CAST(l_linenumber AS BIGINT) + 1), ',') AS seq,
  array_to_string((range(1, CAST(l_linenumber AS BIGINT) + 1))[1:2], ',')
    AS first_two,
  CAST(coalesce(list_position([3, 1, 4, 1, 5], CAST(l_linenumber AS INT)), 0)
       AS BIGINT) AS pos_in_pi,
  array_to_string(list_sort(range(1, CAST(l_linenumber AS BIGINT) + 1),
    'DESC'), ',') AS seq_desc,
  array_to_string(list_transform(range(1, CAST(l_linenumber AS BIGINT) + 1),
    x -> x * x), ',') AS squares,
  coalesce(array_to_string(
    list_filter(range(1, CAST(l_linenumber AS BIGINT) + 1),
      x -> x % 2 = 0), ','), '') AS evens,
  CAST(list_sum(range(1, CAST(l_linenumber AS BIGINT) + 1)) AS BIGINT)
    AS seq_sum
FROM lineitem
WHERE l_orderkey % 1000 = 1
"""


@query("scalar_collection_functions", _COLLECTION_ORACLE)
def scalar_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence / slice / array_position / sort_array / transform / filter /
    aggregate — all codegen expression-level, no Python."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 1)
    seq = F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.array_join(seq, ",").alias("seq"),
        F.array_join(F.slice(seq, 1, 2), ",").alias("first_two"),
        F.array_position(
            F.array(*[F.lit(v) for v in (3, 1, 4, 1, 5)]),
            F.col("l_linenumber").cast("int"),
        ).alias("pos_in_pi"),
        F.array_join(F.sort_array(seq, asc=False), ",").alias("seq_desc"),
        F.array_join(F.transform(seq, lambda x: x * x), ",").alias("squares"),
        F.array_join(F.filter(seq, lambda x: x % 2 == 0), ",").alias("evens"),
        F.aggregate(
            seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("seq_sum"),
    )


# -- typed JSON parse: from_json → struct (vs get_json_object string pulls) ----

_FROM_JSON_ORACLE = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS INT) AS k,
  CAST(json_extract(props, '$.k') AS INT) % 7 AS k_mod
FROM events
"""


@query("scalar_from_json_struct", _FROM_JSON_ORACLE)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json parses once into a typed struct; downstream references are
    plain column reads — cheaper than repeated get_json_object string
    pulls when several fields are used."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k int"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 7).alias("k_mod"),
    )


_VARIANT_ORACLE = """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS INT) AS k_value,
  CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS INT) AS k_mod10
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) > 50
"""


@query("scalar_variant_json", _VARIANT_ORACLE)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse_json
    once, then typed variant_get paths — the open-ended-schema alternative
    to from_json's fixed struct (binary-encoded, no schema declared up
    front, predicate still usable for pruning)."""
    ev = table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v")).select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k_value"),
    )
    return v.filter(F.col("k_value") > 50).select(
        "event_id",
        "k_value",
        (F.col("k_value") % 10).cast("int").alias("k_mod10"),
    )


# -- custom Python data source (Spark 4 DataSource API) -----------------------

def _sql_fold(expr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_extract_all(md5({expr}), '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(acc, c) -> (acc * 257 + c) % 2147483647)"
    )


_PYSOURCE_ROWS = 200

_PYSOURCE_ORACLE = f"""
WITH ids AS (SELECT unnest(range(0, {_PYSOURCE_ROWS})) AS doc_id),
t AS (
  SELECT doc_id,
    list_transform(
      range(0, 5 + {_sql_fold("CAST(doc_id AS VARCHAR) || ':len'")} % 8),
      j -> (['alpha','bravo','charlie','delta',
             'echo','foxtrot','golf','hotel'])[
        {_sql_fold("CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
        % 8 + 1]) AS ws
  FROM ids
)
SELECT doc_id, array_to_string(ws, ' ') AS text,
  CAST(len(ws) AS INT) AS n_words
FROM t
"""


@query("source_python_datasource", _PYSOURCE_ORACLE)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector on Spark 4's Python DataSource API
    (sources/pydatasource.py): 4 InputPartitions generate executor-side.
    Generation is a pure function of doc_id through the cross-engine md5
    rolling hash, so the oracle REGENERATES the exact rows in SQL — a
    full value-hash check on a from-scratch Python source."""
    from databricks_etl_pipelines_spark.sources import pydatasource

    pydatasource.register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", _PYSOURCE_ROWS)
        .option("n_partitions", 4)
        .load()
    )


@query("source_python_stream_datasource", _PYSOURCE_ORACLE)
def source_python_stream_datasource(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAMING flavor of the custom Python source: offsets are row
    positions, each availableNow drain consumes one micro-batch through a
    shared checkpoint, and the looped drain stops when the offset stops
    advancing. The parquet sink accumulates every row EXACTLY ONCE
    (checkpointed offsets, deterministic regeneration for replay) — and
    the oracle regenerates the identical 200 rows in SQL."""
    import glob
    import os

    from databricks_etl_pipelines_spark.sources import pydatasource
    from databricks_etl_pipelines_spark.sources.scratch import scratch_dir
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
    )

    pydatasource.register_stream(spark)
    root = scratch_dir("pystream_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    for _ in range(12):  # 200 rows / 60-row batches → 4 productive drains
        stream = (
            spark.readStream.format("synthetic_docs_stream")
            .option("rows", _PYSOURCE_ROWS).option("batch", 60).load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        await_drained(q, 120)
        files = glob.glob(os.path.join(out, "*.parquet"))
        if files and spark.read.parquet(out).count() >= _PYSOURCE_ROWS:
            break
    return spark.read.parquet(out)


# -- document-corpus PII scrub (training-data extension of 02:67-73) --------
# The synthetic corpus carries no real PII, so the query PLANTS
# deterministic emails/phones on every third document (same construction in
# both engines), then scrubs them — the differential check covers the regex
# find/count/replace machinery end-to-end, value-for-value.

from databricks_etl_pipelines_spark.functions.privacy import (  # noqa: E402
    PII_EMAIL_PATTERN,
    PII_PHONE_PATTERN,
    SQL_PLANT_PII,
    pii_match_count,
    plant_synthetic_pii,
    scrub_text_pii,
)

_PLANT = SQL_PLANT_PII

_DOC_SCRUB_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_PLANT} AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL_PATTERN}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(text, '{PII_PHONE_PATTERN}')) AS BIGINT)
    AS n_phones,
  md5(regexp_replace(
        regexp_replace(text, '{PII_EMAIL_PATTERN}', '[EMAIL]', 'g'),
        '{PII_PHONE_PATTERN}', '[PHONE]', 'g')) AS scrubbed_md5,
  CAST(length(regexp_replace(
        regexp_replace(text, '{PII_EMAIL_PATTERN}', '[EMAIL]', 'g'),
        '{PII_PHONE_PATTERN}', '[PHONE]', 'g')) AS BIGINT) AS scrubbed_len
FROM planted
"""


@query("privacy_document_scrub", _DOC_SCRUB_ORACLE)
def privacy_document_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII scrub over the documents corpus: count then redact
    emails/phones with RE2-compatible patterns (functions/privacy.py).
    Pure regexp expressions — JVM codegen, zero Python per row; at 100 TB
    this fuses into the scan projection like every other gate."""
    docs = table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", plant_synthetic_pii("doc_id", "text").alias("text")
    )
    scrubbed = scrub_text_pii("text")
    return planted.select(
        "doc_id",
        pii_match_count("text", PII_EMAIL_PATTERN).alias("n_emails"),
        pii_match_count("text", PII_PHONE_PATTERN).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )
