"""Map-type functions, generators (explode/posexplode), and higher-order
array functions (SURVEY.md §2.B rows "map fns", "array fns", UDTF surface).

The reference's data model allows nested JSON values (glue/job.py:25 parses
arbitrary JSON) but never exercises them; the driver's tables do —
``embeddings.embedding`` is ``array<float>`` and ``events.props`` is a JSON
string.  Everything here is built-in expression API (create_map / explode /
transform / filter / aggregate / zip_with): JVM-evaluated, no Python UDFs.

Oracle notes: DuckDB's MAP surface differs from Spark's enough that the map
oracle recomputes the *output values* directly (the driver hashes results,
not plans).  Generator and higher-order oracles are structural twins
(unnest WITH ORDINALITY, list_transform/list_filter/list_sum); the
double-fold determinism trick is the one verified in llm/similarity.py —
both engines fold the list in element order with a double accumulator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.catalog import load_table
from etl_pipeline_aws_spark.registry import query

# ---------------------------------------------------------------------------
# Map functions: build a map column, then read it back with element_at /
# map_keys / size.  Output is scalar columns, so the oracle states the
# expected values directly.
# ---------------------------------------------------------------------------


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           CASE WHEN value >= 0 THEN 'pos' ELSE 'neg' END AS sign_from_map,
           CAST(2 AS INT) AS map_size,
           'sign,type' AS keys_sorted
    FROM events
    WHERE event_id < 1000
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map -> element_at / map_keys / size round-trip on events."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("sign"),
        F.when(F.col("value") >= 0, "pos").otherwise("neg"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "sign").alias("sign_from_map"),
        F.size(m).cast("int").alias("map_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


# ---------------------------------------------------------------------------
# Generators: explode / posexplode over tokenized documents — Spark's UDTF
# surface (one row in, N rows out) without writing a UDTF.
# ---------------------------------------------------------------------------


@query(
    "explode_wordcount",
    oracle="""
    SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    GROUP BY tok
    """,
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical generator pipeline: explode(split) -> groupBy count.
    At 100 TB this is the word-count shuffle; partial aggregation combines
    map-side so the shuffle carries one row per (partition, word)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, toks[t.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 50),
         unnest(range(1, len(toks) + 1)) AS t(i)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode keeps element ordinals — the order-preserving generator
    (DuckDB twin: lateral unnest over an index range)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("int"))


# ---------------------------------------------------------------------------
# Higher-order array functions over embeddings: transform / filter / exists
# / aggregate / zip_with.  All fold in element order with double math —
# bit-identical across engines (same IEEE ops in the same sequence).
# ---------------------------------------------------------------------------


@query(
    "higher_order_array",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 500
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS dim,
           v[1] * 2.0 AS first_scaled,
           CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_positive,
           len(list_filter(v, x -> x > 0.9)) > 0 AS any_gt_09,
           list_sum(list_transform(v, x -> abs(x))) AS l1_norm,
           list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i])) AS dot_self
    FROM e
    """,
)
def higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    v = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(v).cast("int").alias("dim"),
        (F.element_at(v, 1) * 2.0).alias("first_scaled"),
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.exists(v, lambda x: x > 0.9).alias("any_gt_09"),
        fold(F.transform(v, F.abs)).alias("l1_norm"),
        fold(F.zip_with(v, v, lambda x, y: x * y)).alias("dot_self"),
    )


@query(
    "array_slice_sort",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           list_sum(v[1:4]) AS head4_sum,
           list_sort(v)[1] AS min_elem,
           list_sort(v)[len(v)] AS max_elem,
           list_contains(v, 0.0) AS has_zero
    FROM e
    """,
)
def array_slice_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slice / array_min / array_max / contains.  Array-typed columns
    stringify differently across engines in the driver's hash, so the
    slice folds to a scalar (DuckDB v[1:4] is 1-based inclusive = 4
    elements = Spark slice(v, 1, 4); both sum in element order)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.aggregate(F.slice(v, 1, 4), F.lit(0.0), lambda a, x: a + x).alias("head4_sum"),
        F.array_min(v).alias("min_elem"),
        F.array_max(v).alias("max_elem"),
        F.array_contains(v, 0.0).alias("has_zero"),
    )


@query(
    "explode_outer_empty_arrays",
    oracle="""
    SELECT d.doc_id, u.long_word
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> len(w) > 10)
                     AS long_words
          FROM documents) d
    LEFT JOIN LATERAL (SELECT unnest(d.long_words) AS long_word) u ON TRUE
    """,
)
def explode_outer_empty_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` vs ``explode``: documents with NO long words
    (>10 chars) must still appear — once, with a NULL — instead of
    vanishing from the output.  Plain explode silently drops
    empty-array rows, which turns "tokens per document" reports into
    "tokens per document that had any" — a denominator bug.  Same
    Generate (outer) plan node, zero extra cost; the oracle is the
    LEFT JOIN LATERAL unnest formulation with identical keep-the-row
    semantics."""
    docs = load_table(spark, sf_dir, "documents")
    long_words = F.filter(
        F.split(F.col("text"), " "), lambda w: F.length(w) > 10
    )
    return docs.select(
        "doc_id", F.explode_outer(long_words).alias("long_word")
    )
