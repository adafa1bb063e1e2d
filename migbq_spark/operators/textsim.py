"""Array / text / similarity operators — SURVEY.md §2.G (driver-mandated
LLM-pipeline surface: dedup, similarity search, text analysis).

The documents fixture is space-separated word soup with a TRAILING SPACE,
so `split(text, ' ')` yields an empty final token on both engines — every
token pipeline here filters `token <> ''` on both sides.

Scale notes (100 TB):
- `dedup_hash_exact` is a plain hash-shuffle on md5(text) — linear scale.
- `near_dup_jaccard` blocks on `source` and self-joins within the block —
  correct at fixture scale; the 100 TB path is `dedup_minhash_lsh`
  (pipeline.py), which buckets by banded minhashes so candidate pairs
  ≪ n².
- `cosine_topk` broadcasts the 10 query vectors and streams candidates
  through a JVM-side zip_with/aggregate dot product (no Python, no
  explode blowup); the 100 TB path is `ann_ivf_topk` (pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.common import dec
from migbq_spark.registry import register


def _tokens(col: str = "text") -> F.Column:
    """Non-empty whitespace tokens (trailing-space fixture caveat)."""
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


@register(
    "arr_explode_tokens",
    oracle="""
    SELECT t AS token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> ''
    GROUP BY t
    """,
)
def arr_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + corpus token frequency."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@register(
    "arr_funcs",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
           len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_distinct,
           list_contains(string_split(text, ' '), 'query') AS has_query
    FROM documents
    """,
)
def arr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_distinct / array_contains over token arrays."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.array_contains(F.split("text", " "), "query").alias("has_query"),
    )


@register(
    "dedup_hash_exact",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
    FROM documents
    GROUP BY lang
    """,
)
def dedup_hash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via md5 content hash (both engines emit
    lowercase hex).  At scale: groupBy(hash) + keep-first — one linear
    shuffle; the count-distinct form here makes it oracle-checkable."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


@register(
    "near_dup_jaccard",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, source, t
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
              FROM documents)
        WHERE t <> ''
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
        FROM tok a JOIN tok b
          ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.a_id, s.b_id, s.shared, ca.n AS n_a, cb.n AS n_b,
           s.shared * 1.0 / (ca.n + cb.n - s.shared) AS jaccard
    FROM shared s
    JOIN cnt ca ON ca.doc_id = s.a_id
    JOIN cnt cb ON cb.doc_id = s.b_id
    WHERE s.shared * 1.0 / (ca.n + cb.n - s.shared) >= 0.8
    """,
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: Jaccard ≥ 0.8 over distinct token sets,
    blocked on `source`.  jaccard = shared/(|A|+|B|-shared) is integer
    math + one double division → bit-identical across engines.

    This is the exact small-scale path; `dedup_minhash_lsh` is the
    banded-LSH candidate generator for 100 TB (SURVEY §4.2)."""
    d = load(spark, sf_dir, "documents")
    # Pre-hash each distinct token to int64 ONCE per doc: the quadratic
    # stage then intersects sorted long arrays instead of string arrays
    # (~4× faster; 64-bit hashing of a word vocabulary is collision-free
    # for any realistic corpus, and the count math is unchanged).
    toks = d.select(
        "doc_id",
        "source",
        F.array_sort(
            F.transform(F.array_distinct(_tokens()), lambda t: F.xxhash64(t))
        ).alias("toks"),
        F.size(F.array_distinct(_tokens())).cast("bigint").alias("n"),
    )
    # The fixture arrives as ONE parquet file → one input partition; the
    # quadratic intersect stage must not inherit that.  Hash-repartition
    # the probe side on a_id so every core gets a slice (the build side
    # broadcasts; at 100 TB the same line just moves more partitions).
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)
    a = toks.repartition(n_part, "doc_id").select(
        F.col("doc_id").alias("a_id"), F.col("source").alias("source"),
        F.col("toks").alias("a_toks"), F.col("n").alias("n_a"),
    )
    b = toks.select(
        F.col("doc_id").alias("b_id"), F.col("source").alias("b_source"),
        F.col("toks").alias("b_toks"), F.col("n").alias("n_b"),
    )
    # Join strategy stays with Catalyst/AQE: at fixture scale the build
    # side broadcasts; past the broadcast threshold it becomes a shuffled
    # join on source (and past THAT, dedup_minhash_lsh is the answer).
    pairs = a.join(
        b,
        (F.col("source") == F.col("b_source")) & (F.col("a_id") < F.col("b_id")),
    )
    shared_pairs = pairs.select(
        "a_id",
        "b_id",
        "n_a",
        "n_b",
        F.size(F.array_intersect("a_toks", "b_toks")).cast("bigint").alias("shared"),
    )
    jac = F.col("shared") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared_pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("a_id", "b_id", "shared", "n_a", "n_b", "jaccard")
    )


@register(
    "cosine_topk",
    oracle="""
    WITH qv AS (
        SELECT vec_id AS q_id, u.v AS qval, u.p AS pos
        FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                                         generate_subscripts(embedding, 1) AS p) u
        WHERE vec_id < 10
    ),
    cv AS (
        SELECT vec_id AS n_id, u.v AS cval, u.p AS pos
        FROM embeddings, LATERAL (SELECT unnest(embedding) AS v,
                                         generate_subscripts(embedding, 1) AS p) u
    ),
    sims AS (
        SELECT qv.q_id, cv.n_id,
               ROUND(SUM(CAST(qv.qval AS DOUBLE) * CAST(cv.cval AS DOUBLE)), 4) AS sim
        FROM qv JOIN cv ON qv.pos = cv.pos
        WHERE qv.q_id <> cv.n_id
        GROUP BY qv.q_id, cv.n_id
    )
    SELECT q_id, n_id, sim, rnk
    FROM (SELECT q_id, n_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY sim DESC, n_id) AS rnk
          FROM sims)
    WHERE rnk <= 5
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: top-5 neighbors by cosine (≡ dot product —
    embeddings are L2-normalized) for query vectors vec_id < 10.

    Spark-first: the 10 query vectors are broadcast and every candidate
    computes the dot product JVM-side with zip_with + aggregate (no
    Python UDF, no 64× posexplode blowup).  Ranking orders by the
    ROUNDED similarity (4 dp, float32 inputs) with vec_id tiebreak so
    both engines cut the same top-5 even when raw doubles differ in the
    last ulp.  100 TB path: `ann_ivf_topk`."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("c_emb"))
    dot = F.aggregate(
        F.zip_with(
            "q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(dot, 4).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "n_id", "sim", "rnk")
    )


@register(
    "text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_chars,
           SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END) AS n_len_valid,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text profiling per lang: doc counts, avg chars (decimal-exact sum →
    IEEE division), the n_chars==length(text) validation fixture, and
    source fan-out."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(dec("n_chars")).cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.sum(
            F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0)
        ).alias("n_len_valid"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "multimodal_struct",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    """,
)
def multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack document fields into a STRUCT carrier column (the multimodal
    column pattern: payload + typed metadata travel together), then
    project back out — the oracle sees only the flattened projection."""
    d = load(spark, sf_dir, "documents")
    packed = d.select(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            F.col("source"),
            F.col("n_chars"),
        ).alias("doc")
    )
    return packed.select("doc.doc_id", "doc.lang", "doc.source", "doc.n_chars")


@register("map_funcs")  # rows-only: MAP value hashing across engines unreliable
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build MAP<lang, count> per source + element_at lookups."""
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_lang.groupBy("source")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("lang", "cnt")))
            ).alias("lang_counts")
        )
        .select(
            "source",
            F.map_keys("lang_counts").alias("langs"),
            F.element_at("lang_counts", "en").alias("en_count"),
            F.size(F.col("lang_counts")).alias("n_langs"),
        )
    )
