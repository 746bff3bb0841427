"""Driver-contract queries: one entry per operator family (SURVEY.md §2)
with an exact DuckDB oracle where ANSI SQL can express the semantics.

Conventions for oracle parity:
  * every aggregate/computed column is aliased identically on both sides
  * doubles are round(_, 6) on both sides (float-sum order differs
    between engines at ~1e-15; rounding absorbs it)
  * DuckDB integer sums are ::BIGINT (DuckDB sums to HUGEINT, Spark to
    long); Spark size() is cast to long (Spark size() is int)
  * all hashes derive from md5 (bit-identical in Spark, DuckDB, Python)
  * tokenization used in SQL-parity queries is the O8 normalizer WITHOUT
    stemming (Porter isn't SQL-expressible; stemmed paths are covered by
    the rows-only queries + the pytest oracle suite)

Rows-only queries (driver records row-count/schema only): the full
north-rule pipeline (build + BM25/WAND over the synthetic corpus), whose
ground truth is the pure-Python oracle exercised in tests/.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

_NORM_RE = "[^a-z0-9\\s]"

SQL_TOKS = """
toks AS (
    SELECT doc_id,
           unnest(string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+')) AS term
    FROM documents
),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')
"""


def _tokens(df: DataFrame) -> DataFrame:
    """O8+O9 without stemming: punctuation -> space, lower, split."""
    return (
        df.select(
            "doc_id",
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_RE, " ")),
                    r"\s+",
                )
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _hash64(col, salt: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(salt) + "|"), col)), 1, 15), 16, 10
    ).cast("long")


def _sql_hash64(expr: str, salt: int) -> str:
    return f"(('0x' || substr(md5(concat('{salt}|', {expr})), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# O1/O3: scan + projection + predicate
# ---------------------------------------------------------------------------

def q_scan_filter(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .filter((F.col("n_chars") > 200) & (F.col("lang") == "en"))
        .select("doc_id", "lang", "n_chars")
    )


SQL_SCAN_FILTER = """
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars > 200 AND lang = 'en'
"""

# ---------------------------------------------------------------------------
# O2/O3: url defrag + validity (urls synthesized deterministically —
# the testdata documents table has no url column)
# ---------------------------------------------------------------------------

def q_url_defrag_valid(spark, sf_dir):
    from .functions.udfs import url_parts_udf
    from .text.normalize import EXT_BLACKLIST_PATTERN

    df = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://ex.edu/p/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 20 == 0, ".pdf").otherwise(".html"),
            F.when(F.col("doc_id") % 7 == 0, "#frag").otherwise(""),
        ).alias("raw_url"),
    )
    p = df.withColumn("_p", url_parts_udf(F.col("raw_url")))
    return (
        p.filter(~F.col("_p.path").rlike("^" + EXT_BLACKLIST_PATTERN))
        .select("doc_id", F.col("_p.url").alias("url"))
    )


SQL_URL_DEFRAG_VALID = """
WITH u AS (
    SELECT doc_id,
           concat('https://ex.edu/p/', doc_id,
                  CASE WHEN doc_id % 20 = 0 THEN '.pdf' ELSE '.html' END,
                  CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS raw_url
    FROM documents
)
SELECT doc_id, regexp_replace(raw_url, '#.*$', '') AS url
FROM u
WHERE doc_id % 20 <> 0
"""

# ---------------------------------------------------------------------------
# O4/O5: dedup first-occurrence + window
# ---------------------------------------------------------------------------

def q_dedup_first(spark, sf_dir):
    df = _docs(spark, sf_dir).withColumn("grp", F.col("n_chars") % 50)
    w = Window.partitionBy("grp").orderBy(F.col("doc_id").asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("grp", F.col("doc_id").alias("first_doc_id"))
    )


SQL_DEDUP_FIRST = """
SELECT grp, doc_id AS first_doc_id FROM (
    SELECT n_chars % 50 AS grp, doc_id,
           row_number() OVER (PARTITION BY n_chars % 50 ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# O8/O9/O12: tokenize + per-(term,doc) aggregation (postings)
# ---------------------------------------------------------------------------

def q_postings(spark, sf_dir):
    return (
        _tokens(_docs(spark, sf_dir))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


SQL_POSTINGS = f"""
WITH {SQL_TOKS}
SELECT term, doc_id, count(*)::BIGINT AS tf
FROM toks2 GROUP BY term, doc_id
"""

# ---------------------------------------------------------------------------
# O11: token validity rules (reference indexer.py:109-124)
# ---------------------------------------------------------------------------

def q_token_filter(spark, sf_dir):
    toks = _tokens(_docs(spark, sf_dir)).select("term").distinct()
    valid = (
        ~F.col("term").rlike("^(ensm|ensg)")
        & (~F.col("term").rlike("^[0-9]+$") | (F.length("term") <= 4))
        & ~(
            F.col("term").rlike("^[0-9e./-]+$")
            & F.col("term").rlike("[0-9]")
            & F.col("term").rlike("[e./-]")
        )
    )
    return toks.select("term", valid.alias("is_valid")).groupBy("is_valid").agg(
        F.count("*").cast("long").alias("n_terms")
    )


SQL_TOKEN_FILTER = f"""
WITH {SQL_TOKS},
d AS (SELECT DISTINCT term FROM toks2),
v AS (
    SELECT term,
           (NOT regexp_matches(term, '^(ensm|ensg)'))
           AND ((NOT regexp_matches(term, '^[0-9]+$')) OR length(term) <= 4)
           AND (NOT (regexp_matches(term, '^[0-9e./-]+$')
                     AND regexp_matches(term, '[0-9]')
                     AND regexp_matches(term, '[e./-]'))) AS is_valid
    FROM d
)
SELECT is_valid, count(*)::BIGINT AS n_terms FROM v GROUP BY is_valid
"""

# ---------------------------------------------------------------------------
# O21: dictionary (df/cf) + corpus stats
# ---------------------------------------------------------------------------

def q_dictionary(spark, sf_dir):
    return (
        _tokens(_docs(spark, sf_dir))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("cf"),
        )
    )


SQL_DICTIONARY = f"""
WITH {SQL_TOKS}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks2 GROUP BY term
"""


def q_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    return toks.agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.round(F.count("*") / F.lit(float(n_docs)), 6).alias("avgdl"),
        F.countDistinct("term").cast("long").alias("n_terms"),
    )


SQL_STATS = f"""
WITH {SQL_TOKS}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       round(count(*) / (SELECT count(*) FROM documents)::DOUBLE, 6) AS avgdl,
       count(DISTINCT term)::BIGINT AS n_terms
FROM toks2
"""

# ---------------------------------------------------------------------------
# O24-O26, O29: BM25 top-k (the SQL-expressible flagship) + boolean AND
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("data", "query", "scan")
K1, B = 1.2, 0.75


def q_bm25_topk(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    total_tokens = toks.count()
    avgdl = total_tokens / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))

    terms = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    )
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score")
    )
    # orderBy().limit(k) = TakeOrderedAndProject (per-partition heap +
    # driver merge); the window rank then runs over <= 10 rows, never the
    # full scored set (mirrors plans/query.py:104-113)
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_BM25_TOPK = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(BM25_QUERY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6) AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores
ORDER BY rank
LIMIT 10
"""


def q_weighted_topk(spark, sf_dir):
    """O26 as the reference actually ranks: BM25 x tag-importance.  The
    testdata documents table has no HTML zones, so the zone scheme is
    positional and SQL-expressible: the first 8 tokens of a document are
    its 'title zone' (weight 20), the rest default weight 10;
    imp(term, doc) = max zone weight over occurrences (indexer.py:
    197-201 semantics), contribution = idf * w * (imp/10)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_RE, " ")),
                r"\s+",
            )
        ).alias("pos", "term"),
    ).filter(F.col("term") != "")
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.max(F.when(F.col("pos") < 8, 20).otherwise(10)).alias("imp"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))

    terms = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    )
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w * (F.col("imp") / F.lit(10.0))), 6).alias("score")
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_WEIGHTED_TOPK = f"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+') AS _t
    FROM documents
),
toksp AS (
    SELECT doc_id, _t[i + 1] AS term, i AS pos
    FROM t, unnest(range(0, len(_t))) AS u(i)
    WHERE _t[i + 1] <> ''
),
postings AS (
    SELECT term, doc_id, count(*)::BIGINT AS tf,
           max(CASE WHEN pos < 8 THEN 20 ELSE 10 END) AS imp
    FROM toksp GROUP BY 1, 2
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toksp GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toksp)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(BM25_QUERY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))
                 * (p.imp / 10.0)), 6) AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores
ORDER BY rank
LIMIT 10
"""


def q_boolean_and(spark, sf_dir):
    toks = _tokens(_docs(spark, sf_dir)).select("term", "doc_id").distinct()
    terms = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    return (
        toks.join(F.broadcast(terms), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(BM25_QUERY_TERMS))
        .select("doc_id")
    )


SQL_BOOLEAN_AND = f"""
WITH {SQL_TOKS},
m AS (SELECT DISTINCT term, doc_id FROM toks2
      WHERE term IN {tuple(BM25_QUERY_TERMS)!r})
SELECT doc_id FROM m GROUP BY doc_id
HAVING count(*) = {len(BM25_QUERY_TERMS)}
"""

# ---------------------------------------------------------------------------
# O29: window top-k per group
# ---------------------------------------------------------------------------

def q_topk_per_lang(spark, sf_dir):
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        _docs(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "doc_id", "n_chars")
    )


SQL_TOPK_PER_LANG = """
SELECT lang, rank, doc_id, n_chars FROM (
    SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
    FROM documents
) WHERE rank <= 3
"""

# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_exact_dups(spark, sf_dir):
    from .operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir), "doc_id", "text").select(
        "text_hash", F.col("dup_count").cast("long").alias("dup_count"),
        "min_id")


SQL_EXACT_DUPS = """
SELECT md5(text) AS text_hash, count(*)::BIGINT AS dup_count,
       min(doc_id) AS min_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""


JACCARD_DF_CAP = 400    # shingles in > half of the 800 docs are boilerplate


def q_ngram_jaccard_dups(spark, sf_dir):
    from .operators.dedup import ngram_jaccard_pairs

    df = _docs(spark, sf_dir).filter(F.col("doc_id") < 800)
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.2,
                                max_shingle_df=JACCARD_DF_CAP)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# shared by q12 (the pair stream itself) and q36 (connected components
# over it) — one definition so the two queries can't drift apart
_NGRAM_PAIR_CTES = f"""
d AS (SELECT doc_id, text FROM documents WHERE doc_id < 800),
t AS (SELECT doc_id AS _id, string_split_regex(lower(text), '\\s+') AS _t FROM d),
sh0 AS (
    SELECT DISTINCT _id,
           concat_ws(' ', _t[i + 1], _t[i + 2]) AS shingle
    FROM t, unnest(range(0, greatest(len(_t) - 1, 0))) AS u(i)
),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle
         HAVING count(*) <= {JACCARD_DF_CAP}),
sh AS (SELECT sh0._id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
sz AS (SELECT _id, count(*)::BIGINT AS sz FROM sh GROUP BY _id),
inter AS (
    SELECT a._id AS id_a, b._id AS id_b, count(*)::BIGINT AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a._id < b._id
    GROUP BY a._id, b._id
),
pairs AS (
    SELECT i.id_a, i.id_b,
           round(i.inter / (sa.sz + sb.sz - i.inter)::DOUBLE, 6) AS jaccard
    FROM inter i
    JOIN sz sa ON i.id_a = sa._id
    JOIN sz sb ON i.id_b = sb._id
    WHERE i.inter / (sa.sz + sb.sz - i.inter)::DOUBLE >= 0.2
)"""

SQL_NGRAM_JACCARD = f"""
WITH {_NGRAM_PAIR_CTES}
SELECT id_a, id_b, jaccard FROM pairs
"""


def q_minhash_signatures(spark, sf_dir):
    from .operators.dedup import _shingles, minhash_lane_exprs

    df = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    sh = _shingles(df, "doc_id", "text", 3, distinct=False)
    aggs = [F.min(lane).alias(f"h{h}") for h, lane in
            enumerate(minhash_lane_exprs(F.col("shingle"), 8))]
    return sh.groupBy(F.col("_id").alias("id")).agg(*aggs)


def _sql_minhash() -> str:
    from .operators.dedup import minhash_lane_sql

    mins = ",\n       ".join(
        f"min({lane}) AS h{h}"
        for h, lane in enumerate(minhash_lane_sql("shingle", 8)))
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
t AS (SELECT doc_id AS _id, string_split_regex(lower(text), '\\s+') AS _t FROM d),
sh AS (
    SELECT _id,
           concat_ws(' ', _t[i + 1], _t[i + 2], _t[i + 3]) AS shingle
    FROM t, unnest(range(0, greatest(len(_t) - 2, 0))) AS u(i)
)
SELECT _id AS id,
       {mins}
FROM sh GROUP BY _id
"""


def q_simhash(spark, sf_dir):
    from .operators.dedup import simhash_64

    return simhash_64(_docs(spark, sf_dir).filter(F.col("doc_id") < 1000),
                      "doc_id", "text", n_bits=16)


def _sql_simhash(n_bits: int = 16) -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS b{b}"
        for b in range(n_bits))
    recon = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits))
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
toks AS (SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM d),
t2 AS (SELECT id, {_sql_hash64('tok', 0)} AS h FROM toks WHERE tok <> ''),
votes AS (SELECT id, {votes} FROM t2 GROUP BY id)
SELECT id, ({recon})::BIGINT AS simhash FROM votes
"""

# ---------------------------------------------------------------------------
# similarity search family
# ---------------------------------------------------------------------------

def q_knn_bruteforce(spark, sf_dir):
    from .operators.similarity import cosine_topk_bruteforce

    emb = _embs(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    top = cosine_topk_bruteforce(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        [float(x) for x in qvec], k=10)
    w = Window.orderBy(F.col("cosine").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("id"), F.round("cosine", 6).alias("cosine"))


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (
    SELECT e.vec_id AS id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> 0
)
SELECT row_number() OVER (ORDER BY cosine DESC, id ASC)::BIGINT AS rank,
       id, cosine
FROM s ORDER BY rank LIMIT 10
"""


def q_knn_lsh(spark, sf_dir):
    """The ANN scale path (hyperplane-LSH bucket pruning + multi-probe)
    under a HARD oracle (round-2 VERDICT item 3): DuckDB recomputes each
    vector's bucket from the same seeded hyperplanes (identical double
    literals, same left-associated sum order as the Spark fold), applies
    the same hamming<=1 probe restriction, and ranks exact cosine over
    the identical candidate set — so the bucket computation, the probe
    pruning, and the candidate scoring are all hash-checked, not just
    recall-tested."""
    from .operators.similarity import lsh_bucketed_topk

    emb = _embs(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    top = lsh_bucketed_topk(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        [float(x) for x in qvec], k=10, n_planes=4, seed=42)
    w = Window.orderBy(F.col("cosine").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("id"), F.round("cosine", 6).alias("cosine"))


def _sql_knn_lsh(n_planes: int = 4, dim: int = 64, seed: int = 42) -> str:
    """DuckDB twin of q_knn_lsh: buckets from the same seeded
    hyperplanes as literal doubles, left-associated products so the
    fold order matches operators/similarity._bucket_expr."""
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)

    def dot(p):
        return " + ".join(f"({float(w)!r} * v[{i + 1}])"
                          for i, w in enumerate(p))

    bucket = " + ".join(
        f"(CASE WHEN ({dot(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
q AS (SELECT bucket AS qb, v AS qv FROM b WHERE vec_id = 0),
cand AS (
    SELECT b.vec_id, b.v FROM b, q
    WHERE b.vec_id <> 0
      AND bit_count(xor(b.bucket::BIGINT, q.qb::BIGINT)) <= 1
),
s AS (SELECT vec_id AS id,
             round(list_cosine_similarity(v, qv), 6) AS cosine
      FROM cand, q)
SELECT row_number() OVER (ORDER BY cosine DESC, id ASC)::BIGINT AS rank,
       id, cosine
FROM s ORDER BY rank LIMIT 10
"""


IVF_K, IVF_PROBE, IVF_SEED = 8, 2, 7


def q_ivf_topk(spark, sf_dir):
    """IVF ANN top-k under a hard oracle: DuckDB recomputes every
    vector's inverted-list assignment from the same seeded anchor
    literals (first-index-wins argmax, left-associated sums), ranks the
    query's anchors the same way, restricts to the same n_probe lists,
    and ranks exact cosine over the identical candidate set — the IVF
    probe machinery itself is hash-checked (q30's pattern for the
    hamming-probe LSH path, applied to dot-product probing)."""
    from .operators.similarity import ivf_topk

    emb = _embs(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    top = ivf_topk(emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
                   [float(x) for x in qvec], k=10, n_centroids=IVF_K,
                   n_probe=IVF_PROBE, seed=IVF_SEED)
    w = Window.orderBy(F.col("cosine").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("id"), F.round("cosine", 6).alias("cosine"))


def _sql_ivf_topk(k: int = IVF_K, n_probe: int = IVF_PROBE, dim: int = 64,
                  seed: int = IVF_SEED) -> str:
    from .operators.similarity import random_anchors

    C = random_anchors(dim, k, seed)

    def dot(c):
        return " + ".join(f"({float(w)!r} * v[{i + 1}])"
                          for i, w in enumerate(c))

    dots = ",\n       ".join(f"({dot(c)}) AS d{j}" for j, c in enumerate(C))
    names = ", ".join(f"d{j}" for j in range(k))
    bucket = ("CASE " + " ".join(
        f"WHEN d{j} = greatest({names}) THEN {j}" for j in range(k))
        + " END")
    probe_rank = ("CASE i " + " ".join(
        f"WHEN {j} THEN qd.d{j}" for j in range(k)) + " END")
    vals = ", ".join(f"({j})" for j in range(k))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT vec_id, v,
       {dots}
      FROM e),
b AS (SELECT vec_id, v, ({bucket}) AS bucket FROM d),
qd AS (SELECT {names} FROM d WHERE vec_id = 0),
probes AS (
    SELECT i FROM (VALUES {vals}) t(i), qd
    ORDER BY {probe_rank} DESC, i ASC LIMIT {n_probe}
),
qv AS (SELECT v FROM e WHERE vec_id = 0),
cand AS (
    SELECT b.vec_id, b.v FROM b
    WHERE b.vec_id <> 0 AND b.bucket IN (SELECT i FROM probes)
),
s AS (SELECT c.vec_id AS id,
             round(list_cosine_similarity(c.v, qv.v), 6) AS cosine
      FROM cand c, qv)
SELECT row_number() OVER (ORDER BY cosine DESC, id ASC)::BIGINT AS rank,
       id, cosine
FROM s ORDER BY rank LIMIT 10
"""


def q_embedding_dups(spark, sf_dir):
    """Graded on the SCALE path: OR-amplified multi-table LSH candidate
    join + exact-cosine verify, hash-checked against DuckDB's exhaustive
    all-pairs — i.e. the oracle proves the LSH path achieves full recall
    on this data (32 tables x 4 planes -> ~0.999 recall at cosine 0.5;
    deterministic here because hyperplanes are seeded).  The O(n^2)
    exact=True variant is pytest-only (test_pipeline_ops)."""
    from .operators.similarity import embedding_dup_pairs

    emb = _embs(spark, sf_dir).filter(F.col("vec_id") < 500)
    pairs = embedding_dup_pairs(emb, "vec_id", "embedding",
                                threshold=0.5, exact=False,
                                n_planes=4, tables=32)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


SQL_EMBEDDING_DUPS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 500)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.5
"""

# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------

def q_langid(spark, sf_dir):
    from .operators.textstats import language_id

    return language_id(_docs(spark, sf_dir), "doc_id", "text").select(
        "id", *[F.col(f"{l}_hits").cast("long").alias(f"{l}_hits")
                for l in ("en", "es", "de", "fr")],
        "lang_pred")


def _sql_langid() -> str:
    from .operators.textstats import LANG_MARKERS

    hits = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hits.append(
            f"len(list_filter(_t, t -> list_contains([{lst}], t)))::BIGINT"
            f" AS {lang}_hits")
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join(l + '_hits' for l in langs)})"
    pred = "CASE " + " ".join(
        f"WHEN {l}_hits = {best} THEN '{l}'" for l in langs) + " END"
    return f"""
WITH t AS (
    SELECT doc_id AS id, string_split_regex(lower(text), '\\s+') AS _t
    FROM documents
),
h AS (SELECT id, {', '.join(hits)} FROM t)
SELECT id, en_hits, es_hits, de_hits, fr_hits, {pred} AS lang_pred FROM h
"""


def q_quality(spark, sf_dir):
    from .operators.textstats import quality_score

    out = quality_score(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        "id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        "quality")


def _sql_quality() -> str:
    from .operators.textstats import STOPWORDS_EN

    sw = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH t AS (
    SELECT doc_id AS id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS _t,
           length(text) AS _chars,
           len(regexp_extract_all(text, '[0-9]'))::BIGINT AS _digits
    FROM documents
),
m AS (
    SELECT id, len(_t)::BIGINT AS n_tokens,
           CASE WHEN len(_t) > 0 THEN
               list_sum(list_transform(_t, x -> length(x)))::DOUBLE / len(_t)
           ELSE 0.0 END AS avg_token_len,
           CASE WHEN len(_t) > 0 THEN
               len(list_filter(_t, x -> list_contains([{sw}], x)))::DOUBLE / len(_t)
           ELSE 0.0 END AS stopword_ratio,
           CASE WHEN _chars > 0 THEN _digits::DOUBLE / _chars ELSE 0.0 END AS digit_ratio
    FROM t
)
SELECT id, n_tokens, round(avg_token_len, 6) AS avg_token_len,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(digit_ratio, 6) AS digit_ratio,
       round(least(n_tokens::DOUBLE / 64.0, 1.0)
             * least(stopword_ratio * 4.0, 1.0)
             * (1.0 - least(digit_ratio * 2.0, 1.0)), 6) AS quality
FROM m
"""


def q_token_counts(spark, sf_dir):
    from .operators.textstats import token_counts

    out = token_counts(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        "id", F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_ish_tokens").cast("long").alias("bpe_ish_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"))


SQL_TOKEN_COUNTS = """
SELECT doc_id AS id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_ish_tokens,
       length(text)::BIGINT AS n_chars
FROM documents
"""


def q_fingerprint(spark, sf_dir):
    from .operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir), "doc_id", "text", k=4)


SQL_FINGERPRINT = f"""
WITH t AS (
    SELECT doc_id AS id,
           list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '')) AS _t
    FROM documents
)
SELECT id,
       array_to_string(
           list_transform(
               list_sort(list_transform(
                   _t, x -> (('0x' || substr(md5(x), 1, 15))::BIGINT)))[1:4],
               h -> h::VARCHAR),
           '-') AS fp
FROM t
"""

# ---------------------------------------------------------------------------
# multimodal plumbing (binary columns)
# ---------------------------------------------------------------------------

def q_media_meta(spark, sf_dir):
    from .operators.multimodal import attach_fake_media

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    return media.select(
        "id", F.octet_length("media").cast("long").alias("n_bytes"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"))


SQL_MEDIA_META = """
SELECT doc_id AS id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
       (octet_length(encode(text)) % 480 + 1)::BIGINT AS height
FROM documents
"""


def q_media_features(spark, sf_dir):
    from .operators.multimodal import attach_fake_media, extract_media_features

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    return extract_media_features(media).select("id", "n_bytes", "content_hash")


SQL_MEDIA_FEATURES = """
SELECT doc_id AS id, octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_hash
FROM documents
"""

# ---------------------------------------------------------------------------
# north-rule pipeline (rows-only: Porter stemming + compressed-index WAND
# are not SQL-expressible; ground truth is the pytest oracle suite)
# ---------------------------------------------------------------------------

_CORPUS_CACHE: dict = {}


def _built_corpus(spark, n_docs: int = 240):
    # applicationId, not id(spark): a stopped session's id() can be
    # reused by a new one, which would silently serve persisted frames
    # bound to a dead context (round-2 ADVICE)
    key = (spark.sparkContext.applicationId, n_docs)
    if key not in _CORPUS_CACHE:
        from .config import small_scale
        from .corpusgen import make_corpus
        from .operators.compress import build_compressed_index
        from .plans.build import build_tables
        from .schemas import DOCUMENTS

        cfg = small_scale()
        docs_df = spark.createDataFrame(make_corpus(n_docs), DOCUMENTS)
        built = build_tables(docs_df)
        index = build_compressed_index(
            built.postings, built.avgdl, cfg.bm25, cfg.index).persist()
        index.count()
        _CORPUS_CACHE[key] = (built, index, cfg)
    return _CORPUS_CACHE[key]


def q_wand_search(spark, sf_dir):
    from .operators.topk import wand_topk

    built, index, cfg = _built_corpus(spark)
    return wand_topk(index, built.dictionary, built.docs,
                     "machine learning", built.n_docs, built.avgdl, k=10)


def q_wand_vs_exhaustive(spark, sf_dir):
    """Self-verifying: rows where the WAND path and the exhaustive BM25
    path disagree on the top-k SET or on scores beyond 1e-9 for the
    reference query set.  An EMPTY result is the passing state.

    Compared on (doc_id membership, |score delta|), not exact rank: the
    exhaustive path's distributed F.sum adds float contributions in
    shuffle order, so an exact-tie rank could flap by 1 ulp across runs
    (ADVICE.md); the WAND path's bincount order is fixed.  Same-set plus
    score agreement to 1e-9 is the flap-proof equivalent check."""
    from .operators.topk import wand_topk
    from .plans.query import bm25_topk_exhaustive

    built, index, cfg = _built_corpus(spark)
    out = None
    for qtext in ("cristina lopes", "machine learning", "ACM",
                  "master of software engineering"):
        a = wand_topk(index, built.dictionary, built.docs, qtext,
                      built.n_docs, built.avgdl, k=10).select(
            F.lit(qtext).alias("query"), "doc_id",
            F.col("score").alias("score_wand"))
        b = bm25_topk_exhaustive(built.postings, built.dictionary, built.docs,
                                 qtext, built.n_docs, built.avgdl, k=10).select(
            F.lit(qtext).alias("query"), "doc_id",
            F.col("score").alias("score_ex"))
        diff = (
            a.join(b, ["query", "doc_id"], "full_outer")
            .filter(
                F.col("score_wand").isNull()
                | F.col("score_ex").isNull()
                | (F.abs(F.col("score_wand") - F.col("score_ex")) > 1e-9)
            )
            .select("query", "doc_id")
        )
        out = diff if out is None else out.unionAll(diff)
    return out


# q24 is a self-verifying invariant: its PASSING state is the empty
# frame (rows where WAND and exhaustive BM25 disagree).  The oracle twin
# states that contract as SQL — zero rows with the same schema — so the
# driver record carries a hard rows+schema+hash row instead of a
# perpetual `no_oracle` entry (VERDICT r4 item 1).
SQL_WAND_VS_EXHAUSTIVE_EMPTY = """
SELECT CAST(NULL AS VARCHAR) AS query, CAST(NULL AS BIGINT) AS doc_id
WHERE 1 = 0
"""


_UNSTEMMED_CACHE: dict = {}


def _unstemmed_index(spark, sf_dir):
    """Compressed block-max index over the testdata documents table with
    the O8 tokenizer and NO stemming — every piece of the scale path
    (salted encode, delta+varbyte, sharding, WAND) becomes fully
    ANSI-SQL-expressible, so the driver's DuckDB gate can hash-check it
    (VERDICT r1 item 2: previously the hard oracle never touched the
    compressed index)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _UNSTEMMED_CACHE:
        from .config import IndexConfig
        from .operators.compress import build_compressed_index

        docs = _docs(spark, sf_dir)
        toks = _tokens(docs)
        postings = (
            toks.groupBy("term", "doc_id")
            .agg(F.count("*").cast("int").alias("tf"))
            .withColumn("imp", F.lit(10).cast("int"))
        )
        dl = toks.groupBy("doc_id").agg(F.count("*").cast("int").alias("dl"))
        postings = postings.join(dl, "doc_id").select(
            "term", "doc_id", "tf", "imp", "dl")
        n_docs = docs.count()
        avgdl = toks.count() / n_docs
        cfg = IndexConfig(shard_size=512, block_size=64, chunk_blocks=32,
                          salt_buckets=4, term_buckets=8)
        index = build_compressed_index(postings, avgdl, cfg=cfg).persist()
        index.count()
        dictionary = postings.groupBy("term").agg(
            F.count("*").alias("df")).persist()
        docs_dim = docs.select(
            "doc_id", F.col("doc_id").cast("string").alias("url"))
        _UNSTEMMED_CACHE[key] = (index, dictionary, docs_dim, n_docs, avgdl)
    return _UNSTEMMED_CACHE[key]


def q_wand_unstemmed(spark, sf_dir):
    """Block-max WAND top-10 over the compressed unstemmed index;
    DuckDB recomputes the identical BM25 exhaustively (the WAND pruning
    must be score-lossless)."""
    from .operators.topk import wand_topk

    index, dictionary, docs_dim, n_docs, avgdl = _unstemmed_index(spark, sf_dir)
    out = wand_topk(index, dictionary, docs_dim, " ".join(BM25_QUERY_TERMS),
                    n_docs, avgdl, k=10,
                    pre_parsed=(list(BM25_QUERY_TERMS), False))
    return out.select(
        F.col("rank").cast("long").alias("rank"), "doc_id",
        F.round("score", 6).alias("score"))


# Ranks on the UNROUNDED score (as WAND does natively); round(_, 6) only
# in the output projection.  SQL_BM25_TOPK instead rounds before ranking
# because its Spark twin q08 does too.
SQL_WAND_UNSTEMMED = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(BM25_QUERY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))) AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, round(score, 6) AS score
FROM scores
ORDER BY rank
LIMIT 10
"""


def q_wand_boolean(spark, sf_dir):
    """Boolean-AND mode through the SAME compressed-index WAND scorer
    (pruning disabled, all-terms candidate filter — operators/topk.py),
    hash-checked against DuckDB computing BM25 over the intersection."""
    from .operators.topk import wand_topk

    index, dictionary, docs_dim, n_docs, avgdl = _unstemmed_index(spark, sf_dir)
    out = wand_topk(index, dictionary, docs_dim, " AND ".join(BM25_QUERY_TERMS),
                    n_docs, avgdl, k=10,
                    pre_parsed=(list(BM25_QUERY_TERMS), True))
    return out.select(
        F.col("rank").cast("long").alias("rank"), "doc_id",
        F.round("score", 6).alias("score"))


SQL_WAND_BOOLEAN = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(BM25_QUERY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))) AS score,
           count(*) AS nt
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, round(score, 6) AS score
FROM scores
WHERE nt = {len(BM25_QUERY_TERMS)}
ORDER BY rank
LIMIT 10
"""


def q_wand_batch(spark, sf_dir):
    """A 3-query WORKLOAD (plain OR, boolean AND, duplicate-term) through
    wand_topk_batch — ONE term-filtered index scan + one shard-scoring
    job for all queries (operators/topk.py) — hash-checked against DuckDB
    recomputing every query exhaustively and ranking per query_id."""
    from .operators.topk import wand_topk_batch

    index, dictionary, docs_dim, n_docs, avgdl = _unstemmed_index(spark, sf_dir)
    pre = {
        "or3": (list(BM25_QUERY_TERMS), False),
        "and3": (list(BM25_QUERY_TERMS), True),
        "dup": (["data", "data", "query"], False),
    }
    out = wand_topk_batch(index, dictionary, docs_dim,
                          {qid: "" for qid in pre}, n_docs, avgdl, k=10,
                          pre_parsed=pre)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id",
        F.round("score", 6).alias("score"))


SQL_WAND_BATCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
qterms AS (SELECT * FROM (VALUES
    ('or3', 'data', 1, false), ('or3', 'query', 1, false), ('or3', 'scan', 1, false),
    ('and3', 'data', 1, true), ('and3', 'query', 1, true), ('and3', 'scan', 1, true),
    ('dup', 'data', 2, false), ('dup', 'query', 1, false)
) AS t(query_id, term, mult, is_bool)),
q AS (
    SELECT qt.query_id, qt.term, qt.mult, qt.is_bool,
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM qterms qt JOIN dict d ON qt.term = d.term CROSS JOIN consts c
),
nreq AS (SELECT query_id, count(*) AS n FROM q GROUP BY 1),
scores AS (
    SELECT q.query_id, p.doc_id, bool_or(q.is_bool) AS is_bool,
           sum((q.mult * q.idf) * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))) AS score,
           count(*) AS nt
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY 1, 2
),
ranked AS (
    SELECT s.query_id, s.doc_id, s.score,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY s.score DESC, s.doc_id ASC) AS rank
    FROM scores s JOIN nreq ON s.query_id = nreq.query_id
    WHERE (NOT s.is_bool) OR s.nt = nreq.n
)
SELECT query_id, rank::BIGINT AS rank, doc_id, round(score, 6) AS score
FROM ranked
WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_extract_invariant(spark, sf_dir):
    """Self-verifying per-row invariant: rows where the Arrow-batched
    extraction UDF's text differs from the corpus `text` column (itself
    the oracle extractor's output).  Empty = byte-identity holds."""
    from .corpusgen import make_corpus
    from .functions.udfs import extract_text_udf
    from .schemas import DOCUMENTS

    docs_df = spark.createDataFrame(make_corpus(240), DOCUMENTS)
    return (
        docs_df.select("url", extract_text_udf("html").alias("got"), "text")
        .filter(F.col("got") != F.col("text"))
        .select("url")
    )


# q25's passing state is likewise the empty frame (urls where the Arrow
# extraction UDF diverges from the oracle extractor's text column).
SQL_EXTRACT_INVARIANT_EMPTY = """
SELECT CAST(NULL AS VARCHAR) AS url WHERE 1 = 0
"""


# ---------------------------------------------------------------------------
# event / relational analytics (engine extension over the driver's
# events + TPC-H-ish tables — the reference has no such surface;
# these close the "testdata relational tables unread" gap)
# ---------------------------------------------------------------------------

def q_events_window(spark, sf_dir):
    """Tumbling 1-hour rollup per event type (O-windowed-agg shape a
    log pipeline runs; same logical plan Structured Streaming executes
    incrementally in streaming/windows.py)."""
    from .operators.events import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # timestamps cross the compare as formatted strings: pandas gives
    # Spark and DuckDB results different datetime64 units otherwise
    return windowed_event_counts(ev).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"), "sum_value")


SQL_EVENTS_WINDOW = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): per-session event
    count, start, duration.  lag + running-sum over a user-partitioned
    window — the canonical activity-log operator."""
    from .operators.events import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev).select(
        "user_id", "session_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss")
        .alias("session_start"),
        F.col("duration_sec").cast("long").alias("duration_sec"))


SQL_SESSIONIZE = """
WITH o AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS boundary
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts,
           sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
    FROM o
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       date_diff('second', min(ts), max(ts))::BIGINT AS duration_sec
FROM s GROUP BY user_id, session_id
"""


PRICING_CUTOFF = "1998-09-02"


def q_lineitem_pricing(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: predicate pushdown on the ship
    date, one partial+final hash aggregation over 6 measures."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (F.lit(1.0) - F.col("l_discount"))), 6)
             .alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"),
             F.count("*").alias("count_order"))
        .withColumn("count_order", F.col("count_order").cast("long"))
    )


SQL_LINEITEM_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark, sf_dir):
    """Revenue top-10 customers: orders aggregate, broadcast join to
    the (small) customer dim, TakeOrderedAndProject — the dim-join +
    top-k pattern at its intended physical shape."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (orders.groupBy("o_custkey")
           .agg(F.round(F.sum("o_totalprice"), 6).alias("revenue"),
                F.count("*").alias("n_orders")))
    top = (rev.join(F.broadcast(cust),
                    rev["o_custkey"] == cust["c_custkey"], "inner")
           .select(F.col("c_custkey").alias("custkey"), "c_mktsegment",
                   "revenue", F.col("n_orders").cast("long").alias("n_orders"))
           .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
           .limit(10))
    w = Window.orderBy(F.col("revenue").desc(), F.col("custkey").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


SQL_TOP_CUSTOMERS = """
WITH rev AS (
    SELECT o_custkey, round(sum(o_totalprice), 6) AS revenue,
           count(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey AS custkey, c.c_mktsegment, r.revenue, r.n_orders,
       row_number() OVER (ORDER BY r.revenue DESC, c.c_custkey ASC)::BIGINT
           AS rank
FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# dedup clustering, repetition filters, source rollup, deterministic splits
# ---------------------------------------------------------------------------

def q_dup_clusters(spark, sf_dir):
    """Connected components over the q12 near-dup pair stream + the
    keep-one-per-cluster verdict for every doc (operators/dedup.py
    duplicate_clusters / canonical_assignment)."""
    from .operators.dedup import canonical_assignment, ngram_jaccard_pairs

    df = _docs(spark, sf_dir).filter(F.col("doc_id") < 800)
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.2,
                                max_shingle_df=JACCARD_DF_CAP)
    return canonical_assignment(df, "doc_id", pairs)


# transitive closure via recursive CTE: reach(src, dst) enumerates every
# vertex reachable from src; least(src, min(dst)) is the component min —
# the same fixpoint the Spark hash-min propagation converges to
SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
lab0 AS (SELECT src AS id, least(src, min(dst)) AS cid FROM reach GROUP BY src),
lab AS (SELECT d.doc_id AS id, coalesce(l.cid, d.doc_id) AS cluster_id
        FROM d LEFT JOIN lab0 l ON d.doc_id = l.id),
csz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
        FROM lab GROUP BY cluster_id)
SELECT lab.id, lab.cluster_id, c.cluster_size,
       (lab.id = lab.cluster_id) AS is_canonical
FROM lab JOIN csz c USING (cluster_id)
"""


def q_repetition(spark, sf_dir):
    from .operators.textstats import repetition_signals

    return repetition_signals(_docs(spark, sf_dir), "doc_id", "text")


SQL_REPETITION = """
WITH t AS (
    SELECT doc_id AS id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS _t
    FROM documents
),
pr AS (
    SELECT id,
           len(_t)::BIGINT AS n_tokens,
           len(list_distinct(_t)) AS d1,
           len(list_transform(range(0, greatest(len(_t) - 1, 0)),
               i -> concat_ws(' ', _t[i + 1], _t[i + 2]))) AS n2,
           len(list_distinct(list_transform(range(0, greatest(len(_t) - 1, 0)),
               i -> concat_ws(' ', _t[i + 1], _t[i + 2])))) AS d2,
           len(list_transform(range(0, greatest(len(_t) - 2, 0)),
               i -> concat_ws(' ', _t[i + 1], _t[i + 2], _t[i + 3]))) AS n3,
           len(list_distinct(list_transform(range(0, greatest(len(_t) - 2, 0)),
               i -> concat_ws(' ', _t[i + 1], _t[i + 2], _t[i + 3])))) AS d3
    FROM t
),
tok AS (SELECT id, unnest(_t) AS tok FROM t),
cnt AS (SELECT id, tok, count(*) AS c FROM tok GROUP BY id, tok),
top AS (SELECT id, max(c) AS topc FROM cnt GROUP BY id)
SELECT pr.id, pr.n_tokens,
       CASE WHEN pr.n_tokens > 0
            THEN round(pr.d1 / pr.n_tokens::DOUBLE, 6) ELSE 0.0 END
           AS distinct_token_ratio,
       CASE WHEN pr.n_tokens > 0
            THEN round(coalesce(top.topc, 0) / pr.n_tokens::DOUBLE, 6)
            ELSE 0.0 END AS top_token_frac,
       CASE WHEN pr.n2 > 0
            THEN round((pr.n2 - pr.d2) / pr.n2::DOUBLE, 6) ELSE 0.0 END
           AS dup_2gram_frac,
       CASE WHEN pr.n3 > 0
            THEN round((pr.n3 - pr.d3) / pr.n3::DOUBLE, 6) ELSE 0.0 END
           AS dup_3gram_frac
FROM pr LEFT JOIN top ON pr.id = top.id
"""


def q_source_stats(spark, sf_dir):
    from .operators.textstats import source_stats

    return source_stats(_docs(spark, sf_dir))


SQL_SOURCE_STATS = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT md5(text))::BIGINT AS n_unique_texts,
       sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '')))::BIGINT AS total_ws_tokens,
       round(avg(length(text)), 6) AS avg_chars,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM documents GROUP BY source
"""


SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
SPLIT_SEED = 13
SAMPLE_RATES = {"en": 0.5, "es": 0.25, "de": 0.25, "fr": 0.1}
SAMPLE_SEED = 29


def q_split(spark, sf_dir):
    from .operators.sampling import deterministic_split

    return deterministic_split(_docs(spark, sf_dir), "doc_id",
                               SPLIT_WEIGHTS, seed=SPLIT_SEED)


def _sql_split() -> str:
    from .operators.sampling import DENOM, split_bounds

    names = list(SPLIT_WEIGHTS)
    bounds = split_bounds(SPLIT_WEIGHTS)
    u = f"({_sql_hash64('doc_id::VARCHAR', SPLIT_SEED)} % {DENOM})"
    case = "CASE " + " ".join(
        f"WHEN {u} < {b} THEN '{names[i]}'" for i, b in enumerate(bounds)
    ) + f" ELSE '{names[-1]}' END"
    return f"""
SELECT doc_id AS id, {u}::BIGINT AS bucket, {case} AS split
FROM documents
"""


def q_stratified_sample(spark, sf_dir):
    from .operators.sampling import stratified_sample

    out = stratified_sample(_docs(spark, sf_dir), "doc_id", "lang",
                            SAMPLE_RATES, seed=SAMPLE_SEED)
    return out.select(F.col("doc_id").alias("id"), "lang", "bucket")


def _sql_stratified_sample() -> str:
    from .operators.sampling import DENOM

    u = f"({_sql_hash64('doc_id::VARCHAR', SAMPLE_SEED)} % {DENOM})"
    rate = "CASE " + " ".join(
        f"WHEN lang = '{s}' THEN {int(round(r * DENOM))}"
        for s, r in SAMPLE_RATES.items()) + " ELSE 0 END"
    return f"""
SELECT doc_id AS id, lang, {u}::BIGINT AS bucket
FROM documents WHERE {u} < {rate}
"""


# ---------------------------------------------------------------------------
# PII scrub (q41): the documents table is synthetic word-soup with no
# natural PII, so the query derives a text column with DETERMINISTIC
# synthetic PII (seeded by doc_id, mirrored token-for-token in the SQL
# twin) — the oracle then checks detection counts AND the md5 of the
# redacted text, i.e. the whole scrub path end-to-end.
# ---------------------------------------------------------------------------

PII_EMAIL_MOD, PII_PHONE_MOD, PII_IP_MOD = 7, 11, 13


def _pii_text_col():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(did % PII_EMAIL_MOD == 0,
               F.concat(F.lit(" contact user"), did.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(did % PII_PHONE_MOD == 0,
               F.concat(F.lit(" call +1-555-"),
                        F.lpad((did % 1000).cast("string"), 3, "0"),
                        F.lit("-0142"))).otherwise(F.lit("")),
        F.when(did % PII_IP_MOD == 0,
               F.concat(F.lit(" host 10."), (did % 256).cast("string"),
                        F.lit(".0.1 up"))).otherwise(F.lit("")),
    )


def q_pii(spark, sf_dir):
    from .operators.pii import pii_signals, redact_pii

    df = _docs(spark, sf_dir).select(F.col("doc_id").alias("id"),
                                     _pii_text_col().alias("_pt"))
    out = redact_pii(pii_signals(df, "_pt"), "_pt")
    return out.select(
        "id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        "has_pii",
        F.md5("redacted").alias("red_md5"),
    )


def _sql_pii() -> str:
    from .operators.pii import PII_PATTERNS

    pt = (
        "text"
        f" || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0 THEN"
        " ' contact user' || doc_id::VARCHAR || '@example.com'"
        " ELSE '' END"
        f" || CASE WHEN doc_id % {PII_PHONE_MOD} = 0 THEN"
        " ' call +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')"
        " || '-0142' ELSE '' END"
        f" || CASE WHEN doc_id % {PII_IP_MOD} = 0 THEN"
        " ' host 10.' || (doc_id % 256)::VARCHAR || '.0.1 up'"
        " ELSE '' END"
    )
    counts = ",\n       ".join(
        f"len(regexp_extract_all(pt, '{pat}', 0))::BIGINT AS n_{name}"
        for name, pat in PII_PATTERNS)
    red = "pt"
    for name, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    any_hit = " OR ".join(
        f"len(regexp_extract_all(pt, '{pat}', 0)) > 0"
        for _, pat in PII_PATTERNS)
    return f"""
WITH t AS (SELECT doc_id AS id, {pt} AS pt FROM documents)
SELECT id,
       {counts},
       ({any_hit}) AS has_pii,
       md5({red}) AS red_md5
FROM t
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (q42): eval set = every 29th document; a
# training doc is contaminated if it shares any 13-token shingle with
# the eval set.  The eval docs self-contaminate by construction, and
# near-duplicate corpus docs surface as extra hits.
# ---------------------------------------------------------------------------

DECON_MOD = 29
DECON_N = 13


def q_decontam(spark, sf_dir):
    from .operators.decontam import contaminated_docs

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    out = contaminated_docs(docs, bench, "doc_id", "text", n=DECON_N)
    return out.select("id", "n_hits")


def _sql_decontam() -> str:
    cols = ", ".join(f"_t[i + {j}]" for j in range(1, DECON_N + 1))
    ng = (f"list_transform(range(0, greatest(len(_t) - {DECON_N - 1}, 0)), "
          f"i -> concat_ws(' ', {cols}))")
    return f"""
WITH t AS (
    SELECT doc_id AS id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS _t
    FROM documents
),
g AS (SELECT id, unnest({ng}) AS ngram FROM t),
gd AS (SELECT DISTINCT id, ngram FROM g),
b AS (SELECT DISTINCT ngram FROM g WHERE id % {DECON_MOD} = 0)
SELECT id, count(*)::BIGINT AS n_hits
FROM gd JOIN b USING (ngram)
GROUP BY id
"""


# ---------------------------------------------------------------------------
# Sequence packing (q43): T5-style pack-and-chop layout of the corpus
# into fixed-token training sequences, sharded by id hash.
# ---------------------------------------------------------------------------

PACK_BUDGET = 512
PACK_SHARDS = 16
PACK_SEED = 41


def q_pack(spark, sf_dir):
    from .operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), "doc_id", "text",
                          budget=PACK_BUDGET, shards=PACK_SHARDS,
                          seed=PACK_SEED)


def _sql_pack() -> str:
    h = _sql_hash64("doc_id::VARCHAR", PACK_SEED)
    return f"""
WITH t AS (
    SELECT doc_id AS id,
           ({h} % {PACK_SHARDS})::BIGINT AS shard,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''))::BIGINT AS n_tokens
    FROM documents
),
w AS (
    SELECT id, shard, n_tokens,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS seq_begin
    FROM t
)
SELECT id, shard, n_tokens, seq_begin,
       (seq_begin // {PACK_BUDGET})::BIGINT AS seq_id,
       (seq_begin % {PACK_BUDGET})::BIGINT AS seq_off
FROM w
"""


# ---------------------------------------------------------------------------
# Curation funnel (q44): the whole training-data pipeline as ONE query —
# language gate, quality gate, repetition gate, exact-dedup keep,
# decontamination — reporting survivors after each cumulative stage.
# Any drift in any underlying operator shifts a count, so this is an
# end-to-end cross-check over the composed pipeline, not a new
# primitive.  The SQL twin wraps the very oracle fragments the
# per-operator queries (q17/q18/q37/q42) are hash-checked against.
# ---------------------------------------------------------------------------

FUNNEL_QUALITY_MIN = 0.05
FUNNEL_DUP2_MAX = 0.05


def q_funnel(spark, sf_dir):
    from .operators.decontam import contaminated_docs
    from .operators.textstats import (language_id, quality_score,
                                      repetition_signals)

    docs = _docs(spark, sf_dir)
    # One-pass signal chain: lang/quality/repetition are row-local, so
    # they compose over a SINGLE corpus scan via keep_cols instead of a
    # scan + id-join each.  The exact-dedup keep flag folds in too:
    # md5(text) is computed while text is still in scope, so its window
    # shuffles only thin signal rows, never the html-sized text.  The
    # only side branches left are the ones that genuinely shuffle:
    # repetition's mode-token agg and the decontamination semi-join.
    base = docs.select(F.col("doc_id").alias("id"), "text", "lang",
                       F.md5("text").alias("h"))
    sig = language_id(base, "id", "text", keep_cols=("text", "lang", "h"))
    sig = quality_score(sig, "id", "text",
                        keep_cols=("text", "lang", "h", "lang_pred"))
    sig = repetition_signals(sig, "id", "text",
                             keep_cols=("lang", "h", "lang_pred", "quality"))
    wk = Window.partitionBy("h")
    sig = sig.withColumn("keep", F.col("id") == F.min("id").over(wk))
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    contam = contaminated_docs(docs, bench, "doc_id", "text",
                               n=DECON_N).select(
        "id", F.lit(True).alias("dirty"))
    j = sig.join(contam, "id", "left")
    f1 = F.col("lang_pred") == F.col("lang")
    f2 = f1 & (F.col("quality") >= FUNNEL_QUALITY_MIN)
    f3 = f2 & (F.col("dup_2gram_frac") <= FUNNEL_DUP2_MAX)
    f4 = f3 & F.col("keep")
    f5 = f4 & F.col("dirty").isNull()

    def n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = j.agg(
        F.count("*").cast("long").alias("s0"), n(f1).alias("s1"),
        n(f2).alias("s2"), n(f3).alias("s3"), n(f4).alias("s4"),
        n(f5).alias("s5"))
    return agg.selectExpr(
        "stack(6, 0L, 'all', s0, 1L, 'lang_agree', s1,"
        " 2L, 'quality', s2, 3L, 'repetition', s3,"
        " 4L, 'exact_dedup', s4, 5L, 'decontaminated', s5)"
        " AS (stage_id, stage, n_surviving)")


def _sql_funnel() -> str:
    return f"""
WITH lang AS (SELECT _l.id, lang_pred, d.lang
          FROM ({_sql_langid()}) _l
          JOIN documents d ON _l.id = d.doc_id),
qual AS (SELECT id, quality FROM ({_sql_quality()}) _q),
rep AS (SELECT id, dup_2gram_frac FROM ({SQL_REPETITION}) _r),
first_occ AS (
    SELECT doc_id AS id,
           (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS keep
    FROM documents
),
contam AS (SELECT id, TRUE AS dirty FROM ({_sql_decontam()}) _c),
j AS (
    SELECT lang.id, lang_pred, quality, dup_2gram_frac, keep, dirty,
           (lang_pred = lang) AS f1
    FROM lang JOIN qual USING (id) JOIN rep USING (id)
    JOIN first_occ USING (id) LEFT JOIN contam USING (id)
),
fl AS (
    SELECT *,
           (f1 AND quality >= {FUNNEL_QUALITY_MIN}) AS f2,
           (f1 AND quality >= {FUNNEL_QUALITY_MIN}
               AND dup_2gram_frac <= {FUNNEL_DUP2_MAX}) AS f3,
           (f1 AND quality >= {FUNNEL_QUALITY_MIN}
               AND dup_2gram_frac <= {FUNNEL_DUP2_MAX} AND keep) AS f4,
           (f1 AND quality >= {FUNNEL_QUALITY_MIN}
               AND dup_2gram_frac <= {FUNNEL_DUP2_MAX} AND keep
               AND dirty IS NULL) AS f5
    FROM j
),
a AS (
    SELECT count(*)::BIGINT AS s0,
           sum(CASE WHEN f1 THEN 1 ELSE 0 END)::BIGINT AS s1,
           sum(CASE WHEN f2 THEN 1 ELSE 0 END)::BIGINT AS s2,
           sum(CASE WHEN f3 THEN 1 ELSE 0 END)::BIGINT AS s3,
           sum(CASE WHEN f4 THEN 1 ELSE 0 END)::BIGINT AS s4,
           sum(CASE WHEN f5 THEN 1 ELSE 0 END)::BIGINT AS s5
    FROM fl
)
SELECT 0::BIGINT AS stage_id, 'all' AS stage, s0 AS n_surviving FROM a
UNION ALL SELECT 1, 'lang_agree', s1 FROM a
UNION ALL SELECT 2, 'quality', s2 FROM a
UNION ALL SELECT 3, 'repetition', s3 FROM a
UNION ALL SELECT 4, 'exact_dedup', s4 FROM a
UNION ALL SELECT 5, 'decontaminated', s5 FROM a
"""


# ---------------------------------------------------------------------------
# Source diversification (q45) and per-source token budget (q46): the
# two standard "data mixing" selectors a webtext pipeline runs after
# cleaning — cap how much any one domain/source contributes, then fill
# each source's token budget in a deterministic unbiased order.
# ---------------------------------------------------------------------------

CAP_PER_SOURCE = 10
TOKEN_BUDGET = 600
BUDGET_SEED = 47


def q_source_cap(spark, sf_dir):
    from .operators.sampling import cap_per_key
    from .operators.textstats import quality_score

    qual = quality_score(_docs(spark, sf_dir), "doc_id", "text",
                         keep_cols=("source",))
    out = cap_per_key(qual, "source",
                      [F.col("quality").desc(), F.col("id").asc()],
                      n=CAP_PER_SOURCE, id_col="id")
    return out.select("id", "source", "quality",
                      F.col("rank").cast("long").alias("rank"))


def _sql_source_cap() -> str:
    return f"""
WITH q AS (SELECT id, quality FROM ({_sql_quality()}) _q),
d AS (SELECT doc_id AS id, source FROM documents),
r AS (
    SELECT q.id, d.source, q.quality,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY q.quality DESC, q.id ASC) AS rank
    FROM q JOIN d ON q.id = d.id
)
SELECT id, source, quality, rank::BIGINT AS rank
FROM r WHERE rank <= {CAP_PER_SOURCE}
"""


def q_token_budget(spark, sf_dir):
    from .operators.sampling import token_budget_sample
    from .operators.textstats import token_counts

    tc = token_counts(_docs(spark, sf_dir), "doc_id", "text",
                      keep_cols=("source",))
    out = token_budget_sample(tc, "source", "ws_tokens", "id",
                              TOKEN_BUDGET, seed=BUDGET_SEED)
    return out.select("id", "source",
                      F.col("ws_tokens").cast("long").alias("ws_tokens"),
                      "cum_weight")


def _sql_token_budget() -> str:
    h = _sql_hash64("id::VARCHAR", BUDGET_SEED)
    return f"""
WITH tc AS (
    SELECT doc_id AS id, source,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''))::BIGINT AS ws_tokens
    FROM documents
),
w AS (
    SELECT id, source, ws_tokens,
           sum(ws_tokens) OVER (
               PARTITION BY source
               ORDER BY {h} ASC, id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )::BIGINT AS cum_weight
    FROM tc
)
SELECT id, source, ws_tokens, cum_weight
FROM w WHERE cum_weight <= {TOKEN_BUDGET}
"""

# ---------------------------------------------------------------------------
# positional retrieval: exact phrase (q47) + proximity NEAR/w (q48).
# Engines use deliberately DIFFERENT formulations of the same semantics
# (Spark: one hash agg + offset-shifted array_intersect, no self-join;
# DuckDB: relational positional self-join) — matching hashes from
# independent plans is the strongest form of the oracle check.
# ---------------------------------------------------------------------------

PHRASE_TERMS = ("query", "scan")
PROX_A, PROX_B, PROX_WINDOW = "data", "join", 4

SQL_POS = """
seq AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents
),
pos0 AS (
    SELECT doc_id, unnest(tokens) AS term,
           generate_subscripts(tokens, 1) AS pos
    FROM seq
),
pos2 AS (SELECT doc_id, term, pos FROM pos0 WHERE term <> '')
"""


def q_phrase_topk(spark, sf_dir):
    from .operators.phrase import phrase_bm25_topk

    return phrase_bm25_topk(
        _docs(spark, sf_dir).select("doc_id", "text"),
        list(PHRASE_TERMS), k=10)


SQL_PHRASE_TOPK = f"""
WITH {SQL_POS},
m AS (
    SELECT p0.doc_id, p0.pos
    FROM pos2 p0
    JOIN pos2 p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
    WHERE p0.term = '{PHRASE_TERMS[0]}' AND p1.term = '{PHRASE_TERMS[1]}'
),
occ AS (SELECT doc_id, count(*)::BIGINT AS ptf FROM m GROUP BY 1),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM pos2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM pos2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
           (SELECT count(*) FROM occ)::DOUBLE AS df_p
),
scores AS (
    SELECT o.doc_id, o.ptf,
           round(ln((c.n_docs - c.df_p + 0.5) / (c.df_p + 0.5) + 1.0)
                 * ((o.ptf * {K1 + 1.0}) /
                    (o.ptf + {K1} * ({1.0 - B} + {B} * (d.dl / c.avgdl)))),
                 6) AS score
    FROM occ o JOIN dl d USING (doc_id) CROSS JOIN consts c
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, ptf, score
FROM scores ORDER BY rank LIMIT 10
"""


def q_proximity(spark, sf_dir):
    from .operators.phrase import proximity_topk

    return proximity_topk(
        _docs(spark, sf_dir).select("doc_id", "text"),
        PROX_A, PROX_B, PROX_WINDOW, k=15)


SQL_PROXIMITY = f"""
WITH {SQL_POS},
pa AS (SELECT doc_id, pos FROM pos2 WHERE term = '{PROX_A}'),
pb AS (SELECT doc_id, pos FROM pos2 WHERE term = '{PROX_B}'),
pairs AS (
    SELECT pa.doc_id, abs(pa.pos - pb.pos) AS dist
    FROM pa JOIN pb USING (doc_id)
),
m AS (
    SELECT doc_id,
           (count(*) FILTER (WHERE dist <= {PROX_WINDOW}))::BIGINT AS n_pairs,
           min(dist)::BIGINT AS min_dist
    FROM pairs GROUP BY 1
)
SELECT row_number() OVER (
           ORDER BY n_pairs DESC, min_dist ASC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_pairs, min_dist
FROM m WHERE min_dist <= {PROX_WINDOW}
ORDER BY rank LIMIT 15
"""

# batched phrase workload (q49): every phrase scored in ONE plan via the
# relational start-position formulation — a start s matches query q in
# doc d iff grouping the (q, d, pos - offset) rows sees ALL of q's
# offsets.  The Spark side is operators/phrase.phrase_match_batch + an
# in-plan per-query BM25 virtual-term scorer; idf comes from a window
# count so the whole workload is one job.
PHRASE_BATCH = {"p0": ("query", "scan"), "p1": ("table", "value"),
                "p2": ("hash", "join")}


def q_phrase_batch(spark, sf_dir):
    from .operators.phrase import phrase_match_batch, token_positions

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pos = token_positions(docs)
    n_docs = docs.count()
    total_tokens = pos.count()
    avgdl = total_tokens / n_docs
    occ = phrase_match_batch(pos, {q: list(t)
                                   for q, t in PHRASE_BATCH.items()})
    dl = pos.groupBy("doc_id").agg(F.count("*").alias("dl"))
    qwin = Window.partitionBy("query_id")
    scored = (
        occ.join(dl, "doc_id")
        .withColumn("df_p", F.count("*").over(qwin).cast("double"))
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df_p") + 0.5)
            / (F.col("df_p") + 0.5) + 1.0))
        .withColumn("score", F.round(
            F.col("idf") * (F.col("ptf") * F.lit(K1 + 1.0))
            / (F.col("ptf") + F.lit(K1) * (F.lit(1.0 - B)
               + F.lit(B) * (F.col("dl") / F.lit(avgdl)))), 6))
    )
    rwin = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(rwin).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "doc_id", "ptf", "score")
    )


def _sql_phrase_batch() -> str:
    qmap = ", ".join(
        f"('{qid}', '{t}', {i})"
        for qid, terms in PHRASE_BATCH.items() for i, t in enumerate(terms))
    mrows = ", ".join(f"('{qid}', {len(terms)})"
                      for qid, terms in PHRASE_BATCH.items())
    return f"""
WITH {SQL_POS},
qmap(query_id, term, off) AS (VALUES {qmap}),
qm(query_id, m) AS (VALUES {mrows}),
starts AS (
    SELECT q.query_id, p.doc_id, p.pos - q.off AS start
    FROM pos2 p JOIN qmap q ON p.term = q.term
    GROUP BY 1, 2, 3
    HAVING count(DISTINCT q.off) = (SELECT m FROM qm
                                    WHERE qm.query_id = q.query_id)
),
occ AS (
    SELECT query_id, doc_id, count(*)::BIGINT AS ptf
    FROM starts GROUP BY 1, 2
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM pos2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM pos2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
scored AS (
    SELECT o.query_id, o.doc_id, o.ptf,
           round(ln((c.n_docs - (count(*) OVER (PARTITION BY o.query_id))
                                ::DOUBLE + 0.5)
                    / ((count(*) OVER (PARTITION BY o.query_id))::DOUBLE
                       + 0.5) + 1.0)
                 * ((o.ptf * {K1 + 1.0}) /
                    (o.ptf + {K1} * ({1.0 - B} + {B} * (d.dl / c.avgdl)))),
                 6) AS score
    FROM occ o JOIN dl d USING (doc_id) CROSS JOIN consts c
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, ptf, score
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""


# prefix (wildcard) search (q50): expand the prefix against the
# dictionary — capped deterministically at the df-heaviest
# MAX_EXPANSIONS terms (df DESC, term ASC), Lucene's max_expansions
# contract — then score the expansion as an OR-mode BM25 query.
PREFIX_Q, MAX_EXPANSIONS = "s", 4


def q_prefix_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    expansion = (
        dictionary.filter(F.col("term").startswith(PREFIX_Q))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(MAX_EXPANSIONS)
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    matches = (
        postings.join(F.broadcast(expansion.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_PREFIX_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term LIKE '{PREFIX_Q}%'
    ORDER BY d.df DESC, d.term ASC
    LIMIT {MAX_EXPANSIONS}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# NOT-term exclusion (q51): OR-BM25 over the positive terms, minus every
# doc containing a negated term — the '-term' query surface.  Exclusion
# is an anti-join applied BEFORE top-k selection (correct backfill).
NOT_POS_TERMS, NOT_NEG_TERM = ("data", "query"), "scan"


def q_not_query(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in NOT_POS_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    neg_docs = (postings.filter(F.col("term") == NOT_NEG_TERM)
                .select("doc_id").distinct())
    scores = scores.join(neg_docs, "doc_id", "left_anti")
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_NOT_QUERY = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(NOT_POS_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    WHERE p.doc_id NOT IN (SELECT doc_id FROM postings
                           WHERE term = '{NOT_NEG_TERM}')
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# fuzzy search (q52): expand the query term against the dictionary
# within MAX_EDITS Levenshtein edits — capped deterministically at
# MAX_FUZZY_EXP terms (distance ASC, df DESC, term ASC), Lucene's
# FuzzyQuery contract — then score the expansion as an OR-mode BM25
# query.  Spark's levenshtein and DuckDB's levenshtein are both the
# standard DP edit distance, so the expansion sets agree exactly.
FUZZY_Q, MAX_EDITS, MAX_FUZZY_EXP = "par", 2, 8


def q_fuzzy_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    expansion = (
        dictionary
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(FUZZY_Q)))
        .filter(F.col("dist") <= MAX_EDITS)
        .orderBy(F.col("dist").asc(), F.col("df").desc(),
                 F.col("term").asc())
        .limit(MAX_FUZZY_EXP)
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    matches = (
        postings.join(F.broadcast(expansion.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_FUZZY_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE levenshtein(d.term, '{FUZZY_Q}') <= {MAX_EDITS}
    ORDER BY levenshtein(d.term, '{FUZZY_Q}') ASC, d.df DESC, d.term ASC
    LIMIT {MAX_FUZZY_EXP}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# more-like-this (q53): the seed document's top tf-idf terms become an
# OR-mode BM25 query; the seed is excluded so the result is "documents
# most similar to doc MLT_SEED" — Lucene/Elasticsearch MLT semantics.
# Term selection is deterministic: tf*idf DESC, term ASC, LIMIT m (tf is
# an integer and idf a pure function of df, so the weight is the same
# double in both engines — no rounding needed for a stable order).
MLT_SEED, MLT_TERMS = 0, 5


def q_more_like_this(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    mlt = (
        postings.filter(F.col("doc_id") == MLT_SEED)
        .join(dictionary, "term")
        .withColumn("w", F.col("tf") * idf)
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(MLT_TERMS)
        .withColumn("idf", idf)
    )
    matches = (
        postings.filter(F.col("doc_id") != MLT_SEED)
        .join(F.broadcast(mlt.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_MORE_LIKE_THIS = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM postings p
    JOIN dict d ON p.term = d.term
    CROSS JOIN consts c
    WHERE p.doc_id = {MLT_SEED}
    ORDER BY p.tf * ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) DESC,
             p.term ASC
    LIMIT {MLT_TERMS}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    WHERE p.doc_id <> {MLT_SEED}
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# faceted search (q54): facet counts over a query's top-FACET_K result
# set — the Solr/Elasticsearch aggregation attached to every search
# page.  The facet runs over the RANKED result (not the whole corpus):
# top-k first (TakeOrderedAndProject), then one tiny hash agg per facet
# value on <= FACET_K rows joined back to the documents dimension.
FACET_TERMS, FACET_K = ("data", "query", "scan"), 50


def q_facet_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in FACET_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    topk = (scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(FACET_K))
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = topk.withColumn("rank", F.row_number().over(win).cast("long"))
    return (
        ranked.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.min("rank").cast("long").alias("best_rank"),
             F.round(F.max("score"), 6).alias("top_score"))
    )


SQL_FACET_COUNTS = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(FACET_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
ranked AS (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
    FROM scores
    ORDER BY score DESC, doc_id ASC
    LIMIT {FACET_K}
)
SELECT d.source, d.lang, count(*)::BIGINT AS n_docs,
       min(r.rank)::BIGINT AS best_rank,
       round(max(r.score), 6) AS top_score
FROM ranked r
JOIN documents d ON r.doc_id = d.doc_id
GROUP BY d.source, d.lang
"""


# related terms (q55): top term pairs by document-co-occurrence PMI —
# the query-expansion / related-search statistic (operators/cooccur.py
# is the engine twin over the built postings).  The df band filters
# BEFORE the self-join (the m² blowup killer at scale); pairs with
# fewer than MIN_PAIRS co-occurrences are dropped (PMI is noise at
# c=1).  max_df is fractional so the query is sf-independent.
PMI_MIN_DF, PMI_MAX_DF_FRAC, MIN_PAIRS, PMI_TOP = 2, 0.9, 2, 20


def q_related_terms(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    p = toks.select("term", "doc_id").distinct()
    dictionary = p.groupBy("term").agg(F.count("*").alias("df"))
    band = dictionary.filter(
        (F.col("df") >= PMI_MIN_DF)
        & (F.col("df") <= PMI_MAX_DF_FRAC * float(n_docs)))
    kept = p.join(F.broadcast(band), "term")
    a = kept.select(F.col("term").alias("term_a"),
                    F.col("df").alias("df_a"), "doc_id")
    b = kept.select(F.col("term").alias("term_b"),
                    F.col("df").alias("df_b"), "doc_id")
    pairs = (
        a.join(b, "doc_id").filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= MIN_PAIRS)
    )
    scored = pairs.withColumn(
        "pmi",
        F.round(F.log(F.lit(float(n_docs)) * F.col("n_both")
                      / (F.col("df_a") * F.col("df_b"))), 6))
    return (
        scored.select("term_a", "term_b", "n_both", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("term_a").asc(),
                 F.col("term_b").asc())
        .limit(PMI_TOP)
    )


SQL_RELATED_TERMS = f"""
WITH {SQL_TOKS},
p AS (SELECT DISTINCT term, doc_id FROM toks2),
consts AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs),
dict AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
band AS (
    SELECT d.term, d.df FROM dict d, consts c
    WHERE d.df >= {PMI_MIN_DF} AND d.df <= {PMI_MAX_DF_FRAC} * c.n_docs
),
pairs AS (
    SELECT a.term AS term_a, b.term AS term_b,
           da.df AS df_a, db.df AS df_b, count(*)::BIGINT AS n_both
    FROM p a
    JOIN p b ON a.doc_id = b.doc_id AND a.term < b.term
    JOIN band da ON da.term = a.term
    JOIN band db ON db.term = b.term
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= {MIN_PAIRS}
)
SELECT term_a, term_b, n_both,
       round(ln(c.n_docs * n_both / (df_a * df_b)), 6) AS pmi
FROM pairs, consts c
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {PMI_TOP}
"""


# zone-restricted (fielded) search (q56): only matches whose zone
# importance reaches the title weight qualify — an in:title query.  The
# testdata has no HTML zones, so the q26 positional scheme applies: the
# first 8 tokens are the title zone (weight 20), the rest weight 10.
# tf stays the full-document tf (the zone gates WHICH (term, doc)
# matches qualify, not how they weigh) — plans/query.py
# bm25_topk_exhaustive(min_imp=) is the engine twin.
ZONE_MIN_IMP = 20


def q_zone_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), _NORM_RE, " ")),
                r"\s+",
            )
        ).alias("pos", "term"),
    ).filter(F.col("term") != "")
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.max(F.when(F.col("pos") < 8, 20).otherwise(10)).alias("imp"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.filter(F.col("imp") >= ZONE_MIN_IMP)
        .join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_ZONE_SEARCH = f"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+') AS _t
    FROM documents
),
toksp AS (
    SELECT doc_id, _t[i + 1] AS term, i AS pos
    FROM t, unnest(range(0, len(_t))) AS u(i)
    WHERE _t[i + 1] <> ''
),
postings AS (
    SELECT term, doc_id, count(*)::BIGINT AS tf,
           max(CASE WHEN pos < 8 THEN 20 ELSE 10 END) AS imp
    FROM toksp GROUP BY 1, 2
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toksp GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toksp)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(BM25_QUERY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    WHERE p.imp >= {ZONE_MIN_IMP}
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# spell suggestion (q57): "did you mean" over the dictionary.  One plan
# for the whole misspelled batch: the (tiny) query side broadcasts into
# a prefix-pinned + length-banded nested-loop join against the
# dictionary, Levenshtein filters to radius, and a per-query rank
# window picks the closest/most-popular candidate — the same
# contract as plans/query.suggest_terms (Lucene's DirectSpellChecker
# ranking: distance ASC, df DESC, term ASC).  A present term is its own
# distance-0 candidate, so "data" maps to itself; a hopeless term
# ("zzz": nothing shares its prefix) drops out.  Pytest pins the
# engine function to this oracle-tier plan on the same input.
# ---------------------------------------------------------------------------

SUGGEST_QUERIES = ("quary", "tabl", "joins", "data", "zzz")
SUGGEST_MAX_EDITS, SUGGEST_PREFIX_LEN = 1, 1


def q_spell_suggest(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    postings = (_tokens(docs).groupBy("term", "doc_id")
                .agg(F.count("*").alias("tf")))
    dictionary = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))
    qdf = spark.createDataFrame(
        [(q, q[:SUGGEST_PREFIX_LEN], len(q)) for q in SUGGEST_QUERIES],
        "q string, pfx string, qlen int")
    cond = (
        (F.abs(F.length("term") - F.col("qlen")) <= SUGGEST_MAX_EDITS)
        & F.col("term").startswith(F.col("pfx"))
    )
    cand = (
        dictionary.join(F.broadcast(qdf), cond)
        .withColumn("dist",
                    F.levenshtein(F.col("term"), F.col("q")).cast("long"))
        .filter(F.col("dist") <= SUGGEST_MAX_EDITS)
    )
    win = Window.partitionBy("q").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("q", F.col("term").alias("suggestion"), "dist", "df")
    )


def _sql_suggest() -> str:
    values = ", ".join(f"('{q}')" for q in SUGGEST_QUERIES)
    return f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id FROM toks2 GROUP BY 1, 2),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
qs(q) AS (VALUES {values}),
cand AS (
    SELECT qs.q, d.term, levenshtein(d.term, qs.q)::BIGINT AS dist, d.df
    FROM dict d
    JOIN qs ON abs(len(d.term) - len(qs.q)) <= {SUGGEST_MAX_EDITS}
           AND substr(d.term, 1, {SUGGEST_PREFIX_LEN})
               = substr(qs.q, 1, {SUGGEST_PREFIX_LEN})
    WHERE levenshtein(d.term, qs.q) <= {SUGGEST_MAX_EDITS}
),
best AS (
    SELECT q, term AS suggestion, dist, df,
           row_number() OVER (PARTITION BY q
                              ORDER BY dist ASC, df DESC, term ASC) AS rn
    FROM cand
)
SELECT q, suggestion, dist, df FROM best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# search + highlight (q58): the full result-page plan — OR-mode BM25
# top-k over the query terms, then the best snippet window per result
# doc from the positional stream (operators/phrase.snippet_windows with
# the top-k subplan broadcast as the doc list, no collect between the
# two stages).  The Spark window scan is an O(hits^2) array expression
# inside one per-doc agg; the DuckDB twin is the equivalent relational
# self-join over hit positions — independent formulations, same spans.
# ---------------------------------------------------------------------------

SNIP_TERMS, SNIP_WIDTH, SNIP_K = ("hash", "join"), 12, 10


def q_snippets(spark, sf_dir):
    from .operators.phrase import snippet_windows, token_positions

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in SNIP_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    topk = scores.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()).limit(SNIP_K)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = (topk.withColumn("rank", F.row_number().over(win).cast("long"))
              .select("rank", "doc_id", "score"))
    snips = snippet_windows(token_positions(docs), ranked.select("doc_id"),
                            list(SNIP_TERMS), width=SNIP_WIDTH)
    return ranked.join(snips, "doc_id").select(
        "rank", "doc_id", "score", "win_start", "n_hits")


SQL_SNIPPETS = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(SNIP_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
topk AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
           doc_id, score
    FROM scores ORDER BY score DESC, doc_id ASC LIMIT {SNIP_K}
),
seq AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents
    WHERE doc_id IN (SELECT doc_id FROM topk)
),
posq AS (
    SELECT doc_id, unnest(tokens) AS term,
           generate_subscripts(tokens, 1) - 1 AS pos
    FROM seq
),
hits AS (
    SELECT doc_id, pos FROM posq WHERE term IN {tuple(SNIP_TERMS)!r}
),
wins AS (
    SELECT a.doc_id, a.pos AS win_start, count(*)::BIGINT AS n_hits
    FROM hits a
    JOIN hits b ON b.doc_id = a.doc_id
              AND b.pos >= a.pos AND b.pos < a.pos + {SNIP_WIDTH}
    GROUP BY 1, 2
),
best AS (
    SELECT doc_id, win_start, n_hits,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n_hits DESC, win_start ASC) AS rn
    FROM wins
)
SELECT t.rank, t.doc_id, t.score,
       b.win_start::BIGINT AS win_start, b.n_hits
FROM topk t JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
ORDER BY t.rank
"""


# ---------------------------------------------------------------------------
# search-after pagination (q59): page 2 of an OR-mode BM25 result via a
# (score, doc_id) cursor — the stateless deep-pagination contract
# (Elasticsearch search_after; wand_topk(after=) /
# bm25_topk_exhaustive(after=) on the engine tier, pytest-tiled against
# deep runs).  The cursor row (rank-10 score/doc_id) is computed IN the
# same plan and broadcasts into the strictly-after predicate — no
# driver round trip between pages here; the DuckDB twin is the
# equivalent OFFSET formulation spelled with the same cursor join.
# ---------------------------------------------------------------------------

PAGE_TERMS, PAGE_K = ("vector", "merge"), 10


def q_search_after(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in PAGE_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    cur = (
        scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(PAGE_K)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == PAGE_K)
        .select(F.col("score").alias("cs"), F.col("doc_id").alias("cd"))
    )
    page2 = (
        scores.join(F.broadcast(cur),
                    (F.col("score") < F.col("cs"))
                    | ((F.col("score") == F.col("cs"))
                       & (F.col("doc_id") > F.col("cd"))))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(PAGE_K)
    )
    return (
        page2.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_SEARCH_AFTER = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(PAGE_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
ranked AS (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM scores
),
cur AS (SELECT score AS cs, doc_id AS cd FROM ranked WHERE rn = {PAGE_K}),
page2 AS (
    SELECT s.doc_id, s.score
    FROM scores s, cur
    WHERE s.score < cur.cs OR (s.score = cur.cs AND s.doc_id > cur.cd)
    ORDER BY s.score DESC, s.doc_id ASC
    LIMIT {PAGE_K}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM page2
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# scoring explain (q60): the Lucene-Explanation analogue — the per-term
# BM25 breakdown (tf, dl, df, idf, tf-normalization w, contribution)
# for the query's TOP doc, the doc selected in the same plan (no
# driver round trip).  Engine tier: plans/query.explain_score over the
# catalog postings, pytest-pinned to sum exactly to the ranked score
# in plain/weighted/duplicate-term/boolean modes.
# ---------------------------------------------------------------------------

EXPLAIN_TERMS = ("data", "query")


def q_explain(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))
    terms = spark.createDataFrame([(t,) for t in EXPLAIN_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "df", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    top1 = (scores.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(1).select("doc_id"))
    return (
        matches.join(F.broadcast(top1), "doc_id", "left_semi")
        .select("doc_id", "term", "tf", "dl", "df",
                F.round(F.col("idf"), 6).alias("idf"),
                F.round(w, 6).alias("w"),
                F.round(F.col("idf") * w, 6).alias("contribution"))
    )


SQL_EXPLAIN = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, d.df,
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(EXPLAIN_TERMS)!r}
),
matches AS (
    SELECT p.doc_id, p.term, p.tf, dl.dl, q.df, q.idf,
           (p.tf * {K1 + 1.0}) /
               (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))) AS w
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
),
scores AS (
    SELECT doc_id, round(sum(idf * w), 6) AS score
    FROM matches GROUP BY 1
),
top1 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT m.doc_id, m.term, m.tf, m.dl, m.df,
       round(m.idf, 6) AS idf, round(m.w, 6) AS w,
       round(m.idf * m.w, 6) AS contribution
FROM matches m JOIN top1 USING (doc_id)
"""


# ---------------------------------------------------------------------------
# field collapsing (q61): one best result per collapse key, ranked —
# the Elasticsearch `collapse` / "one result per site" page shape.
# Collapse runs over the FULL scored candidate set (cutting to a page
# first could hand the page to one dominant key and under-fill after
# collapsing); the per-key best is a rank window hash-partitioned on
# the key.  Engine tier: plans/query.collapse_by_domain (url host as
# the key), pytest-pinned to the brute-force collapse of a deep run;
# here the key is the documents table's `source` column.
# ---------------------------------------------------------------------------

COLLAPSE_TERMS, COLLAPSE_K = ("stream", "window"), 10


def q_collapse(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in COLLAPSE_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    cand = docs.select("doc_id", "source").join(scores, "doc_id")
    best = (
        cand.withColumn("_rn", F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("score").desc(), F.col("doc_id").asc())))
        .filter(F.col("_rn") == 1)
    )
    topk = best.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()).limit(COLLAPSE_K)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "source", "score")
    )


SQL_COLLAPSE = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(COLLAPSE_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
best AS (
    SELECT d.doc_id, d.source, s.score,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY s.score DESC, d.doc_id ASC) AS rn
    FROM documents d JOIN scores s ON s.doc_id = d.doc_id
),
page AS (
    SELECT doc_id, source, score FROM best WHERE rn = 1
    ORDER BY score DESC, doc_id ASC LIMIT {COLLAPSE_K}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, source, score
FROM page
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# autocomplete (q62): the search-box suggestion list — top dictionary
# terms under a prefix ranked df DESC / term ASC (the exact
# plans/query.expand_prefix contract, Lucene max_expansions).  The
# StartsWith predicate pushes into the term-sorted dictionary scan.
# ---------------------------------------------------------------------------

AC_PREFIX, AC_K = "s", 8


def q_autocomplete(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    postings = (_tokens(docs).groupBy("term", "doc_id")
                .agg(F.count("*").alias("tf")))
    dictionary = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))
    top = (dictionary.filter(F.col("term").startswith(AC_PREFIX))
           .orderBy(F.col("df").desc(), F.col("term").asc())
           .limit(AC_K))
    win = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (top.withColumn("rank", F.row_number().over(win).cast("long"))
            .select("rank", "term", "df"))


SQL_AUTOCOMPLETE = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id FROM toks2 GROUP BY 1, 2),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
top AS (
    SELECT term, df FROM dict
    WHERE term LIKE '{AC_PREFIX}%'
    ORDER BY df DESC, term ASC LIMIT {AC_K}
)
SELECT row_number() OVER (ORDER BY df DESC, term ASC)::BIGINT AS rank,
       term, df
FROM top ORDER BY rank
"""


# ---------------------------------------------------------------------------
# synonym search (q63): OR-mode synonym expansion — the query term's
# synonym-map entries widen the term list (each member scoring with its
# own idf, Elasticsearch's expand-at-query-time default).  The Spark
# side runs text/normalize.expand_synonyms (pytest-pinned to equal the
# widened plain query on both engine tiers); the twin spells the
# expanded term set literally.
# ---------------------------------------------------------------------------

SYN_QUERY_TERMS, SYN_MAP = ("sort",), {"sort": ["order"]}


def q_synonym_search(spark, sf_dir):
    from .text.normalize import expand_synonyms

    expanded = expand_synonyms(list(SYN_QUERY_TERMS), SYN_MAP)
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in expanded], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


def _sql_synonym_search() -> str:
    from .text.normalize import expand_synonyms

    expanded = tuple(expand_synonyms(list(SYN_QUERY_TERMS), SYN_MAP))
    return f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {expanded!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# metadata-filtered search (q64): BM25 restricted to an allowed-docs
# set (here lang = 'en') — the language/license/tenant/ACL filter every
# multilingual corpus needs.  The filter semi-joins BEFORE scoring so
# top-k backfills from allowed docs only (engine tier:
# bm25_topk_exhaustive(doc_filter=), pytest-pinned to the brute-force
# filter of a deep run).
# ---------------------------------------------------------------------------

FILTER_TERMS, FILTER_LANG = ("batch", "merge"), "en"


def q_filtered_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in FILTER_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    allowed = docs.filter(F.col("lang") == FILTER_LANG).select("doc_id")
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
        .join(allowed, "doc_id", "left_semi")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_FILTERED_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(FILTER_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    WHERE p.doc_id IN (SELECT doc_id FROM documents
                       WHERE lang = '{FILTER_LANG}')
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# mixed phrase+term search (q65): the Lucene query-language shape
# '"query scan" merge' — the quoted span scores as a phrase virtual
# term (tf = adjacency-start count, df = matching docs), the loose term
# as plain BM25, and the per-doc score is the sum of clause addends
# (two addends, so the union-agg is commutative-exact across engines).
# Engine tier: plans/query.mixed_topk over the positional catalog,
# pytest-pinned to its single-clause plans; the CLI routes any
# partially-quoted query here.
# ---------------------------------------------------------------------------

MIXED_PHRASE, MIXED_TERM = ("query", "scan"), "merge"


def q_mixed_search(spark, sf_dir):
    import math as _math

    from .operators.phrase import phrase_match, token_positions

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pos = token_positions(docs)
    dl = pos.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n_docs = docs.count()
    avgdl = pos.count() / n_docs
    # phrase clause: virtual-term BM25 over adjacency starts
    matched = phrase_match(pos, list(MIXED_PHRASE))
    df_p = matched.count()
    idf_p = _math.log((n_docs - df_p + 0.5) / (df_p + 0.5) + 1.0)
    wp = (F.col("ptf") * F.lit(K1 + 1.0)) / (
        F.col("ptf") + F.lit(K1) * (F.lit(1.0 - B)
                                    + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    phrase_part = (matched.join(dl, "doc_id")
                   .select("doc_id", (F.lit(idf_p) * wp).alias("score")))
    # loose-term clause: plain BM25
    postings = pos.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    tdf = (dictionary.filter(F.col("term") == MIXED_TERM)
           .withColumn("idf", F.log(
               (F.lit(float(n_docs)) - F.col("df") + 0.5)
               / (F.col("df") + 0.5) + 1.0)))
    wt = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    term_part = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
        .select("doc_id", (F.col("idf") * wt).alias("score"))
    )
    total = (term_part.unionByName(phrase_part)
             .groupBy("doc_id")
             .agg(F.round(F.sum("score"), 6).alias("score")))
    topk = total.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


SQL_MIXED_SEARCH = f"""
WITH {SQL_POS},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM pos2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM pos2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
m AS (
    SELECT p0.doc_id, p0.pos
    FROM pos2 p0
    JOIN pos2 p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
    WHERE p0.term = '{MIXED_PHRASE[0]}' AND p1.term = '{MIXED_PHRASE[1]}'
),
occ AS (SELECT doc_id, count(*)::BIGINT AS ptf FROM m GROUP BY 1),
pconst AS (
    SELECT c.n_docs, c.avgdl, (SELECT count(*) FROM occ)::DOUBLE AS df_p
    FROM consts c
),
phrase_part AS (
    SELECT o.doc_id,
           ln((pc.n_docs - pc.df_p + 0.5) / (pc.df_p + 0.5) + 1.0)
               * ((o.ptf * {K1 + 1.0}) /
                  (o.ptf + {K1} * ({1.0 - B} + {B} * (d.dl / pc.avgdl))))
               AS score
    FROM occ o JOIN dl d USING (doc_id) CROSS JOIN pconst pc
),
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM pos2 GROUP BY 1, 2),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term = '{MIXED_TERM}'
),
term_part AS (
    SELECT p.doc_id,
           q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
),
total AS (
    SELECT doc_id, round(sum(score), 6) AS score
    FROM (SELECT * FROM term_part UNION ALL SELECT * FROM phrase_part)
    GROUP BY 1
),
page AS (
    SELECT doc_id, score FROM total
    ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM page ORDER BY rank
"""


# ---------------------------------------------------------------------------
# boosted search (q66): Lucene 'term^w' clause weights — the boost
# multiplies that term's idf and nothing else, so engine tier (WAND +
# exhaustive, plans/query + operators/topk boosts=) and this SQL twin
# share one definition.  'batch^3 merge' ranks batch-heavy docs first.
# ---------------------------------------------------------------------------

BOOST_TERMS = {"batch": 3.0, "merge": 1.0}


def q_boosted_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame(
        [(t, w) for t, w in sorted(BOOST_TERMS.items())],
        "term string, boost double")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0) * F.col("boost"))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score")
    )


def _sql_boost_case() -> str:
    arms = " ".join(f"WHEN '{t}' THEN {w}"
                    for t, w in sorted(BOOST_TERMS.items()))
    return f"CASE d.term {arms} ELSE 1.0 END"


SQL_BOOSTED_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term,
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * ({_sql_boost_case()}) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(sorted(BOOST_TERMS))!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM scores ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# minimum_should_match (q67): OR-mode search keeping only docs matching
# >= m distinct query terms (Elasticsearch minimum_should_match; the
# middle ground between OR recall and AND precision).  Engine tier:
# bm25_topk_exhaustive(min_match=) filters the _nt column the scoring
# agg already computes.
# ---------------------------------------------------------------------------

MSM_TERMS, MSM_MIN = ("batch", "merge", "scan"), 2


def q_min_match(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in MSM_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = (
        matches.groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * w), 6).alias("score"),
             F.count("*").alias("_nt"))
        .filter(F.col("_nt") >= MSM_MIN)
        .select("doc_id", "score", F.col("_nt").cast("long").alias("n_terms"))
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "score", "n_terms")
    )


SQL_MIN_MATCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(MSM_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
    HAVING count(*) >= {MSM_MIN}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score, n_terms
FROM scores ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# hybrid BM25 + vector search via RRF (q68): the two retrieval legs
# (lexical BM25 top-50, embedding-cosine top-50, joined on the
# doc_id == vec_id ingest contract) fuse by reciprocal-rank sum
# 1/(60+rank) — plans/hybrid.rrf_fuse IS the fused scorer under test;
# DuckDB re-derives both legs, both rank lists, and the fusion.  Each
# leg ranks on its ROUND(,6) score so near-ties resolve identically in
# both engines (doc_id tie-break), and the RRF sum has exactly two
# rank-derived addends, so it is commutative-exact.
# ---------------------------------------------------------------------------

HYBRID_TERMS, HYBRID_DEPTH = ("batch", "merge"), 50


def q_hybrid_rrf(spark, sf_dir):
    from .operators.similarity import with_cosine
    from .plans.hybrid import rrf_fuse, with_rank

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in HYBRID_TERMS], "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    lex = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * w), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(HYBRID_DEPTH)
    )
    emb = _embs(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    vec = (
        with_cosine(emb.filter(F.col("vec_id") != 0), "embedding",
                    [float(x) for x in qvec])
        .select(F.col("vec_id").alias("doc_id"),
                F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(HYBRID_DEPTH)
    )
    fused = rrf_fuse(
        [with_rank(lex, "score", depth=HYBRID_DEPTH),
         with_rank(vec, "cosine", depth=HYBRID_DEPTH)],
        k=10)
    # rank on the EXACT fused sum; round only the emitted column
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", F.round("score", 6).alias("score"))
    )


SQL_HYBRID_RRF = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(HYBRID_TERMS)!r}
),
lex AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
lexr AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM lex QUALIFY rank <= {HYBRID_DEPTH}
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
vec AS (
    SELECT e.vec_id AS doc_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
               AS cosine
    FROM embeddings e, qv q
    WHERE e.vec_id <> 0
),
vecr AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM vec QUALIFY rank <= {HYBRID_DEPTH}
),
fused AS (
    SELECT doc_id, sum(1.0 / (60.0 + rank)) AS s
    FROM (SELECT * FROM lexr UNION ALL SELECT * FROM vecr)
    GROUP BY doc_id
),
page AS (
    -- order/limit on the EXACT sum (like the engine's rrf_fuse);
    -- round only for the emitted column
    SELECT doc_id, round(s, 6) AS score, s FROM fused
    ORDER BY s DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY s DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM page ORDER BY rank
"""


# ---------------------------------------------------------------------------
# significant terms (q69): Elasticsearch's significant_terms aggregation
# with the JLH heuristic — terms overrepresented in a FOREGROUND doc set
# (here the lang='es' metadata slice) relative to the whole corpus.
# operators/cooccur.significant_terms IS the operator under test; DuckDB
# re-derives fg/bg rates and the (fg-bg)*(fg/bg) score.  df counting is
# set-semantics (distinct (term, doc)), matching the dictionary.
# ---------------------------------------------------------------------------

SIG_FG_LANG, SIG_MIN_FG, SIG_TOP = "es", 2, 10


def q_significant_terms(spark, sf_dir):
    from .operators.cooccur import significant_terms

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    p = toks.select("term", "doc_id").distinct()
    dictionary = p.groupBy("term").agg(F.count("*").alias("df"))
    fg_docs = docs.filter(F.col("lang") == SIG_FG_LANG).select("doc_id")
    return significant_terms(p, dictionary, n_docs, fg_docs,
                             min_fg=SIG_MIN_FG, top_n=SIG_TOP)


SQL_SIGNIFICANT_TERMS = f"""
WITH {SQL_TOKS},
p AS (SELECT DISTINCT term, doc_id FROM toks2),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM documents
            WHERE lang = '{SIG_FG_LANG}')::DOUBLE AS n_fg
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
fg AS (
    SELECT p.term, count(*)::BIGINT AS n_fg_term
    FROM p
    JOIN documents d ON d.doc_id = p.doc_id AND d.lang = '{SIG_FG_LANG}'
    GROUP BY 1
    HAVING count(*) >= {SIG_MIN_FG}
),
scored AS (
    SELECT fg.term, fg.n_fg_term, dict.df,
           round(((fg.n_fg_term / c.n_fg) - (dict.df / c.n_docs))
                 * ((fg.n_fg_term / c.n_fg) / (dict.df / c.n_docs)), 6)
               AS jlh
    FROM fg
    JOIN dict ON dict.term = fg.term
    CROSS JOIN consts c
    WHERE (fg.n_fg_term / c.n_fg) > (dict.df / c.n_docs)
)
SELECT term, n_fg_term, df, jlh
FROM scored
ORDER BY jlh DESC, term ASC
LIMIT {SIG_TOP}
"""


# ---------------------------------------------------------------------------
# regex search (q70): Lucene RegexpQuery — the pattern anchors to the
# WHOLE term, expands against the indexed vocabulary capped at the
# df-heaviest REGEX_MAX_EXP terms (df DESC, term ASC), then scores the
# expansion as OR-mode BM25 (the q50 prefix shape with regex-matched
# expansion).  plans/query.regex_topk is the compressed-index engine
# twin, whose literal-prefix pushdown prunes the dictionary scan.
# ---------------------------------------------------------------------------

REGEX_Q, REGEX_MAX_EXP = "s.*a.*", 3


def q_regex_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    expansion = (
        dictionary.filter(F.col("term").rlike(f"^(?:{REGEX_Q})$"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(REGEX_MAX_EXP)
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    matches = (
        postings.join(F.broadcast(expansion.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_REGEX_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE regexp_full_match(d.term, '{REGEX_Q}')
    ORDER BY d.df DESC, d.term ASC
    LIMIT {REGEX_MAX_EXP}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q71 wildcard search — leading-wildcard '*er' (the shape a prefix scan
# can't serve): expansion = terms ENDING with the literal, capped to the
# df-heaviest W_MAX_EXP (cap 2 deliberately trims the third match, so the
# deterministic df DESC / term ASC contract is itself under test), then
# the expansion scores as an OR-mode BM25 query — plans/rank.py
# expand_wildcard/wildcard_topk semantics on the oracle-tier tables.
# ---------------------------------------------------------------------------

W_SUFFIX, W_MAX_EXP = "er", 2


def q_wildcard_search(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    # the reversed-dictionary expansion shape (plans/rank.py
    # reversed_dictionary): '*er' becomes StartsWith('re') on rterm —
    # on the catalog's persisted rterm-sorted table this prunes row
    # groups; here the projection is in-memory so the result (not the
    # pushdown) is what the oracle checks
    rdict = dictionary.select(
        F.reverse(F.col("term")).alias("rterm"), "term", "df")
    expansion = (
        rdict.filter(F.col("rterm").startswith(W_SUFFIX[::-1]))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(W_MAX_EXP)
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    matches = (
        postings.join(F.broadcast(expansion.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_WILDCARD_SEARCH = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term LIKE '%{W_SUFFIX}'
    ORDER BY d.df DESC, d.term ASC
    LIMIT {W_MAX_EXP}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score,
           count(*)::BIGINT AS n_terms
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q72 LM-Dirichlet ranking — the plans/rank.lm_dirichlet_topk scorer
# (Zhai & Lafferty query-likelihood, Lucene LMDirichletSimilarity) on the
# oracle-tier tables: per matched (term, doc)
#     ln(1 + tf/(mu*cf/T)) + ln(mu/(dl+mu)),
# cf = collection frequency, T = total tokens.  Scores are raw
# log-likelihood deltas and may be negative; both engines round(_, 6)
# (JVM/DuckDB ln differ in the last ulp).
# ---------------------------------------------------------------------------

LM_TERMS, LM_MU = ("stream", "window"), 2000.0


def q_lm_dirichlet(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    total = float(toks.count())
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    pruned = postings.filter(F.col("term").isin(list(LM_TERMS)))
    cf = pruned.groupBy("term").agg(F.sum("tf").alias("cf"))
    matches = (pruned.join(F.broadcast(cf), "term").join(dl, "doc_id"))
    addend = (
        F.log(F.lit(1.0) + F.col("tf")
              / (F.lit(LM_MU) * (F.col("cf") / F.lit(total))))
        + F.log(F.lit(LM_MU) / (F.col("dl") + F.lit(LM_MU)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(addend), 6).alias("score"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "n_terms", "score")
    )


SQL_LM_DIRICHLET = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (SELECT (SELECT count(*) FROM toks2)::DOUBLE AS total),
pruned AS (SELECT * FROM postings
           WHERE term IN ('{LM_TERMS[0]}', '{LM_TERMS[1]}')),
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM pruned GROUP BY 1),
scores AS (
    SELECT p.doc_id,
           round(sum(ln(1.0 + p.tf / ({LM_MU} * (cf.cf / c.total)))
                     + ln({LM_MU} / (dl.dl + {LM_MU}))), 6) AS score,
           count(*)::BIGINT AS n_terms
    FROM pruned p
    JOIN cf ON p.term = cf.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_terms, score
FROM scores
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q73 term vectors — plans/rank.term_vector (Elasticsearch _termvectors):
# one row per distinct term of one document with tf and the sorted
# 0-based positions array.  Spark posexplode is 0-based; DuckDB
# generate_subscripts is 1-based, hence the pos - 1 in the twin.
# ---------------------------------------------------------------------------

TV_DOC = 7


def q_term_vectors(spark, sf_dir):
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") == TV_DOC)
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(
                    F.trim(F.regexp_replace(
                        F.lower(F.col("text")), _NORM_RE, " ")),
                    r"\s+",
                )
            ).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    return (
        pos.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("long")))
            .alias("positions"),
        )
        .select("term", "tf", "positions")
    )


SQL_TERM_VECTORS = f"""
WITH seq AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents
    WHERE doc_id = {TV_DOC}
),
pos0 AS (
    SELECT doc_id, unnest(tokens) AS term,
           generate_subscripts(tokens, 1) AS pos
    FROM seq
),
pos2 AS (SELECT doc_id, term, pos FROM pos0 WHERE term <> '')
SELECT term, count(*)::BIGINT AS tf,
       list_sort(list(pos - 1)) AS positions
FROM pos2
GROUP BY term
"""


# ---------------------------------------------------------------------------
# q74 two-phase rescore — plans/rank.rescore_topk (Elasticsearch
# ``rescore`` with a match_phrase window): BM25 OR first pass over
# (hash, join), top RS_N candidates by ROUNDED score (the cross-engine
# cut must not depend on the last ulp of ln), then a phrase-adjacency
# boost  score = round(score_first + RS_W * ln(1 + ptf), 6)  computed
# only for the bounded candidate window.
# ---------------------------------------------------------------------------

RS_T0, RS_T1, RS_N, RS_W = "hash", "join", 50, 2.0


def q_rescore(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(
                    F.trim(F.regexp_replace(
                        F.lower(F.col("text")), _NORM_RE, " ")),
                    r"\s+",
                )
            ).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    toks = pos.select("doc_id", "term")
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    q_terms = (
        dictionary.filter(F.col("term").isin([RS_T0, RS_T1]))
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    first = (
        postings.join(F.broadcast(q_terms.select("term", "idf")), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * w), 6).alias("score_first"))
        .orderBy(F.col("score_first").desc(), F.col("doc_id").asc())
        .limit(RS_N)
    )
    p0 = pos.filter(F.col("term") == RS_T0).select("doc_id", "pos")
    p1 = pos.filter(F.col("term") == RS_T1).select(
        F.col("doc_id").alias("d1"), (F.col("pos") - 1).alias("pos"))
    occ = (
        p0.join(p1, (F.col("doc_id") == F.col("d1"))
                & (p0["pos"] == p1["pos"]))
        .groupBy("doc_id").agg(F.count("*").cast("long").alias("ptf"))
    )
    cand = (
        first.join(occ, "doc_id", "left").fillna(0, subset=["ptf"])
        .withColumn("score", F.round(
            F.col("score_first")
            + F.lit(RS_W) * F.log(F.lit(1.0) + F.col("ptf")), 6))
    )
    topk = cand.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "ptf", "score_first", "score")
    )


SQL_RESCORE = f"""
WITH {SQL_POS},
toksr AS (SELECT doc_id, term FROM pos2),
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toksr GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toksr GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toksr)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN ('{RS_T0}', '{RS_T1}')
),
first AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score_first
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
    ORDER BY score_first DESC, p.doc_id ASC
    LIMIT {RS_N}
),
occ AS (
    SELECT p0.doc_id, count(*)::BIGINT AS ptf
    FROM pos2 p0
    JOIN pos2 p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
    WHERE p0.term = '{RS_T0}' AND p1.term = '{RS_T1}'
    GROUP BY p0.doc_id
),
cand AS (
    SELECT f.doc_id, coalesce(o.ptf, 0)::BIGINT AS ptf, f.score_first,
           round(f.score_first + {RS_W} * ln(1.0 + coalesce(o.ptf, 0)), 6)
               AS score
    FROM first f LEFT JOIN occ o ON f.doc_id = o.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, ptf, score_first, score
FROM cand
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q75 nested boolean expression — plans/boolquery.py semantics on the
# oracle-tier tables: "(data OR stream) AND NOT merge".  Candidate
# universe = docs matching >= 1 positive term; the expression evaluates
# over per-doc presence flags (one conditional hash agg); prohibited
# terms gate membership but never score (Lucene MUST_NOT).
# ---------------------------------------------------------------------------

BOOL_POS, BOOL_NEG = ("data", "stream"), "merge"


def q_bool_expr(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    all_terms = [BOOL_POS[0], BOOL_POS[1], BOOL_NEG]
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    q_terms = (
        dictionary.filter(F.col("term").isin(all_terms))
        .withColumn("idf", F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5) + 1.0))
    )
    matches = (
        postings.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(q_terms.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    contrib = F.when(F.col("term").isin(list(BOOL_POS)),
                     F.col("idf") * w).otherwise(F.lit(0.0))
    per_doc = matches.groupBy("doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score"),
        F.max(F.when(F.col("term") == BOOL_POS[0], 1).otherwise(0)).alias("m0"),
        F.max(F.when(F.col("term") == BOOL_POS[1], 1).otherwise(0)).alias("m1"),
        F.max(F.when(F.col("term") == BOOL_NEG, 1).otherwise(0)).alias("mn"),
    )
    qualified = per_doc.filter(
        ((F.col("m0") == 1) | (F.col("m1") == 1)) & (F.col("mn") == 0))
    topk = (qualified.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(10))
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .withColumn("n_pos", (F.col("m0") + F.col("m1")).cast("long"))
        .select("rank", "doc_id", "n_pos", "score")
    )


SQL_BOOL_EXPR = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN ('{BOOL_POS[0]}', '{BOOL_POS[1]}', '{BOOL_NEG}')
),
per_doc AS (
    SELECT p.doc_id,
           round(sum(CASE WHEN p.term IN ('{BOOL_POS[0]}', '{BOOL_POS[1]}')
                 THEN q.idf * ((p.tf * {K1 + 1.0}) /
                      (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))
                 ELSE 0.0 END), 6) AS score,
           max(CASE WHEN p.term = '{BOOL_POS[0]}' THEN 1 ELSE 0 END) AS m0,
           max(CASE WHEN p.term = '{BOOL_POS[1]}' THEN 1 ELSE 0 END) AS m1,
           max(CASE WHEN p.term = '{BOOL_NEG}' THEN 1 ELSE 0 END) AS mn
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
qualified AS (
    SELECT doc_id, score, (m0 + m1)::BIGINT AS n_pos
    FROM per_doc
    WHERE (m0 = 1 OR m1 = 1) AND mn = 0
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, n_pos, score
FROM qualified
ORDER BY rank
LIMIT 10
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# date-histogram facet (q76): the Elasticsearch ``date_histogram``
# aggregation over a query's FULL match set — "when was this topic
# crawled?".  Unlike q54 (facets over a <=k ranked page) a histogram
# needs every hit, so the plan is the shared scoring core -> one
# doc_id-keyed dimension join -> one tiny partial+final hash agg on the
# derived month bucket.  The testdata documents table carries no
# timestamp, so a deterministic crawl date is synthesized from doc_id
# (same convention as q02's synthesized urls); the engine tier is
# plans/query.facet_date_histogram, which this entry calls directly so
# the driver hash-checks the engine function itself.
# ---------------------------------------------------------------------------

DATEFACET_TERMS = ("query", "window")


def q_date_facet(spark, sf_dir):
    from .plans.query import facet_date_histogram

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in DATEFACET_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    dims = docs.select(
        "doc_id",
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   (F.col("doc_id") % 365).cast("int")).alias("crawl_date"))
    return facet_date_histogram(scores, dims, ts_col="crawl_date",
                                granularity="month")


SQL_DATE_FACET = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(DATEFACET_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
)
SELECT strftime(date_trunc('month',
                DATE '2024-01-01' + (d.doc_id % 365)::INT), '%Y-%m')
           AS bucket,
       count(*)::BIGINT AS n_docs,
       round(avg(s.score), 6) AS avg_score,
       round(max(s.score), 6) AS top_score
FROM scores s JOIN documents d ON d.doc_id = s.doc_id
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# diversified top-k (q77): the "at most N results per site" SERP rule —
# field collapsing generalized to a per-key CAP (Elasticsearch
# ``collapse`` + ``inner_hits``-sized pages).  Same
# full-candidate-set-before-cut rule as q61; the per-source rank window
# is hash-partitioned on the key.  The engine tier
# (plans/query.collapse_by_domain(per_domain=N), url host as the key) is
# pytest-checked; this entry runs the SQL-parity inline plan on the
# testdata ``source`` column (the q79 split).  ``slot`` is the doc's
# position within its source (1..cap) so the cap itself is
# hash-checked, not just the final page.
# ---------------------------------------------------------------------------

DIVERSE_TERMS, DIVERSE_CAP, DIVERSE_K = ("data", "stream"), 2, 10


def q_diversified_topk(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in DIVERSE_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    cand = docs.select("doc_id", "source").join(scores, "doc_id")
    capped = (
        cand.withColumn("slot", F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("score").desc(), F.col("doc_id").asc())).cast("long"))
        .filter(F.col("slot") <= DIVERSE_CAP)
    )
    topk = capped.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()).limit(DIVERSE_K)
    win = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "doc_id", "source", "slot", "score")
    )


SQL_DIVERSIFIED_TOPK = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(DIVERSE_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
capped AS (
    SELECT d.doc_id, d.source, s.score,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY s.score DESC, d.doc_id ASC)::BIGINT
               AS slot
    FROM documents d JOIN scores s ON s.doc_id = d.doc_id
    QUALIFY slot <= {DIVERSE_CAP}
),
page AS (
    SELECT doc_id, source, slot, score FROM capped
    ORDER BY score DESC, doc_id ASC LIMIT {DIVERSE_K}
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, source, slot, score
FROM page
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# recency-decayed ranking (q78): Elasticsearch ``function_score``
# exponential date decay, multiply mode — fresh pages outrank stale
# ones at equal relevance.  The decay applies over the FULL match set
# BEFORE the top-k cut (a pre-cut page could be all stale docs).
# Engine tier: plans/query.recency_boosted_topk; the decay constant
# ln(0.5)/half_life is computed once in Python and embedded as the
# same double literal in the SQL twin, so exp() sees bit-identical
# inputs on both engines.  Crawl dates are synthesized from doc_id
# (same convention as q76); urls from source+doc_id (q02 convention).
# ---------------------------------------------------------------------------

RECENCY_TERMS = ("data", "index")
RECENCY_ORIGIN, RECENCY_HL = "2025-01-01", 60.0
_RECENCY_LAM = math.log(0.5) / RECENCY_HL


def q_recency_topk(spark, sf_dir):
    from .plans.query import recency_boosted_topk

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    n_docs = docs.count()
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = toks.count() / n_docs
    dictionary = postings.groupBy("term").agg(F.count("*").alias("df"))
    terms = spark.createDataFrame([(t,) for t in RECENCY_TERMS],
                                  "term string")
    tdf = dictionary.join(F.broadcast(terms), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                     / (F.col("df") + 0.5) + 1.0))
    matches = (
        postings.join(F.broadcast(tdf.select("term", "idf")), "term")
        .join(dl, "doc_id")
    )
    w = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B)
                                   + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    )
    scores = matches.groupBy("doc_id").agg(
        F.round(F.sum(F.col("idf") * w), 6).alias("score"))
    dims = docs.select(
        "doc_id",
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   (F.col("doc_id") % 365).cast("int")).alias("crawl_date"))
    docs_url = docs.select(
        "doc_id",
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    return recency_boosted_topk(scores, dims, docs_url, k=10,
                                ts_col="crawl_date",
                                origin=RECENCY_ORIGIN,
                                half_life_days=RECENCY_HL)


SQL_RECENCY_TOPK = f"""
WITH {SQL_TOKS},
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY 1),
consts AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT count(*) FROM toks2)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
dict AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
q AS (
    SELECT d.term, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
    FROM dict d, consts c
    WHERE d.term IN {tuple(RECENCY_TERMS)!r}
),
scores AS (
    SELECT p.doc_id,
           round(sum(q.idf * ((p.tf * {K1 + 1.0}) /
                 (p.tf + {K1} * ({1.0 - B} + {B} * (dl.dl / c.avgdl))))), 6)
               AS score
    FROM postings p
    JOIN q ON p.term = q.term
    JOIN dl ON p.doc_id = dl.doc_id
    CROSS JOIN consts c
    GROUP BY p.doc_id
),
aged AS (
    SELECT s.doc_id,
           'https://' || d.source || '/doc/' || d.doc_id::VARCHAR AS url,
           round(s.score, 6) AS base_score,
           greatest(0, date_diff('day',
                 DATE '2024-01-01' + (d.doc_id % 365)::INT,
                 DATE '{RECENCY_ORIGIN}'))::INT AS age_days,
           round(s.score * exp({_RECENCY_LAM!r} * greatest(0,
                 date_diff('day', DATE '2024-01-01' + (d.doc_id % 365)::INT,
                           DATE '{RECENCY_ORIGIN}'))), 6) AS score
    FROM scores s JOIN documents d ON d.doc_id = s.doc_id
),
page AS (
    SELECT * FROM aged ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, url, base_score, age_days, score
FROM page
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# percolator / reverse search (q79): match documents against a registry
# of STANDING queries (Elasticsearch percolate / Lucene Monitor — the
# saved-search alerting shape).  The registry broadcasts and prunes the
# token stream map-side; the one shuffle is the (query_id, doc_id)
# distinct-term count agg.  Engine tier: operators/percolate.py (the
# stemmed path is pytest-checked against the engine index; this entry
# runs the unstemmed SQL-parity tier through the same operator).
# ---------------------------------------------------------------------------

PERCOLATE_QUERIES = {
    "alert_pipeline": "data stream",        # OR: any term triggers
    "alert_build": "index AND merge",       # AND: all terms required
    "alert_perf": "query optimizer",        # OR
}


def q_percolate(spark, sf_dir):
    from .operators.percolate import percolate, register_queries

    docs = _docs(spark, sf_dir)
    toks = _tokens(docs)
    registry = register_queries(spark, PERCOLATE_QUERIES, stem=False)
    return percolate(toks, registry)


def _percolate_values() -> str:
    import re
    rows = []
    for qid, qtext in sorted(PERCOLATE_QUERIES.items()):
        is_bool = "AND" in qtext.split()
        # the document tokenizer's punctuation rule (non-alnum -> space)
        # so a punctuated standing query matches the same tokens in the
        # Spark operator and this twin (round-4 ADVICE)
        words = re.sub(r"[^a-z0-9\s]", " ", qtext.lower()).split()
        terms = sorted(set(words) - {"and"} if is_bool else set(words))
        for t in terms:
            rows.append(f"('{qid}', '{t}', {len(terms)}, {str(is_bool).lower()})")
    return ", ".join(rows)


SQL_PERCOLATE = f"""
WITH {SQL_TOKS},
registry(query_id, term, n_terms, is_bool) AS (
    VALUES {_percolate_values()}
),
hits AS (
    SELECT r.query_id, t.doc_id,
           count(DISTINCT t.term)::INT AS n_matched,
           any_value(r.n_terms) AS need,
           any_value(r.is_bool) AS isb
    FROM toks2 t JOIN registry r ON t.term = r.term
    GROUP BY 1, 2
)
SELECT query_id, doc_id, n_matched
FROM hits
WHERE (NOT isb) OR n_matched = need
"""


def queries() -> dict:
    # Registration order rotated in round 6 (VERDICT r5 item #2): the
    # driver's correctness record holds at most 50 rows in registration
    # order, so under q01-first ordering the q52-q79 search-language
    # family could never earn a driver row.  q52-q79 register FIRST
    # this round; q01-q22 still fit in the 50-row window behind them,
    # and q24-q51 (all hash-green in CORRECTNESS_r05) stay covered by
    # the driver-mirror gate (tools/check_oracle.py).  Nothing about
    # any query's plan or oracle SQL changes — only dict order.
    return {
        "q52_fuzzy_search": q_fuzzy_search,
        "q53_more_like_this": q_more_like_this,
        "q54_facet_counts": q_facet_counts,
        "q55_related_terms": q_related_terms,
        "q56_zone_search": q_zone_search,
        "q57_spell_suggest": q_spell_suggest,
        "q58_snippets": q_snippets,
        "q59_search_after": q_search_after,
        "q60_explain": q_explain,
        "q61_collapse": q_collapse,
        "q62_autocomplete": q_autocomplete,
        "q63_synonym_search": q_synonym_search,
        "q64_filtered_search": q_filtered_search,
        "q65_mixed_search": q_mixed_search,
        "q66_boosted_search": q_boosted_search,
        "q67_min_match": q_min_match,
        "q68_hybrid_rrf": q_hybrid_rrf,
        "q69_significant_terms": q_significant_terms,
        "q70_regex_search": q_regex_search,
        "q71_wildcard_search": q_wildcard_search,
        "q72_lm_dirichlet": q_lm_dirichlet,
        "q73_term_vectors": q_term_vectors,
        "q74_rescore": q_rescore,
        "q75_bool_expr": q_bool_expr,
        "q76_date_facet": q_date_facet,
        "q77_diversified_topk": q_diversified_topk,
        "q78_recency_topk": q_recency_topk,
        "q79_percolate": q_percolate,
        "q01_scan_filter": q_scan_filter,
        "q02_url_defrag_valid": q_url_defrag_valid,
        "q03_dedup_first": q_dedup_first,
        "q04_postings": q_postings,
        "q05_token_filter": q_token_filter,
        "q06_dictionary": q_dictionary,
        "q07_stats": q_stats,
        "q08_bm25_topk": q_bm25_topk,
        "q09_boolean_and": q_boolean_and,
        "q10_topk_per_lang": q_topk_per_lang,
        "q11_exact_dups": q_exact_dups,
        "q12_ngram_jaccard_dups": q_ngram_jaccard_dups,
        "q13_minhash_signatures": q_minhash_signatures,
        "q14_simhash": q_simhash,
        "q15_knn_bruteforce": q_knn_bruteforce,
        "q16_embedding_dups": q_embedding_dups,
        "q17_langid": q_langid,
        "q18_quality": q_quality,
        "q19_token_counts": q_token_counts,
        "q20_fingerprint": q_fingerprint,
        "q21_media_meta": q_media_meta,
        "q22_media_features": q_media_features,
        # q23_wand_search retired (round 5): the stemmed synthetic-corpus
        # top-10 had no SQL twin by construction; the same compressed-index
        # WAND machinery is hash-checked by q27/q28/q29 and the stemmed
        # path stays covered by q24's self-verifying rank-identity check.
        "q24_wand_vs_exhaustive": q_wand_vs_exhaustive,
        "q25_extract_invariant": q_extract_invariant,
        "q26_weighted_topk": q_weighted_topk,
        "q27_wand_unstemmed": q_wand_unstemmed,
        "q28_wand_boolean": q_wand_boolean,
        "q29_wand_batch": q_wand_batch,
        "q30_knn_lsh": q_knn_lsh,
        "q31_events_window": q_events_window,
        "q32_sessionize": q_sessionize,
        "q33_lineitem_pricing": q_lineitem_pricing,
        "q34_top_customers": q_top_customers,
        "q35_ivf_topk": q_ivf_topk,
        "q36_dup_clusters": q_dup_clusters,
        "q37_repetition": q_repetition,
        "q38_source_stats": q_source_stats,
        "q39_split": q_split,
        "q40_stratified_sample": q_stratified_sample,
        "q41_pii_scrub": q_pii,
        "q42_decontaminate": q_decontam,
        "q43_pack_sequences": q_pack,
        "q44_curation_funnel": q_funnel,
        "q45_source_cap": q_source_cap,
        "q46_token_budget": q_token_budget,
        "q47_phrase_topk": q_phrase_topk,
        "q48_proximity": q_proximity,
        "q49_phrase_batch": q_phrase_batch,
        "q50_prefix_search": q_prefix_search,
        "q51_not_query": q_not_query,
    }


def oracle_sql() -> dict:
    return {
        "q01_scan_filter": SQL_SCAN_FILTER,
        "q02_url_defrag_valid": SQL_URL_DEFRAG_VALID,
        "q03_dedup_first": SQL_DEDUP_FIRST,
        "q04_postings": SQL_POSTINGS,
        "q05_token_filter": SQL_TOKEN_FILTER,
        "q06_dictionary": SQL_DICTIONARY,
        "q07_stats": SQL_STATS,
        "q08_bm25_topk": SQL_BM25_TOPK,
        "q09_boolean_and": SQL_BOOLEAN_AND,
        "q10_topk_per_lang": SQL_TOPK_PER_LANG,
        "q11_exact_dups": SQL_EXACT_DUPS,
        "q12_ngram_jaccard_dups": SQL_NGRAM_JACCARD,
        "q13_minhash_signatures": _sql_minhash(),
        "q14_simhash": _sql_simhash(),
        "q15_knn_bruteforce": SQL_KNN_BRUTEFORCE,
        "q16_embedding_dups": SQL_EMBEDDING_DUPS,
        "q17_langid": _sql_langid(),
        "q18_quality": _sql_quality(),
        "q19_token_counts": SQL_TOKEN_COUNTS,
        "q20_fingerprint": SQL_FINGERPRINT,
        "q21_media_meta": SQL_MEDIA_META,
        "q22_media_features": SQL_MEDIA_FEATURES,
        # q24/q25 are self-verifying empty-is-pass invariants; their
        # twins state that contract (zero rows, same schema) so the
        # driver records a hard hash row.  The stemmed/compressed WAND
        # machinery itself is hash-checked unstemmed by q27-q29.
        "q24_wand_vs_exhaustive": SQL_WAND_VS_EXHAUSTIVE_EMPTY,
        "q25_extract_invariant": SQL_EXTRACT_INVARIANT_EMPTY,
        "q26_weighted_topk": SQL_WEIGHTED_TOPK,
        "q27_wand_unstemmed": SQL_WAND_UNSTEMMED,
        "q28_wand_boolean": SQL_WAND_BOOLEAN,
        "q29_wand_batch": SQL_WAND_BATCH,
        "q30_knn_lsh": _sql_knn_lsh(),
        "q31_events_window": SQL_EVENTS_WINDOW,
        "q32_sessionize": SQL_SESSIONIZE,
        "q33_lineitem_pricing": SQL_LINEITEM_PRICING,
        "q34_top_customers": SQL_TOP_CUSTOMERS,
        "q35_ivf_topk": _sql_ivf_topk(),
        "q36_dup_clusters": SQL_DUP_CLUSTERS,
        "q37_repetition": SQL_REPETITION,
        "q38_source_stats": SQL_SOURCE_STATS,
        "q39_split": _sql_split(),
        "q40_stratified_sample": _sql_stratified_sample(),
        "q41_pii_scrub": _sql_pii(),
        "q42_decontaminate": _sql_decontam(),
        "q43_pack_sequences": _sql_pack(),
        "q44_curation_funnel": _sql_funnel(),
        "q45_source_cap": _sql_source_cap(),
        "q46_token_budget": _sql_token_budget(),
        "q47_phrase_topk": SQL_PHRASE_TOPK,
        "q48_proximity": SQL_PROXIMITY,
        "q49_phrase_batch": _sql_phrase_batch(),
        "q50_prefix_search": SQL_PREFIX_SEARCH,
        "q51_not_query": SQL_NOT_QUERY,
        "q52_fuzzy_search": SQL_FUZZY_SEARCH,
        "q53_more_like_this": SQL_MORE_LIKE_THIS,
        "q54_facet_counts": SQL_FACET_COUNTS,
        "q55_related_terms": SQL_RELATED_TERMS,
        "q56_zone_search": SQL_ZONE_SEARCH,
        "q57_spell_suggest": _sql_suggest(),
        "q58_snippets": SQL_SNIPPETS,
        "q59_search_after": SQL_SEARCH_AFTER,
        "q60_explain": SQL_EXPLAIN,
        "q61_collapse": SQL_COLLAPSE,
        "q62_autocomplete": SQL_AUTOCOMPLETE,
        "q63_synonym_search": _sql_synonym_search(),
        "q64_filtered_search": SQL_FILTERED_SEARCH,
        "q65_mixed_search": SQL_MIXED_SEARCH,
        "q66_boosted_search": SQL_BOOSTED_SEARCH,
        "q67_min_match": SQL_MIN_MATCH,
        "q68_hybrid_rrf": SQL_HYBRID_RRF,
        "q69_significant_terms": SQL_SIGNIFICANT_TERMS,
        "q70_regex_search": SQL_REGEX_SEARCH,
        "q71_wildcard_search": SQL_WILDCARD_SEARCH,
        "q72_lm_dirichlet": SQL_LM_DIRICHLET,
        "q73_term_vectors": SQL_TERM_VECTORS,
        "q74_rescore": SQL_RESCORE,
        "q75_bool_expr": SQL_BOOL_EXPR,
        "q76_date_facet": SQL_DATE_FACET,
        "q77_diversified_topk": SQL_DIVERSIFIED_TOPK,
        "q78_recency_topk": SQL_RECENCY_TOPK,
        "q79_percolate": SQL_PERCOLATE,
    }
