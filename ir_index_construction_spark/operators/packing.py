"""Sequence packing: lay documents out into fixed-token training
sequences.

Training pipelines feed models fixed-length sequences (e.g. 2048
tokens); packing short documents together instead of padding each one
is the standard throughput lever (T5's "pack and chop": concatenate
the token stream, cut every `budget` tokens, a document may straddle a
cut).  The operator answers, for every document: which shard's stream
it lives in, where its tokens begin, and which sequence that is.

Scale shape: documents hash into `shards` independent streams (shard =
hash64(id) % shards), and the layout is a running token sum within
each shard — one hash partition + per-partition sort, no global
ordering anywhere.  Shards bound both parallelism and window state;
size `shards` to ~4x the executor-core count at the target scale.  The
assignment is a pure function of (seed, corpus membership): rerunning
on the same ids reproduces the identical layout bit-for-bit, which is
what makes packed-corpus checkpoint/resume and cross-run audits
possible (same property as operators/sampling.py, whose hash lane this
reuses).

The DuckDB oracle (q43) mirrors the arithmetic literally: same
md5-derived shard hash, same window frame, same integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _hash64
from .textstats import _tok_col


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   budget: int = 2048, shards: int = 64,
                   seed: int = 41) -> DataFrame:
    """(id, shard, n_tokens, seq_begin, seq_id, seq_off):

      shard      hash64(seed, id) % shards — which packing stream
      n_tokens   whitespace token count (the textstats lane)
      seq_begin  tokens laid out before this doc within its shard
                 (docs ordered by id — deterministic, rerun-stable)
      seq_id     seq_begin DIV budget — the training sequence the
                 doc's first token lands in
      seq_off    seq_begin % budget — offset inside that sequence
    """
    toks = F.filter(_tok_col(text_col), lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("id"),
        F.pmod(_hash64(F.col(id_col).cast("string"), seed),
               F.lit(shards)).cast("long").alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (Window.partitionBy("shard").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        base.withColumn("seq_begin",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr(f"CAST(seq_begin DIV {budget} AS BIGINT)"))
        .withColumn("seq_off", F.pmod("seq_begin", F.lit(budget)).cast("long"))
    )
