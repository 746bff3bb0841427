"""Engine configuration: BM25 reference config, index layout, build knobs.

The reference scores tf-idf × tag-importance (searcher.py:123-143) and
defines no BM25; per BASELINE.json the engine's fixed reference config is
BM25 with k1=1.2, b=0.75.  idf = ln((N - df + 0.5)/(df + 0.5) + 1)
(the Robertson/Sparck-Jones formulation with the +1 positivity floor),
dl = count of kept (stemmed+filtered) tokens per document.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout of the inverted index.

    The index is DOCUMENT-SHARDED (shard = doc_id // shard_size): every
    shard holds all terms' postings for its doc range, so query-time WAND
    runs shard-local with a single global TakeOrdered merge — the layout
    that survives a 1000-executor scale-up (term-sharded layouts force a
    per-query score shuffle).  Within a shard, rows are term-sorted so
    parquet row-group min/max stats prune non-query terms.
    """

    shard_size: int = 1 << 20          # docs per shard (tune per corpus)
    block_size: int = 128              # postings per compressed block
    chunk_blocks: int = 1024           # blocks per index row (bounds row size)
    salt_buckets: int = 4              # head-term skew salt fan-out (phase-1)
    term_buckets: int = 16             # encode-group fan-out within a shard


@dataclass(frozen=True)
class BuildConfig:
    bm25: BM25Config = field(default_factory=BM25Config)
    index: IndexConfig = field(default_factory=IndexConfig)
    batch_docs: int = 0                # 0 = single ingest batch (small corpora)
    shuffle_partitions: int = 32
    # opt-in positional index: the tokenize stage also writes a
    # `positions` table (term, doc_id, kept-token ordinals) in the same
    # per-batch transaction, enabling exact-phrase / proximity queries
    # (plans/query.phrase_topk_indexed).  Off by default — positions
    # roughly double the tokenize stage's shuffled bytes.
    positions: bool = False


DEFAULT_BUILD = BuildConfig()


def small_scale(shard_size: int = 128, salt_buckets: int = 4,
                block_size: int = 16, chunk_blocks: int = 4,
                term_buckets: int = 4) -> BuildConfig:
    """Config for local tests: tiny shards/blocks/chunks so the sharding,
    salting, blocking and chunking code paths are all exercised at a
    few-hundred-doc scale."""
    return BuildConfig(
        index=IndexConfig(
            shard_size=shard_size,
            block_size=block_size,
            chunk_blocks=chunk_blocks,
            salt_buckets=salt_buckets,
            term_buckets=term_buckets,
        )
    )
