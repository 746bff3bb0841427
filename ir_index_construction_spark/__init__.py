"""PySpark-native inverted-index builder + BM25 top-k query engine.

Brand-new Spark-first engine with the query/data-processing capabilities of
arrrnav/IR-Index-Construction (surveyed in SURVEY.md): corpus ingest +
dedup + deterministic doc ids, weighted-zone HTML extraction, Porter
stemming, posting-list construction with head-term skew salting,
delta+varbyte compressed blocks with block-max metadata, BM25 (k1=1.2,
b=0.75) block-max WAND top-k, resumable checkpointed builds with lineage
and metrics tables — plus training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
