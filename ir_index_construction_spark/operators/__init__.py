"""DataFrame-level operators: corpus ingest, postings, compression, top-k,
dedup, similarity search, text analysis, multimodal plumbing."""
