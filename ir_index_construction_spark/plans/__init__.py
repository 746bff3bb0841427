"""Logical plans: index build pipeline and query-time top-k retrieval."""
