"""Vectorized (Arrow-batched) Python function surface of the engine.

Exactly four Python crossings exist in the whole engine (SURVEY.md §2.1,
"UDF/UDAF/UDTF surface"); everything else is native Catalyst expressions:
  * url_parts_udf     — defrag + scheme/path split (urllib semantics)
  * extract_tokenize  — html -> text + per-doc term stats (mapInPandas)
  * encode_* / merge  — posting compression (applyInPandas, operators/compress.py)
  * wand scorer       — block-max WAND top-k (applyInPandas, operators/topk.py)
"""

from .udfs import url_parts_udf, make_extract_tokenize, extract_text_udf  # noqa: F401
