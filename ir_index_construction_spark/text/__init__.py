"""Pure-Python text layer shared by the Spark UDFs and the oracle."""

from .extract import (  # noqa: F401
    extract_text,
    extract_text_and_zones,
    extract_zones,
    IMPORTANT_TAGS,
    DEFAULT_WEIGHT,
)
from .normalize import (  # noqa: F401
    index_normalize,
    query_normalize,
    is_valid_token,
    tokenize_stem_filter,
    doc_term_stats,
    defrag_url,
    is_valid_url,
    parse_query,
)
from .porter import stem, PorterStemmer, make_cached_stemmer  # noqa: F401
