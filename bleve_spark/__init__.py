"""bleve_spark — a PySpark-native full-text indexing & search engine.

From-scratch re-creation of the capabilities of the reference engine
(metonymic-smokey/bleve, /root/reference — a Go single-node library) as an
idiomatic Spark pipeline: analysis chains as Arrow-batched pandas UDFs,
the inverted index as partitioned parquet tables of compressed posting
blocks, and queries as declarative DataFrame plans (joins/unions/top-k)
that Catalyst optimizes. See SURVEY.md for the operator-by-operator map.
"""

from .alias import IndexAlias
from .api import Index
from .build import IndexBuilder, assign_docids, drop_index
from .highlight import HighlightRequest
from .index import SearchIndex
from .mapping import (
    COSINE,
    COSINE_SIMILARITY,
    DEFAULT_SIMILARITY_METRIC,
    EUCLIDEAN_DISTANCE,
    FieldMapping,
    IndexMapping,
    code_corpus_mapping,
    documents_mapping,
    validate_vector_field,
)
from .query import parse_query
from .search import (
    FacetRequest,
    KNNRequest,
    Searcher,
    SearchRequest,
    TooManyClausesError,
)
from .writer import IndexWriter

__all__ = [
    "Index",
    "HighlightRequest",
    "IndexAlias",
    "IndexWriter",
    "IndexBuilder",
    "SearchIndex",
    "Searcher",
    "SearchRequest",
    "FacetRequest",
    "IndexMapping",
    "FieldMapping",
    "code_corpus_mapping",
    "documents_mapping",
    "validate_vector_field",
    "COSINE",
    "COSINE_SIMILARITY",
    "DEFAULT_SIMILARITY_METRIC",
    "EUCLIDEAN_DISTANCE",
    "assign_docids",
    "drop_index",
    "parse_query",
]

__version__ = "0.1.0"
