"""Index/field mappings.

Declarative analogue of the reference's mapping layer
(/root/reference/mapping/index.go:45-58, mapping/document.go:42-51,
mapping/field.go:40-80). The input table is fixed-schema per the north
rule's input hint (repo, path, commit, lang, content), so the dynamic
JSON-walking half of the reference mapping is out of scope; the dataclass
shapes keep the reference's names.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

# Vector similarity metrics (ref: util/knn.go:20-38). The reference's
# names: "l2_norm" (euclidean, the DEFAULT) and "dot_product" (raw inner
# product — cosine similarity when vectors are unit-normalized, per the
# reference's own comment). "cosine" is an engine extension that
# normalizes explicitly (true cosine regardless of vector norms).
EUCLIDEAN_DISTANCE = "l2_norm"
COSINE_SIMILARITY = "dot_product"
COSINE = "cosine"
DEFAULT_SIMILARITY_METRIC = EUCLIDEAN_DISTANCE
SUPPORTED_SIMILARITY_METRICS = (
    EUCLIDEAN_DISTANCE,
    COSINE_SIMILARITY,
    COSINE,
)

MAX_VECTOR_DIMS = 2048  # ref: mapping/mapping_vectors.go:84-87


@dataclass
class FieldMapping:
    """ref: mapping/field.go:40-80."""

    name: str
    # text | keyword | numeric | datetime | boolean | geoshape | vector
    # (vector: array<float> column; the builder persists a multi-table
    # LSH bucket column the kNN route prefilters with)
    type: str = "text"
    analyzer: Optional[str] = None  # None -> IndexMapping.default_analyzer
    index: bool = True
    store: bool = True
    docvalues: bool = True
    include_term_vectors: bool = True  # positions in postings
    include_in_all: bool = True
    # vector fields only (ref: mapping/field.go:74-79 Dims/Similarity):
    # dims=0 is an engine extension meaning "infer from the data" (the
    # reference requires an explicit 0 < dims <= 2048)
    dims: int = 0
    similarity: str = ""  # "" -> DEFAULT_SIMILARITY_METRIC for vectors
    # Engine extension: declare the field's vectors unit-normalized.
    # Hyperplane LSH is an ANGULAR family — it only preserves angular
    # neighbors, so for dot_product (MIPS) the true max-inner-product
    # neighbor of non-unit vectors can sit in a never-probed bucket.
    # dot_product therefore takes the exact scan unless this opt-in
    # asserts ||v||=1 (where dot == cosine and the LSH route is sound).
    unit_norm: bool = False


def validate_vector_field(fm: FieldMapping) -> FieldMapping:
    """Port of validateVectorField (ref: mapping/mapping_vectors.go:83-110):
    bounds-check dims, default + validate the similarity metric, and
    force the options that don't apply to vector fields. Mutates and
    returns fm (matching the reference, which normalizes in place)."""
    if fm.dims < 0 or fm.dims > MAX_VECTOR_DIMS:
        raise ValueError(
            "invalid vector dimension, value should be in range "
            f"(0, {MAX_VECTOR_DIMS})"
        )
    if not fm.similarity:
        fm.similarity = DEFAULT_SIMILARITY_METRIC
    if fm.similarity not in SUPPORTED_SIMILARITY_METRICS:
        raise ValueError(
            f"invalid similarity metric: '{fm.similarity}', valid "
            f"metrics are: {list(SUPPORTED_SIMILARITY_METRICS)}"
        )
    # not applicable for vector fields — forced like the reference
    # (ref: mapping_vectors.go:93-99); the engine keeps store/docvalues
    # because the vector column itself is how scoring reads the data
    fm.include_in_all = False
    fm.include_term_vectors = False
    return fm


@dataclass
class IndexMapping:
    """ref: mapping/index.go:45-58."""

    fields: Dict[str, FieldMapping] = field(default_factory=dict)
    default_analyzer: str = "standard"  # ref: mapping/index.go:35
    default_field: str = "_all"  # ref: mapping/index.go:34
    compose_all: bool = False  # build the `_all` composite postings
    # infer text mappings for unmapped string columns at write time
    # (ref: mapping/document.go:427-437 Dynamic strings -> text)
    dynamic: bool = True

    def add(self, fm: FieldMapping) -> "IndexMapping":
        if fm.type == "vector":
            validate_vector_field(fm)
        self.fields[fm.name] = fm
        return self

    # -- persistence (the index_meta.json analogue, ref: index_meta.go) --

    def to_dict(self) -> dict:
        from dataclasses import asdict

        return {
            "fields": {n: asdict(fm) for n, fm in self.fields.items()},
            "default_analyzer": self.default_analyzer,
            "default_field": self.default_field,
            "compose_all": self.compose_all,
            "dynamic": self.dynamic,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "IndexMapping":
        m = cls(
            default_analyzer=d.get("default_analyzer", "standard"),
            default_field=d.get("default_field", "_all"),
            compose_all=bool(d.get("compose_all", False)),
            dynamic=bool(d.get("dynamic", True)),
        )
        for name, fd in d.get("fields", {}).items():
            m.add(FieldMapping(**fd))
        return m

    def analyzer_for(self, field_name: str) -> str:
        """ref: mapping/field.go:44-48 (field analyzer, else default)."""
        fm = self.fields.get(field_name)
        if fm is not None and fm.analyzer:
            return fm.analyzer
        return self.default_analyzer

    def text_fields(self) -> List[FieldMapping]:
        return [
            fm
            for fm in self.fields.values()
            if fm.index and fm.type in ("text", "keyword")
        ]

    def docvalue_fields(self) -> List[FieldMapping]:
        return [fm for fm in self.fields.values() if fm.docvalues]


def code_corpus_mapping() -> IndexMapping:
    """Default mapping for the north-rule corpus
    (repo, path, commit, lang, content)."""
    m = IndexMapping(default_analyzer="code")
    m.add(FieldMapping("content", analyzer="code"))
    m.add(FieldMapping("path", analyzer="keyword", include_in_all=False))
    m.add(FieldMapping("repo", analyzer="keyword", include_in_all=False))
    m.add(FieldMapping("lang", analyzer="keyword", include_in_all=False))
    m.add(
        FieldMapping(
            "commit", analyzer="keyword", index=False, include_in_all=False
        )
    )
    return m


def documents_mapping() -> IndexMapping:
    """Mapping for the driver's `documents` table (doc_id, text, lang,
    source, n_chars) with the DuckDB-oracle-exact analyzer."""
    m = IndexMapping(default_analyzer="whitespace_lower")
    m.add(FieldMapping("text", analyzer="whitespace_lower"))
    m.add(FieldMapping("lang", analyzer="keyword", include_in_all=False))
    m.add(FieldMapping("source", analyzer="keyword", include_in_all=False))
    return m
