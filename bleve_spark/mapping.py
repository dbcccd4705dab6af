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
