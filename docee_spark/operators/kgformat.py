"""KG interchange formatting: the canonicalized vertex/edge tables
serialized as W3C N-Triples 1.1 lines — the standard handoff format to
triple stores / downstream graph tooling.

Everything is pure string-expression codegen (ordered ``replace``
chains — no regex, no Python), so at 100 TB the export is a map-only
projection fused into the scan, and the DuckDB oracle re-derives the
exact same lines with its own ``replace`` chain.

Grammar subset (https://www.w3.org/TR/n-triples/):
- subjects/predicates/objects of edge rows are IRIs minted under the
  ``urn:docee:`` namespace from canonical entity ids / predicate names;
- each vertex additionally emits an ``rdfs:label`` triple whose object
  is the surface as a quoted literal.

IRIREF allows raw non-ASCII (it is an IRI, not a URI) and forbids only
control chars, space and ``<>"{}|^`\\`` — those are percent-encoded
(backslash FIRST, so later escapes cannot be re-encoded; ``%`` itself is
encoded first of all so minted IRIs round-trip unambiguously). Literals
escape ``\\ " \\n \\r \\t`` per the ECHAR production.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: ordered (char, replacement) chains — order is part of the contract
#: and mirrored verbatim by the SQL oracle. ``%`` first (escape-char
#: injectivity), backslash before the rest for the same reason.
IRI_ESCAPES: tuple[tuple[str, str], ...] = (
    ("%", "%25"),
    ("\\", "%5C"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\t", "%09"),
    ("\n", "%0A"),
    ("\r", "%0D"),
)

LITERAL_ESCAPES: tuple[tuple[str, str], ...] = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)


def _chain(col: Column, pairs: tuple[tuple[str, str], ...]) -> Column:
    for src, dst in pairs:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def iri_encode(col: Column) -> Column:
    """Percent-encode the characters IRIREF forbids; non-ASCII passes
    through raw (legal in N-Triples 1.1 IRIs)."""
    return _chain(col, IRI_ESCAPES)


def literal_escape(col: Column) -> Column:
    """ECHAR-escape a string for use inside a quoted N-Triples literal."""
    return _chain(col, LITERAL_ESCAPES)


def _ent_iri(col: Column) -> Column:
    return F.concat(F.lit("<urn:docee:ent:"), iri_encode(col), F.lit(">"))


def to_ntriples(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """→ one ``line:string`` column of N-Triples statements: every edge
    as ``<ent:src> <pred:pred> <ent:dst> .`` plus one ``rdfs:label``
    statement per vertex carrying its representative surface. Map-only
    over both inputs (a union of two projections — no shuffle, no
    Python); duplicate edge provenance (doc_id/recguid) collapses into
    the same statement downstream semantics-wise, but lines are emitted
    per input row so the export is a pure projection (dedup is the
    consumer's choice; triple stores treat repeats as idempotent)."""
    edge_lines = edges.select(
        F.concat(
            _ent_iri(F.col("src")),
            F.lit(" <urn:docee:pred:"),
            iri_encode(F.col("pred")),
            F.lit("> "),
            _ent_iri(F.col("dst")),
            F.lit(" ."),
        ).alias("line")
    )
    label_lines = vertices.select(
        F.concat(
            _ent_iri(F.col("entity_id")),
            F.lit(" <http://www.w3.org/2000/01/rdf-schema#label> \""),
            literal_escape(F.col("surface")),
            F.lit('" .'),
        ).alias("line")
    )
    return edge_lines.unionAll(label_lines)
