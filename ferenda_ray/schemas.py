"""Arrow schemas + RDF vocabulary constants for every logical table.

Mirrors the reference's declared-schema approach (namespaces at
documentrepository.py:167-191, fulltext schema derivation at
fulltextindex.py:65-94) as plain ``pyarrow.Schema`` objects.
Predicates use CURIE strings (``dcterms:title``) — the vocabulary is
tiny, so the column dictionary-encodes well in Parquet.
"""

from __future__ import annotations

import pyarrow as pa

# --- namespaces (documentrepository.py:167-178) -------------------------
NS = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dcterms": "http://purl.org/dc/terms/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
    "bibo": "http://purl.org/ontology/bibo/",
    "schema": "http://schema.org/",
}

RDF_TYPE = "rdf:type"
DCTERMS_TITLE = "dcterms:title"
DCTERMS_IDENTIFIER = "dcterms:identifier"
DCTERMS_REFERENCES = "dcterms:references"
DCTERMS_SUBJECT = "dcterms:subject"
DCTERMS_ISPARTOF = "dcterms:isPartOf"
DCTERMS_ISSUED = "dcterms:issued"
PROV_GENERATED = "prov:wasGeneratedBy"
OWL_SAMEAS = "owl:sameAs"
BIBO_DOCUMENT = "bibo:Document"
BIBO_DOCPART = "bibo:DocumentPart"
BIBO_CHAPTER = "bibo:chapter"


def expand_curie(curie: str) -> str:
    """'dcterms:title' → full URI (for the N-Triples dump)."""
    if ":" in curie:
        pfx, local = curie.split(":", 1)
        if pfx in NS:
            return NS[pfx] + local
    return curie


# --- input table (BASELINE.json input_hint) -----------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# --- sections: flattened element tree (SURVEY §1.1) ---------------------
SECTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("section_uri", pa.string()),
        ("kind", pa.string()),  # body | preamble | section | subsection | subsubsection
        ("ordinal", pa.string()),
        ("title", pa.string()),
        ("parent_uri", pa.string()),
        ("text", pa.string()),
        ("position", pa.int32()),
    ]
)

# --- triples: the flagship output (SURVEY §1.1) -------------------------
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
        ("source_url", pa.string()),
    ]
)

# --- mentions (citationparser.py parse_recursive output shape) ----------
MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("section_uri", pa.string()),
        ("surface", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("kind", pa.string()),  # rfc | sec_rfc | url | entity | entity_fuzzy
        ("linked_uri", pa.string()),
        ("predicate", pa.string()),
    ]
)

# --- lineage manifest (FIXTURES.md §6) ----------------------------------
MANIFEST = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("stage", pa.string()),
        ("url_min", pa.string()),
        ("url_max", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("errors", pa.int64()),
        ("duration_s", pa.float64()),
        ("status", pa.string()),
    ]
)

# --- authority / gazetteer (FIXTURES.md §3) -----------------------------
AUTHORITY = pa.schema(
    [
        ("entity_uri", pa.string()),
        ("label", pa.string()),
        ("alt_labels", pa.list_(pa.string())),
        ("entity_type", pa.string()),
    ]
)

SAMEAS_EDGES = pa.schema([("uri_a", pa.string()), ("uri_b", pa.string())])
