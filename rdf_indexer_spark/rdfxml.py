"""RDF/XML → triple stream (A-3).

The reference uses Sesame's SAX ``RDFXMLParser`` (``RdfDocumentParser.java:
50-63``); this module implements the RDF/XML subset its corpus actually uses —
typed node elements, ``rdf:about``/``rdf:resource``/``rdf:nodeID``, nested
blank nodes (the ``dc:date`` bnode pattern, D-4), literal property elements —
as a pure function over the file content, distributed with ``mapInPandas``.

Output is the long-form triple DataFrame of FIXTURES.md §2:
``(file, subject, predicate, object, is_literal, pos)``; ``pos`` preserves
document order, which the field semantics require (F-9, G-1, G-2).

Parse failures become error rows (same contract as the reference's
ParseListener, ``RdfDocumentParser.java:142-166`` — parsing never throws).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from typing import Any

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
_TAG_RE = re.compile(r"^\{(.*)\}(.*)$")

try:
    from pyspark.sql.types import (
        BooleanType, IntegerType, StructField, StructType, StringType,
    )

    TRIPLE_SCHEMA = StructType([
        StructField("file", StringType()),
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object", StringType()),
        StructField("is_literal", BooleanType()),
        StructField("pos", IntegerType()),
    ])
    ERROR_SCHEMA = StructType([
        StructField("file", StringType()),
        StructField("uri", StringType()),
        StructField("message", StringType()),
    ])
    HAVE_SPARK = True
except ImportError:  # pragma: no cover
    HAVE_SPARK = False


def _split_tag(tag: str) -> tuple[str, str]:
    m = _TAG_RE.match(tag)
    if m:
        return m.group(1), m.group(2)
    return "", tag


class _TripleSink:
    def __init__(self, file_name: str, base_uri: str):
        self.file = file_name
        self.base = base_uri
        self.triples: list[dict[str, Any]] = []
        self.pos = 0
        self.bnode_counter = 0

    def emit(self, s: str, p: str, o: str, is_literal: bool) -> None:
        self.triples.append({
            "file": self.file, "subject": s, "predicate": p,
            "object": o, "is_literal": is_literal, "pos": self.pos,
        })
        self.pos += 1

    def new_bnode(self) -> str:
        self.bnode_counter += 1
        return f"_:b{self.bnode_counter}"

    def resolve(self, uri: str) -> str:
        if "://" in uri or uri.startswith("urn:"):
            return uri
        return self.base + uri


def _node_subject(elem: ET.Element, sink: _TripleSink) -> str:
    about = elem.get(f"{{{RDF_NS}}}about")
    node_id = elem.get(f"{{{RDF_NS}}}nodeID")
    if about is not None:
        return sink.resolve(about)
    if node_id is not None:
        return "_:" + node_id
    return sink.new_bnode()


def _parse_node_element(elem: ET.Element, sink: _TripleSink) -> str:
    """A node element: subject + optional rdf:type from the element name."""
    subject = _node_subject(elem, sink)
    ns, local = _split_tag(elem.tag)
    if ns + local != RDF_NS + "Description":
        sink.emit(subject, RDF_TYPE, ns + local, False)
    for child in elem:
        _parse_property_element(subject, child, sink)
    return subject


def _parse_property_element(subject: str, elem: ET.Element, sink: _TripleSink) -> None:
    ns, local = _split_tag(elem.tag)
    predicate = ns + local
    resource = elem.get(f"{{{RDF_NS}}}resource")
    node_id = elem.get(f"{{{RDF_NS}}}nodeID")
    children = list(elem)
    if resource is not None:
        sink.emit(subject, predicate, sink.resolve(resource), False)
    elif node_id is not None:
        sink.emit(subject, predicate, "_:" + node_id, False)
    elif children:
        # nested node element(s) → blank-node (or about-identified) object;
        # emit the link triple BEFORE the nested content (SAX document order)
        for child in children:
            placeholder = len(sink.triples)
            obj_subject = _parse_node_element(child, sink)
            link = {
                "file": sink.file, "subject": subject, "predicate": predicate,
                "object": obj_subject, "is_literal": False, "pos": None,
            }
            sink.triples.insert(placeholder, link)
        for i, t in enumerate(sink.triples):
            t["pos"] = i
        sink.pos = len(sink.triples)
    else:
        sink.emit(subject, predicate, elem.text or "", True)


def find_invalid_escapes(content: str, file_name: str) -> list[dict[str, Any]]:
    """T-4: flag potentially invalid escape sequences in the RAW content
    (RdfDocumentParser.java:115-130): unescape XML entities, then every
    remaining ``&#`` — e.g. a double-escaped ``&amp;#38;`` or a malformed
    reference that survived unescaping — is reported with its position and
    a ±25-char snippet, scanning onward from pos+2."""
    from .analyzer import unescape_xml

    unescaped = unescape_xml(content)
    errors: list[dict[str, Any]] = []
    start = 0
    while True:
        pos = unescaped.find("&#", start)
        if pos == -1:
            break
        snip = unescaped[max(0, pos - 25): min(len(unescaped), pos + 25)]
        errors.append({
            "file": file_name, "uri": "",
            "message": (
                "Potentially Invalid Escape sequence.\n   Position: ["
                f"{pos}]\n   Snippet: [{snip}]"
            ),
        })
        start = pos + 2
    return errors


def parse_rdfxml(
    content: str, file_name: str
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse one RDF/XML document; never raises.

    Returns (triples, errors). The base URI for relative references is
    ``http://foo/<file>`` exactly as the reference passes it
    (``RdfDocumentParser.java:63``) — V-7 validation later flags any URI that
    still carries this fallback base. Raw content is first scanned for
    potentially invalid escapes (T-4, RdfDocumentParser.validateContent);
    those errors never abort the parse."""
    errors: list[dict[str, Any]] = list(find_invalid_escapes(content, file_name))
    sink = _TripleSink(file_name, "http://foo/" + file_name)
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        line, col = getattr(e, "position", (0, 0))
        errors.append({
            "file": file_name, "uri": "",
            "message": f"FATAL PARSE ERROR at line {line}, col {col} : {e.msg if hasattr(e, 'msg') else e}",
        })
        return [], errors
    ns, local = _split_tag(root.tag)
    if ns + local == RDF_NS + "RDF":
        for child in root:
            _parse_node_element(child, sink)
    else:
        _parse_node_element(root, sink)
    return sink.triples, errors


if HAVE_SPARK:
    import pandas as pd

    PARSED_SCHEMA = (
        "file string, subject string, predicate string, object string, "
        "is_literal boolean, pos int, error string"
    )

    def parse_rdfxml_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """``mapInPandas`` kernel: (file, content) rows → triple/error rows.

        Error rows carry NULL subject and a message in ``error``; downstream
        splits them (``fields.triples_and_errors``).
        """
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for file_name, content in zip(pdf["file"], pdf["content"]):
                triples, errors = parse_rdfxml(content or "", file_name)
                for t in triples:
                    t = dict(t)
                    t["error"] = None
                    rows.append(t)
                for e in errors:
                    rows.append({
                        "file": e["file"], "subject": None, "predicate": None,
                        "object": None, "is_literal": None, "pos": None,
                        "error": e["message"],
                    })
            yield pd.DataFrame(
                rows,
                columns=["file", "subject", "predicate", "object",
                         "is_literal", "pos", "error"],
            )

    def parse_files_df(files_df):
        """(file, content) DataFrame → long-form triples+errors DataFrame."""
        return files_df.mapInPandas(parse_rdfxml_batches, schema=PARSED_SCHEMA)
