"""RDF/XML-subset reader — enough to load OWL-API-serialized ontologies
(e.g. the reference's 628 KB ro-merged.owl test TBox).

Covers the striped node/property syntax the OWL API emits: typed node
elements and rdf:Description, rdf:about / rdf:nodeID / rdf:resource,
nested node elements, rdf:parseType="Collection" (materialized as
rdf:first/rdf:rest lists with fresh bnodes), typed/lang/plain literals.
NOT covered: rdf:ID, rdf:li containers, reification attributes, xml:base
relative resolution (OWL-API output uses absolute IRIs).

Driver-side (xml.etree) by design — an ontology TBox is small; the
distributed ingestion path is N-Triples/parquet (sources/ntriples.py).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from arachne_spark.model import encode_iri, encode_literal

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF = "{" + RDF_NS + "}"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

RDF_TYPE = encode_iri(RDF_NS + "type")
RDF_FIRST = encode_iri(RDF_NS + "first")
RDF_REST = encode_iri(RDF_NS + "rest")
RDF_NIL = encode_iri(RDF_NS + "nil")


def _tag_iri(tag: str) -> str:
    # ElementTree tag format: {namespace}local
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _Reader:
    def __init__(self) -> None:
        self.triples: list[tuple[str, str, str]] = []
        self._anon = 0

    def fresh_bnode(self) -> str:
        self._anon += 1
        return f"_:rx{self._anon}"

    def node(self, el: ET.Element) -> str:
        """Process a node element; return its subject term."""
        about = el.get(_RDF + "about")
        node_id = el.get(_RDF + "nodeID")
        if about is not None:
            subj = encode_iri(about)
        elif node_id is not None:
            subj = f"_:{node_id}"
        else:
            subj = self.fresh_bnode()
        tag = _tag_iri(el.tag)
        if tag != RDF_NS + "Description":
            self.triples.append((subj, RDF_TYPE, encode_iri(tag)))
        for prop in el:
            self.property(subj, prop)
        return subj

    def property(self, subj: str, el: ET.Element) -> None:
        pred = encode_iri(_tag_iri(el.tag))
        res = el.get(_RDF + "resource")
        node_id = el.get(_RDF + "nodeID")
        parse_type = el.get(_RDF + "parseType")
        dtype = el.get(_RDF + "datatype")
        lang = el.get(XML_LANG)
        if res is not None:
            self.triples.append((subj, pred, encode_iri(res)))
            return
        if node_id is not None:
            self.triples.append((subj, pred, f"_:{node_id}"))
            return
        if parse_type == "Collection":
            items = [self.node(child) for child in el]
            head: str = RDF_NIL
            for item in reversed(items):
                cell = self.fresh_bnode()
                self.triples.append((cell, RDF_FIRST, item))
                self.triples.append((cell, RDF_REST, head))
                head = cell
            self.triples.append((subj, pred, head))
            return
        children = list(el)
        if children:
            # striped syntax: exactly one nested node element
            obj = self.node(children[0])
            self.triples.append((subj, pred, obj))
            return
        text = el.text or ""
        self.triples.append(
            (subj, pred, encode_literal(text, dt=dtype, lang=lang))
        )


def parse_rdfxml(source: str) -> list[tuple[str, str, str]]:
    """RDF/XML file path or XML string -> encoded (s, p, o) triples."""
    root = (
        ET.fromstring(source)
        if source.lstrip().startswith("<")
        else ET.parse(source).getroot()
    )
    if _tag_iri(root.tag) != RDF_NS + "RDF":
        raise ValueError(f"not an rdf:RDF document: {root.tag}")
    r = _Reader()
    for el in root:
        r.node(el)
    return r.triples


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """Read one RDF/XML file into the encoded 3-column engine schema."""
    from arachne_spark.engine import TRIPLE_SCHEMA

    return spark.createDataFrame(parse_rdfxml(path), TRIPLE_SCHEMA)
