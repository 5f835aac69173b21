"""Ksoup-shaped top-level API — the reference's entry points with the
reference's names, so a ksoup user can switch with minimal relearning
(``Ksoup.kt`` surface; network fetchers are out of scope — input is
crawled Parquet).

    from ksoup_ray import api as Ksoup
    doc = Ksoup.parse("<p>One</p>")
    doc.select("p")[0].text()
    Ksoup.clean("<script>x</script><b>ok</b>", Ksoup.Safelist.basic())

For the distributed paths use ``ksoup_ray.pipelines`` /
``ksoup_ray.stages`` — a Dataset of pages, not one document.
"""

from __future__ import annotations

from .engine.charreader import CharacterReader
from .engine.dom import (Attribute, Attributes, Document, Element, Node,
                         OutputSettings, TextNode)
from .engine.elements import Elements
from .engine.streamparser import StreamParser
from .engine.parser import (
    clean,
    is_valid,
    parse,
    parse_body_fragment,
    parse_bytes,
    parse_fragment,
    parse_metadata,
    parse_xml,
    unescape_entities,
)
from .engine.safety import Cleaner, Safelist
from .engine.select import SelectorParseError, parse_query, select

__all__ = [
    "Attribute",
    "Attributes",
    "CharacterReader",
    "Cleaner",
    "Document",
    "Element",
    "Elements",
    "Node",
    "OutputSettings",
    "Safelist",
    "SelectorParseError",
    "StreamParser",
    "TextNode",
    "clean",
    "is_valid",
    "parse",
    "parse_body_fragment",
    "parse_bytes",
    "parse_fragment",
    "parse_metadata",
    "parse_query",
    "parse_xml",
    "select",
    "unescape_entities",
]
