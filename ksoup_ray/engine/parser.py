"""Parser facade — the Ksoup-level public API, one document at a time.

Semantics per reference ``Ksoup.kt`` + ``parser/Parser.kt``:

* ``parse(html, base_uri)`` → Document      (Ksoup.kt:31-36)
* ``parse_bytes(raw, base_uri, charset)``   (Ksoup.kt:67-74 + DataUtil)
* ``parse_fragment`` / ``parse_body_fragment`` (Parser.kt:193-245)
* ``parse_xml``                              (Parser.kt xmlParser)
* ``clean(body_html, safelist, base_uri)``   (Ksoup.kt:147-160)
* ``unescape_entities``                      (Parser.kt:253-261)
* ``parse_metadata``                         (Ksoup.kt:192-288)

These are the per-row kernels that the Ray stages call in a loop over
each Arrow batch; all heavy state (tag/entity/selector tables) is
module-level and built once per worker process.
"""

from __future__ import annotations

from .charset import decode_html
from .dom import Document, Element, Node, TextNode
from .safety import Cleaner, Safelist
from .treebuilder import HTML_DEFAULT, HtmlTreeBuilder, ParseSettings
from .xmlbuilder import XmlTreeBuilder
from . import entities as E


def parse(html, base_uri: str = "",
          settings: ParseSettings = HTML_DEFAULT,
          track_errors: bool = False, node_listener=None,
          max_nodes: int = 0) -> Document:
    if not isinstance(html, str):  # ported-io Reader drop-in
        from .io import Reader
        if isinstance(html, Reader):
            html = html.read_string(len(html._s) - html._pos)
    tb = HtmlTreeBuilder(settings, track_errors, node_listener=node_listener,
                         max_nodes=max_nodes)
    doc = tb.parse(html, base_uri)
    doc.parse_errors = len(tb.errors) + len(tb.tokeniser.errors)
    doc.error_list = (tb.errors + tb.tokeniser.errors) if track_errors else []
    return doc


def parse_bytes(raw: bytes, base_uri: str = "",
                charset: str | None = None,
                track_errors: bool = False) -> Document:
    """Byte stream → Document with charset detection (DataUtil.kt:38-45)."""
    text, used_charset = decode_html(raw, charset)
    doc = parse(text, base_uri, track_errors=track_errors)
    doc.output_settings.charset = used_charset
    return doc


def parse_xml(xml: str, base_uri: str = "",
              track_errors: bool = False) -> Document:
    tb = XmlTreeBuilder(track_errors=track_errors)
    doc = tb.parse(xml, base_uri)
    doc.parse_errors = len(tb.errors)
    return doc


def parse_fragment(fragment_html: str, context: Element | None,
                   base_uri: str = "") -> list[Node]:
    """Fragment parse in context, dispatching on the parser that built
    the context's owning document (NodeUtils.parser): an XML-parsed
    document re-parses fragments with the XML builder."""
    settings = HTML_DEFAULT
    if context is not None:
        doc = context.owner_document()
        owner_parser = getattr(doc, "parser", None) if doc is not None \
            else None
        if isinstance(owner_parser, XmlTreeBuilder):
            tb = XmlTreeBuilder(settings=owner_parser.settings,
                                track_errors=False)
            return tb.parse_fragment(fragment_html, base_uri)
        if owner_parser is not None:
            settings = getattr(owner_parser, "settings", HTML_DEFAULT)
    tb = HtmlTreeBuilder(settings)
    return tb.parse_fragment(fragment_html, context, base_uri)


def parse_body_fragment(body_html: str, base_uri: str = "") -> Document:
    """Parser.parseBodyFragment (Parser.kt:230-245)."""
    doc = Document.create_shell(base_uri)
    body = doc.body()
    node_list = parse_fragment(body_html, body, base_uri)
    # detach in REVERSE document order: each remove() is then a pop from
    # the end of the old parent's child list, so the sibling reindex is
    # a no-op — front-first draining is O(n^2) on wide bodies
    for node in reversed(list(node_list)):
        node.remove()
    for node in node_list:
        body.append_child(node)
    return doc


def clean(body_html: str, safelist: Safelist | None = None,
          base_uri: str = "", output_settings=None) -> str:
    """Ksoup.clean (Ksoup.kt:147-175; the outputSettings overload
    serializes the cleaned body with the supplied settings)."""
    if safelist is None:
        safelist = Safelist.relaxed()
    dirty = parse_body_fragment(body_html, base_uri)
    cleaner = Cleaner(safelist)
    cleaned = cleaner.clean(dirty)
    if output_settings is not None:
        cleaned.output_settings = output_settings
    return cleaned.body().html()


def is_valid(body_html: str, safelist: Safelist) -> bool:
    """Ksoup.isValid → Cleaner.isValidBodyHtml (Cleaner.kt:97-105):
    valid iff no nodes are discarded by the safelist AND the fragment
    parses without errors (e.g. a self-closing non-void tag fails)."""
    dirty = Document.create_shell("")
    clean_doc = Document.create_shell("")
    tb = HtmlTreeBuilder(HTML_DEFAULT, True)
    nodes = tb.parse_fragment(body_html, dirty.body(), "")
    for node in reversed(list(nodes)):
        node.remove()
    dirty.body().add_children_at(0, list(nodes))
    cleaner = Cleaner(safelist)
    discarded = cleaner._copy_safe_nodes(dirty.body(), clean_doc.body())
    n_errors = len(tb.errors) + len(tb.tokeniser.errors)
    return discarded == 0 and n_errors == 0


def unescape_entities(string: str, in_attribute: bool = False) -> str:
    """Parser.unescapeEntities (Parser.kt:253-261)."""
    return E.unescape(string, strict=in_attribute)


_META_FIELDS = (
    ("og_title", "meta[property=og:title]", "content"),
    ("og_site_name", "meta[property=og:site_name]", "content"),
    ("og_type", "meta[property=og:type]", "content"),
    ("og_locale", "meta[property=og:locale]", "content"),
    ("og_description", "meta[property=og:description]", "content"),
    ("og_image", "meta[property=og:image]", "content"),
    ("og_url", "meta[property=og:url]", "content"),
    ("twitter_title", "meta[name=twitter:title]", "content"),
    ("twitter_card", "meta[name=twitter:card]", "content"),
    ("twitter_description", "meta[name=twitter:description]", "content"),
    ("twitter_image", "meta[name=twitter:image]", "content"),
    ("title", "meta[name=title]", "content"),
    ("description", "meta[name=description]", "content"),
    ("author", "meta[name=author]", "content"),
    ("canonical", "link[rel=canonical]", "href"),
)


def parse_metadata(doc_or_element: Element) -> dict[str, str | None]:
    """Ksoup.parseMetaData (Ksoup.kt:192-288) → flat dict of OG/Twitter/
    standard meta + canonical + favicon; None for absent fields."""
    el = doc_or_element
    if isinstance(el, Document):
        head = el.head()
        el = head if head is not None else el
    title_el = el.select_first("title")
    base_uri = doc_or_element.base_uri()
    out: dict[str, str | None] = {}
    for field, query, attr in _META_FIELDS:
        found = el.select_first(query)
        out[field] = found.attr(attr) if found is not None else None
    out["html_title"] = title_el.text() if title_el is not None else None

    favicon = None
    fav_el = el.select_first("link[rel~=icon]")
    if fav_el is not None:
        favicon = fav_el.attr("href")
        if favicon and not favicon.lower().startswith("http") and base_uri:
            favicon = base_uri + favicon
    out["favicon"] = favicon

    shortcut = None
    sc_el = el.select_first("link[rel~=shortcut icon]")
    if sc_el is not None:
        shortcut = sc_el.attr("href")
        if shortcut and not shortcut.lower().startswith("http") and base_uri:
            shortcut = base_uri + shortcut
    out["shortcut_icon"] = shortcut
    return out
