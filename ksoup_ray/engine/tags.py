"""Tag descriptors + trait tables.

Semantics per reference ``ksoup/src/com/fleeksoft/ksoup/parser/Tag.kt``
(trait tables at Tag.kt:211-290): interned tag descriptors carrying the
boolean traits the tree builder, serializer and text extractor consult.

Built once at module import — in a Ray worker this happens once per
process, which is the Ray-native analogue of the reference's static
``Tags`` registry.
"""

from __future__ import annotations

NAMESPACE_HTML = "http://www.w3.org/1999/xhtml"
NAMESPACE_SVG = "http://www.w3.org/2000/svg"
NAMESPACE_MATHML = "http://www.w3.org/1998/Math/MathML"
NAMESPACE_XML = "http://www.w3.org/XML/1998/namespace"


class Tag:
    """Interned tag descriptor (reference Tag.kt:15-122)."""

    __slots__ = (
        "name",
        "normal_name",
        "namespace",
        "is_block",
        "format_as_block",
        "is_empty",
        "self_closing",
        "preserve_whitespace",
        "is_form_listed",
        "is_form_submittable",
        "is_known",
    )

    def __init__(self, name: str, namespace: str = NAMESPACE_HTML):
        self.name = name
        self.normal_name = name.lower()
        self.namespace = namespace
        # defaults per reference Tag.kt:17-19 — a registered-but-unlisted
        # tag (e.g. button, dfn) is block; UNKNOWN tags get is_block=False
        # in value_of (Tag.kt valueOf "not defined: create default")
        self.is_block = True
        self.format_as_block = True
        self.is_empty = False
        self.self_closing = False
        self.preserve_whitespace = False
        self.is_form_listed = False
        self.is_form_submittable = False
        self.is_known = False

    @property
    def is_inline(self) -> bool:
        return not self.is_block

    def is_self_closing(self) -> bool:
        return self.is_empty or self.self_closing

    def __repr__(self) -> str:  # pragma: no cover
        return f"Tag({self.name!r})"

    def __eq__(self, other: object) -> bool:
        if self is other:
            return True
        if not isinstance(other, Tag):
            return NotImplemented
        return (
            self.name == other.name
            and self.is_empty == other.is_empty
            and self.is_block == other.is_block
        )

    def __hash__(self) -> int:
        return hash((self.name, self.is_block, self.is_empty))


# Trait tables — contents per reference Tag.kt:211-290 (which derive from
# the public HTML4 DTD / WHATWG tag lists).
_BLOCK_TAGS = (
    "html", "head", "body", "frameset", "script", "noscript", "style", "meta",
    "link", "title", "frame", "noframes", "section", "nav", "aside", "hgroup",
    "header", "footer", "p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol",
    "pre", "div", "blockquote", "hr", "address", "figure", "figcaption",
    "form", "fieldset", "ins", "del", "dl", "dt", "dd", "li", "table",
    "caption", "thead", "tfoot", "tbody", "colgroup", "col", "tr", "th", "td",
    "video", "audio", "canvas", "details", "menu", "plaintext", "template",
    "article", "main", "svg", "math", "center", "template", "dir", "applet",
    "marquee", "listing",
)
_INLINE_TAGS = (
    "object", "base", "font", "tt", "i", "b", "u", "big", "small", "em",
    "strong", "dfn", "code", "samp", "kbd", "var", "cite", "abbr", "time",
    "acronym", "mark", "ruby", "rt", "rp", "rtc", "a", "img", "br", "wbr",
    "map", "q", "sub", "sup", "bdo", "iframe", "embed", "span", "input",
    "select", "textarea", "label", "optgroup", "option", "legend", "datalist",
    "keygen", "output", "progress", "meter", "area", "param", "source",
    "track", "summary", "command", "device", "area", "basefont", "bgsound",
    "menuitem", "param", "source", "track", "data", "bdi", "s", "strike",
    "nobr", "rb", "text", "mi", "mo", "msup", "mn", "mtext",
)
_EMPTY_TAGS = frozenset((
    "meta", "link", "base", "frame", "img", "br", "wbr", "embed", "hr",
    "input", "keygen", "col", "command", "device", "area", "basefont",
    "bgsound", "menuitem", "param", "source", "track",
))
_FORMAT_AS_INLINE_TAGS = frozenset((
    "title", "a", "p", "h1", "h2", "h3", "h4", "h5", "h6", "pre", "address",
    "li", "th", "td", "script", "style", "ins", "del", "s", "button",
))
_PRESERVE_WHITESPACE_TAGS = frozenset(("pre", "plaintext", "title", "textarea"))
_FORM_LISTED_TAGS = frozenset((
    "button", "fieldset", "input", "keygen", "object", "output", "select",
    "textarea",
))
_FORM_SUBMIT_TAGS = frozenset((
    "input", "keygen", "object", "select", "textarea",
))
_NAMESPACE_TAGS = {
    NAMESPACE_MATHML: ("math", "mi", "mo", "msup", "mn", "mtext"),
    NAMESPACE_SVG: ("svg", "text"),
}


def _build_registry() -> dict[str, Tag]:
    tags: dict[str, Tag] = {}

    def get(name: str) -> Tag:
        t = tags.get(name)
        if t is None:
            t = Tag(name)
            t.is_known = True
            tags[name] = t
        return t

    for n in _BLOCK_TAGS:
        t = get(n)
        t.is_block = True
        t.format_as_block = True
    for n in _INLINE_TAGS:
        t = get(n)
        t.is_block = False
        t.format_as_block = False
    for n in _EMPTY_TAGS:
        get(n).is_empty = True
    for n in _FORMAT_AS_INLINE_TAGS:
        get(n).format_as_block = False
    for n in _PRESERVE_WHITESPACE_TAGS:
        get(n).preserve_whitespace = True
    for n in _FORM_LISTED_TAGS:
        get(n).is_form_listed = True
    for n in _FORM_SUBMIT_TAGS:
        get(n).is_form_submittable = True
    for ns, names in _NAMESPACE_TAGS.items():
        for n in names:
            get(n).namespace = ns
    return tags


TAGS: dict[str, Tag] = _build_registry()


def is_known_tag(name: str) -> bool:
    return name in TAGS


def _clone_tag(t: Tag) -> Tag:
    c = Tag(t.name, t.namespace)
    for s in ("is_block", "format_as_block", "is_empty", "self_closing",
              "preserve_whitespace", "is_form_listed", "is_form_submittable",
              "is_known"):
        setattr(c, s, getattr(t, s))
    return c


def value_of(tag_name: str, namespace: str = NAMESPACE_HTML,
             preserve_case: bool = False) -> Tag:
    """Intern-or-create a tag (reference Tag.kt valueOf).

    Known tags come from the registry (cloned with original case when
    preserving); UNKNOWN tags get a fresh descriptor with is_block=False
    ("go anywhere, do anything").
    """
    t = TAGS.get(tag_name)
    if t is not None and t.namespace == namespace:
        return t
    # Tag.valueOf trims, then validates non-empty (Tag.kt valueOf)
    normalized = tag_name.strip() if preserve_case \
        else tag_name.lower().strip()
    if not normalized:
        raise ValueError("tag name must not be empty")
    normal = normalized.lower()
    t = TAGS.get(normal)
    if t is not None and t.namespace == namespace:
        if preserve_case and normalized != normal:
            c = _clone_tag(t)
            c.name = normalized
            return c
        return t
    tag = Tag(normalized, namespace)
    tag.is_block = False
    return tag
