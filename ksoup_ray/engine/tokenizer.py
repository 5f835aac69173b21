"""HTML5 tokenizer — the 67-state machine.

Semantics per reference ``parser/TokeniserState.kt`` (1915 LoC) +
``parser/Tokeniser.kt`` + ``parser/CharacterReader.kt`` fast scans,
re-expressed over a whole in-memory ``str`` with regex/``str.find``
bulk scans instead of the reference's 2 KB ring buffer (an IO artifact,
not semantics — SURVEY.md §7.4).

Notable reference behaviors kept exactly:
* character runs coalesce until the next non-character token
  (Tokeniser.kt:36-57 read loop);
* named char refs: base entities match without ';', extended require it;
  in attributes a match followed by ``=-_`` is rejected
  (Tokeniser.kt:150-227);
* RCDATA "missing </title>" divergence: break out at the next
  tag-like position rather than consuming to EOF
  (TokeniserState.kt:196-206);
* script double-escape states;
* tag-name scan stops at ``\\t \\n \\r \\f space / > <`` and EATS null
  chars (CharacterReader.kt:448-460);
* attribute dedup is NOT done here — duplicate attrs are kept in token
  order and deduped (first-wins, error counted) by the tree builder
  (Token.kt:133-156).
"""

from __future__ import annotations

import re

from . import entities as E

REPLACEMENT = "�"
EOF = ""  # sentinel for "no current char"

MAX_ATTRIBUTES = 512  # Token.kt:354

# --- token kinds -----------------------------------------------------------

CHARACTER = 0
START_TAG = 1
END_TAG = 2
COMMENT = 3
DOCTYPE = 4
EOF_TOKEN = 5
CDATA = 6


class CharacterTok:
    __slots__ = ("data", "start_pos", "end_pos")
    kind = CHARACTER

    def __init__(self, data: str, start_pos: int = -1, end_pos: int = -1):
        self.data = data
        self.start_pos = start_pos
        self.end_pos = end_pos


class CDataTok(CharacterTok):
    __slots__ = ()
    kind = CDATA


class TagTok:
    __slots__ = ("kind", "name", "normal_name", "self_closing", "attrs",
                 "start", "_attr_name", "_attr_value", "_has_name",
                 "_has_value", "_has_empty_value", "start_pos", "end_pos",
                 "attr_ranges", "_an_start", "_an_end", "_av_start",
                 "_av_end")

    def __init__(self, start: bool):
        self.start = start
        self.kind = START_TAG if start else END_TAG
        # source offsets of `<`..`>` (Range tracking); -1 = virtual token
        self.start_pos = -1
        self.end_pos = -1
        self.reset()

    def reset(self) -> None:
        self.name: str | None = None
        self.normal_name: str | None = None
        self.self_closing = False
        self.attrs: list[tuple[str, str | None]] = []
        # parallel (name_start, name_end, val_start, val_end) per attr
        # (Token.kt trackAttributeRange); -1 = untracked endpoint
        self.attr_ranges: list[tuple[int, int, int, int]] = []
        self._reset_pending_attr()

    def _reset_pending_attr(self) -> None:
        self._attr_name: list[str] = []
        self._attr_value: list[str] = []
        self._has_name = False
        self._has_value = False
        self._has_empty_value = False
        self._an_start = self._an_end = -1
        self._av_start = self._av_end = -1

    def append_tag_name(self, s: str) -> None:
        # Token.kt appendTagName: null chars become U+FFFD
        if "\x00" in s:
            s = s.replace("\x00", "\ufffd")
        self.name = s if self.name is None else self.name + s
        # ParseSettings.normalName: lowerCase(name.trim { it <= ' ' }) \u2014
        # stray control chars (e.g. "template\x1e") trim off so tree-
        # builder name checks agree with Tag.valueOf's normalization
        # (reference HtmlParserTest trimNormalizeElementNamesInBuilder)
        self.normal_name = self.name.strip(_TRIM_CHARS).lower()

    def set_name(self, s: str) -> None:
        self.name = s
        self.normal_name = s.strip(_TRIM_CHARS).lower()

    def append_attr_name(self, s: str, start: int = -1,
                         end: int = -1) -> None:
        # Token.kt appendAttributeName: null chars become U+FFFD
        if "\x00" in s:
            s = s.replace("\x00", "\ufffd")
        self._attr_name.append(s)
        self._has_name = True
        if start >= 0:
            if self._an_start < 0:
                self._an_start = start
            self._an_end = end

    def append_attr_value(self, s: str, start: int = -1,
                          end: int = -1) -> None:
        self._attr_value.append(s)
        self._has_value = True
        if start >= 0:
            if self._av_start < 0:
                self._av_start = start
            self._av_end = end

    def set_empty_attr_value(self, pos: int = -1) -> None:
        self._has_empty_value = True
        if pos >= 0 and self._av_start < 0:
            self._av_start = self._av_end = pos

    def new_attribute(self) -> None:
        """Token.kt:133-156 — push pending attr (first 512; name trimmed)."""
        if self._has_name and len(self.attrs) < MAX_ATTRIBUTES:
            name = "".join(self._attr_name).strip(_TRIM_CHARS)
            if name:
                if self._has_value:
                    value: str | None = "".join(self._attr_value)
                elif self._has_empty_value:
                    value = ""
                else:
                    value = None
                self.attrs.append((name, value))
                ns, ne = self._an_start, self._an_end
                if self._av_start >= 0:
                    vs, ve = self._av_start, self._av_end
                else:
                    # implicit (valueless) value range collapses to the
                    # name end (Range.AttributeRange untracked value)
                    vs = ve = ne
                self.attr_ranges.append((ns, ne, vs, ve))
        self._reset_pending_attr()

    def finalise(self) -> None:
        if self._has_name:
            self.new_attribute()


# chars <= space, as Kotlin's trim { it <= ' ' }
_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


class CommentTok:
    __slots__ = ("data", "bogus", "start_pos", "end_pos")
    kind = COMMENT

    def __init__(self) -> None:
        self.data: list[str] = []
        self.bogus = False
        self.start_pos = -1
        self.end_pos = -1

    def get_data(self) -> str:
        return "".join(self.data)


class DoctypeTok:
    __slots__ = ("name", "pub_sys_key", "public_identifier",
                 "system_identifier", "force_quirks", "start_pos", "end_pos")
    kind = DOCTYPE

    def __init__(self) -> None:
        self.name: list[str] = []
        self.pub_sys_key: str | None = None
        self.public_identifier: list[str] = []
        self.system_identifier: list[str] = []
        self.force_quirks = False
        self.start_pos = -1
        self.end_pos = -1

    def get_name(self) -> str:
        return "".join(self.name)

    def get_public_identifier(self) -> str:
        return "".join(self.public_identifier)

    def get_system_identifier(self) -> str:
        return "".join(self.system_identifier)


class EOFTok:
    __slots__ = ()
    kind = EOF_TOKEN


EOF_INSTANCE = EOFTok()

# --- state constants -------------------------------------------------------
(
    DATA, CHAR_REF_IN_DATA, RCDATA, CHAR_REF_IN_RCDATA, RAWTEXT, SCRIPT_DATA,
    PLAINTEXT, TAG_OPEN, END_TAG_OPEN, TAG_NAME, RCDATA_LT, RCDATA_END_TAG_OPEN,
    RCDATA_END_TAG_NAME, RAWTEXT_LT, RAWTEXT_END_TAG_OPEN, RAWTEXT_END_TAG_NAME,
    SCRIPT_DATA_LT, SCRIPT_DATA_END_TAG_OPEN, SCRIPT_DATA_END_TAG_NAME,
    SCRIPT_DATA_ESCAPE_START, SCRIPT_DATA_ESCAPE_START_DASH, SCRIPT_DATA_ESCAPED,
    SCRIPT_DATA_ESCAPED_DASH, SCRIPT_DATA_ESCAPED_DASH_DASH,
    SCRIPT_DATA_ESCAPED_LT, SCRIPT_DATA_ESCAPED_END_TAG_OPEN,
    SCRIPT_DATA_ESCAPED_END_TAG_NAME, SCRIPT_DATA_DOUBLE_ESCAPE_START,
    SCRIPT_DATA_DOUBLE_ESCAPED, SCRIPT_DATA_DOUBLE_ESCAPED_DASH,
    SCRIPT_DATA_DOUBLE_ESCAPED_DASH_DASH, SCRIPT_DATA_DOUBLE_ESCAPED_LT,
    SCRIPT_DATA_DOUBLE_ESCAPE_END, BEFORE_ATTR_NAME, ATTR_NAME,
    AFTER_ATTR_NAME, BEFORE_ATTR_VALUE, ATTR_VALUE_DQ, ATTR_VALUE_SQ,
    ATTR_VALUE_UNQUOTED, AFTER_ATTR_VALUE_QUOTED, SELF_CLOSING_START_TAG,
    BOGUS_COMMENT, MARKUP_DECL_OPEN, COMMENT_START, COMMENT_START_DASH,
    COMMENT_STATE, COMMENT_END_DASH, COMMENT_END, COMMENT_END_BANG,
    DOCTYPE_STATE, BEFORE_DOCTYPE_NAME, DOCTYPE_NAME, AFTER_DOCTYPE_NAME,
    AFTER_DOCTYPE_PUBLIC_KEYWORD, BEFORE_DOCTYPE_PUBLIC_ID,
    DOCTYPE_PUBLIC_ID_DQ, DOCTYPE_PUBLIC_ID_SQ, AFTER_DOCTYPE_PUBLIC_ID,
    BETWEEN_DOCTYPE_PUBLIC_AND_SYSTEM, AFTER_DOCTYPE_SYSTEM_KEYWORD,
    BEFORE_DOCTYPE_SYSTEM_ID, DOCTYPE_SYSTEM_ID_DQ, DOCTYPE_SYSTEM_ID_SQ,
    AFTER_DOCTYPE_SYSTEM_ID, BOGUS_DOCTYPE, CDATA_SECTION,
) = range(67)

# --- scan regexes (C-speed bulk consumption) -------------------------------

_DATA_SCAN = re.compile(r"[&<\x00]")
_RAW_SCAN = re.compile(r"[<\x00]")
_TAGNAME_SCAN = re.compile(r"[\t\n\r\f /><]")
_ATTR_NAME_SCAN = re.compile(r"[\t\n\r\f \"'/<=>]")
_ATTR_VAL_UNQ_SCAN = re.compile(r"[\x00\t\n\r\f \"&'<=>`]")
_ATTR_VAL_DQ_SCAN = re.compile(r"[\"&\x00]")
_ATTR_VAL_SQ_SCAN = re.compile(r"['&\x00]")
_ESCAPED_SCAN = re.compile(r"[-<\x00]")
_COMMENT_SCAN = re.compile(r"[-\x00]")
_LETTERS = re.compile(r"[^\W\d_]+")  # unicode letters (Char.isLetter)
_WS = frozenset("\t\n\r\f ")

# a would-be named reference: letters+digits terminated by ';'
_NAMED_REF_SHAPE = re.compile(r"([a-zA-Z][a-zA-Z0-9]*);")
_QUOTE_EQ = frozenset("\"'=")
_QUOTE_LT = frozenset("\"'<")
_LT_EQ_BT = frozenset("<=`")
_UNQ_ERR = frozenset("\"'<=`")
_SLASH_GT = frozenset("/>")


class Tokeniser:
    """Pull tokenizer: ``read()`` returns one token at a time."""

    __slots__ = ("s", "n", "pos", "state", "errors", "track_errors",
                 "_chars", "_pending", "_tag", "_comment", "_doctype",
                 "_data_buffer", "_last_start_tag", "_last_start_close_seq",
                 "_start_tag_tok", "_end_tag_tok", "_lower_cache",
                 "_char_start", "_char_end", "markup_start")

    def __init__(self, s: str, track_errors: bool = False):
        self.s = s
        self._lower_cache: str | None = None
        # source-position tracking (Tokeniser.kt markupStartPos /
        # charStartPos): spans are offsets into the DECODED document
        self._char_start = 0
        self._char_end = 0
        self.markup_start = 0
        self.n = len(s)
        self.pos = 0
        self.state = DATA
        self.errors: list[str] = []
        self.track_errors = track_errors
        self._chars: list[str] = []   # coalescing character buffer
        self._pending = None          # pending non-char token
        self._tag: TagTok | None = None
        self._comment: CommentTok | None = None
        self._doctype: DoctypeTok | None = None
        self._data_buffer: list[str] = []
        self._last_start_tag: str | None = None
        self._last_start_close_seq: str | None = None
        self._start_tag_tok = TagTok(True)
        self._end_tag_tok = TagTok(False)

    # -- error reporting
    def error(self, msg: str) -> None:
        if self.track_errors and len(self.errors) < 100:
            self.errors.append(msg)
        elif not self.track_errors:
            # still count for parse_errors metric
            self.errors.append("")

    # -- emit plumbing
    def _emit_token(self, tok) -> None:
        assert self._pending is None
        self._pending = tok
        if not self._chars:
            self._char_start = self.pos
        kind = tok.kind
        if kind != EOF_TOKEN and kind != CHARACTER:
            # source range `<`..`>` (markup_start set at the opening <;
            # -1 marks tokens synthesized mid-stream)
            tok.start_pos = self.markup_start
            tok.end_pos = self.pos if self.markup_start >= 0 else -1
        if tok.kind == START_TAG:
            self._last_start_tag = tok.name
            self._last_start_close_seq = None
        elif tok.kind == END_TAG and tok.attrs:
            self.error("Attributes incorrectly present on end tag")

    def _emit_chars(self, s: str) -> None:
        # char-run start is managed at token boundaries (reference
        # Tokeniser.kt charStartPos: set when the previous token emits);
        # each chunk only advances the end position
        self._chars.append(s)
        self._char_end = self.pos

    def read(self):
        """Return next token (chars coalesced between non-char tokens)."""
        while self._pending is None:
            _STATES[self.state](self)
        if self._chars:
            data = "".join(self._chars)
            self._chars.clear()
            tok = CharacterTok(data, self._char_start, self._char_end)
            self._char_start = self.pos
            return tok
        tok = self._pending
        self._pending = None
        return tok

    # -- reader helpers
    def _current(self) -> str:
        return self.s[self.pos] if self.pos < self.n else EOF

    def _consume(self) -> str:
        p = self.pos
        if p < self.n:
            self.pos = p + 1
            return self.s[p]
        self.pos = p + 1  # allow unconsume symmetry at EOF
        return EOF

    def _unconsume(self) -> None:
        self.pos -= 1

    def _consume_scan(self, pattern: re.Pattern) -> str:
        """Consume up to (not including) the next char matched by pattern."""
        m = pattern.search(self.s, self.pos)
        if m is None:
            out = self.s[self.pos:]
            self.pos = self.n
        else:
            out = self.s[self.pos:m.start()]
            self.pos = m.start()
        return out

    def _consume_to_str(self, seq: str) -> str:
        idx = self.s.find(seq, self.pos)
        if idx == -1:
            out = self.s[self.pos:]
            self.pos = self.n
        else:
            out = self.s[self.pos:idx]
            self.pos = idx
        return out

    def _consume_to_char(self, ch: str) -> str:
        return self._consume_to_str(ch)

    def _consume_letters(self) -> str:
        m = _LETTERS.match(self.s, self.pos)
        if m is None:
            return ""
        self.pos = m.end()
        return m.group()

    def _match_consume(self, seq: str) -> bool:
        if self.s.startswith(seq, self.pos):
            self.pos += len(seq)
            return True
        return False

    def _match_consume_ic(self, seq: str) -> bool:
        if self.s[self.pos:self.pos + len(seq)].lower() == seq.lower():
            self.pos += len(seq)
            return True
        return False

    def _matches_ascii_alpha(self) -> bool:
        p = self.pos
        if p >= self.n:
            return False
        c = self.s[p]
        return ("a" <= c <= "z") or ("A" <= c <= "Z")

    def _matches_letter(self) -> bool:
        p = self.pos
        return p < self.n and self.s[p].isalpha()

    # -- char refs
    def consume_char_ref(self, additional_allowed: str | None,
                         in_attribute: bool) -> str | None:
        m = E.match_char_ref(self.s, self.pos, in_attribute, additional_allowed)
        if m is None:
            # looked like a terminated named ref but the name is unknown
            # (Tokeniser.kt "invalid named reference" error)
            if self.track_errors and not in_attribute:
                nm = _NAMED_REF_SHAPE.match(self.s, self.pos)
                if nm is not None:
                    self.error("Invalid character reference: invalid "
                               f"named reference [{nm.group(1)}]")
            return None
        repl, new_pos = m
        if self.track_errors and new_pos > self.pos \
                and self.s[new_pos - 1] != ";":
            # matched without the terminating semicolon (legacy laxity)
            self.error("Invalid character reference: missing semicolon "
                       f"on [&{self.s[self.pos:new_pos]}]")
        if self.s[self.pos] == "#":
            if repl == E.REPLACEMENT_CHAR:
                self.error("char ref outside valid range")
            elif self.track_errors:
                parsed = E._parse_numeric_ref(self.s, self.pos)
                if parsed is not None and \
                        0x80 <= parsed[0] < 0x80 + len(E.WIN1252_EXTENSIONS):
                    # win-1252 remap (Tokeniser.kt:345-353)
                    self.error(
                        "character is not a valid unicode code point")
        self.pos = new_pos
        return repl

    # -- tag plumbing
    def create_tag_pending(self, start: bool) -> TagTok:
        tok = self._start_tag_tok if start else self._end_tag_tok
        tok.reset()
        self._tag = tok
        return tok

    def emit_tag_pending(self) -> None:
        tag = self._tag
        assert tag is not None
        tag.finalise()
        self._emit_token(tag)

    def create_comment_pending(self, bogus: bool = False) -> None:
        self._comment = CommentTok()
        self._comment.bogus = bogus

    def emit_comment_pending(self) -> None:
        # pending objects persist after emit (reference reuses them;
        # some doctype/comment states emit then append more — e.g.
        # AfterDoctypeSystemKeyword's else branch has no transition)
        self._emit_token(self._comment)

    def create_doctype_pending(self) -> None:
        self._doctype = DoctypeTok()

    def emit_doctype_pending(self) -> None:
        self._emit_token(self._doctype)

    def create_temp_buffer(self) -> None:
        self._data_buffer = []

    def is_appropriate_end_tag(self) -> bool:
        return (self._last_start_tag is not None and self._tag is not None
                and self._tag.name is not None
                and self._tag.name.lower() == self._last_start_tag.lower())

    def appropriate_end_tag_name(self) -> str | None:
        return self._last_start_tag

    def appropriate_end_tag_seq(self) -> str:
        if self._last_start_close_seq is None:
            self._last_start_close_seq = "</" + (self._last_start_tag or "")
        return self._last_start_close_seq

    # -- explicit transitions used by the tree builder
    def transition(self, state: int) -> None:
        self.state = state

    def inject_end_tag(self, name: str) -> None:
        """Emit a synthetic end tag as the next token (used by the tree
        builder for self-closing non-void tags — HtmlTreeBuilder.kt:279)."""
        tok = TagTok(False)
        tok.set_name(name)
        self._emit_token(tok)
        tok.start_pos = -1  # synthetic: no source range
        tok.end_pos = -1


# ---------------------------------------------------------------------------
# State functions. Each mirrors a TokeniserState case.

# whole-tag fast path for the dominant shapes: attribute-less tags
# (`<p>`, `</div>`, `<br/>`) AND tags with simple double-quoted
# attributes (`<div class="c">`, `<a href="/x" rel="nofollow">`).
# Semantically identical to TagOpen → TagName → (BeforeAttributeName →
# AttributeName → BeforeAttributeValue → AttributeValue_doubleQuoted →
# AfterAttributeValue_quoted)* → emit for exactly these inputs: names
# are plain ASCII identifiers (no \x00 to replace, nothing to trim),
# values exclude `&` (char refs), `"`, `<`, `>`, \x00 and \r (each of
# which the quoted-value state treats specially), attrs are separated
# by real whitespace, and ranges are stamped with the same endpoints
# the generic states record (value range inside the quotes; an empty
# value collapses to the post-quote position exactly like
# set_empty_attr_value). Duplicate names are appended as the generic
# path does — first-wins dedup happens downstream in Attributes.
# Anything else falls through to the full state machine.
_FAST_ATTR = re.compile(
    r'[ \t\n\f\r]+([a-zA-Z][a-zA-Z0-9_:.-]*)="([^"<>&\x00\r]*)"')
_FAST_TAG = re.compile(
    r'<(/)?([a-zA-Z][a-zA-Z0-9]*)'
    r'((?:[ \t\n\f\r]+[a-zA-Z][a-zA-Z0-9_:.-]*="[^"<>&\x00\r]*")*)'
    r'[ \t\n\f\r]*(/)?>')


def _s_data(t: Tokeniser) -> None:
    c = t._current()
    if c == "&":
        t.pos += 1
        t.state = CHAR_REF_IN_DATA
    elif c == "<":
        t.markup_start = t.pos
        m = _FAST_TAG.match(t.s, t.pos)
        if m is not None and not (m.group(1) and m.group(4)):
            tok = t.create_tag_pending(m.group(1) is None)
            tok.set_name(m.group(2))
            if m.group(3):
                attrs = tok.attrs
                ranges = tok.attr_ranges
                for am in _FAST_ATTR.finditer(t.s, m.start(3),
                                              m.end(3)):
                    if len(attrs) < MAX_ATTRIBUTES:
                        attrs.append((am.group(1), am.group(2)))
                        ranges.append((am.start(1), am.end(1),
                                       am.start(2), am.end(2)))
            if m.group(4):
                tok.self_closing = True
            t.pos = m.end()
            t.emit_tag_pending()
            return
        t.pos += 1
        t.state = TAG_OPEN
    elif c == "\x00":
        t.error("data null")
        t.pos += 1
        t._emit_chars("\x00")  # NOT replacement char (TokeniserState.kt:16)
    elif c is EOF or c == EOF:
        t._emit_token(EOF_INSTANCE)
    else:
        t._emit_chars(t._consume_scan(_DATA_SCAN))


def _s_char_ref_in_data(t: Tokeniser) -> None:
    ref = t.consume_char_ref(None, False)
    t._emit_chars("&" if ref is None else ref)
    t.state = DATA


def _s_rcdata(t: Tokeniser) -> None:
    c = t._current()
    if c == "&":
        t.pos += 1
        t.state = CHAR_REF_IN_RCDATA
    elif c == "<":
        t.markup_start = t.pos
        t.pos += 1
        t.state = RCDATA_LT
    elif c == "\x00":
        t.error("rcdata null")
        t.pos += 1
        t._emit_chars(REPLACEMENT)
    elif c == EOF:
        t._emit_token(EOF_INSTANCE)
    else:
        t._emit_chars(t._consume_scan(_DATA_SCAN))


def _s_char_ref_in_rcdata(t: Tokeniser) -> None:
    ref = t.consume_char_ref(None, False)
    t._emit_chars("&" if ref is None else ref)
    t.state = RCDATA


def _read_raw_data(t: Tokeniser, current_state: int, advance_state: int) -> None:
    c = t._current()
    if c == "<":
        t.markup_start = t.pos
        t.pos += 1
        t.state = advance_state
    elif c == "\x00":
        t.error("raw null")
        t.pos += 1
        t._emit_chars(REPLACEMENT)
    elif c == EOF:
        t._emit_token(EOF_INSTANCE)
    else:
        t._emit_chars(t._consume_scan(_RAW_SCAN))


def _s_rawtext(t: Tokeniser) -> None:
    _read_raw_data(t, RAWTEXT, RAWTEXT_LT)


def _s_script_data(t: Tokeniser) -> None:
    _read_raw_data(t, SCRIPT_DATA, SCRIPT_DATA_LT)


def _s_plaintext(t: Tokeniser) -> None:
    c = t._current()
    if c == "\x00":
        t.error("plaintext null")
        t.pos += 1
        t._emit_chars(REPLACEMENT)
    elif c == EOF:
        t._emit_token(EOF_INSTANCE)
    else:
        t._emit_chars(t._consume_to_char("\x00"))


def _s_tag_open(t: Tokeniser) -> None:
    c = t._current()
    if c == "!":
        t.pos += 1
        t.state = MARKUP_DECL_OPEN
    elif c == "/":
        t.pos += 1
        t.state = END_TAG_OPEN
    elif c == "?":
        t.create_comment_pending(bogus=True)
        t.state = BOGUS_COMMENT
    elif t._matches_ascii_alpha():
        t.create_tag_pending(True)
        t.state = TAG_NAME
    else:
        t.error("tag open")
        t._emit_chars("<")
        t.state = DATA


def _s_end_tag_open(t: Tokeniser) -> None:
    if t.pos >= t.n:
        t.error("eof in end tag")
        t._emit_chars("</")
        t.state = DATA
    elif t._matches_ascii_alpha():
        t.create_tag_pending(False)
        t.state = TAG_NAME
    elif t._current() == ">":
        t.error("end tag open >")
        t.pos += 1
        t.state = DATA
    else:
        t.error("end tag open")
        t.create_comment_pending(bogus=True)
        t._comment.data.append("/")
        t.state = BOGUS_COMMENT


def _s_tag_name(t: Tokeniser) -> None:
    name = t._consume_scan(_TAGNAME_SCAN)
    t._tag.append_tag_name(name)
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_ATTR_NAME
    elif c == "/":
        t.state = SELF_CLOSING_START_TAG
    elif c == "<":
        t._unconsume()
        t.error("tag name <")
        t.emit_tag_pending()
        t.state = DATA
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == "\x00":
        t._tag.append_tag_name(REPLACEMENT)
    elif c == EOF:
        t.error("eof in tag name")
        t.state = DATA
    else:
        t._tag.append_tag_name(c)


def _contains_ignore_case(t: Tokeniser, pos: int, seq: str) -> bool:
    if t._lower_cache is None:
        t._lower_cache = t.s.lower()
    return t._lower_cache.find(seq.lower(), pos) != -1


def _s_rcdata_lt(t: Tokeniser) -> None:
    if t._current() == "/":
        t.create_temp_buffer()
        t.pos += 1
        t.state = RCDATA_END_TAG_OPEN
    elif (t._matches_ascii_alpha() and t.appropriate_end_tag_name() is not None
          and not _contains_ignore_case(t, t.pos, t.appropriate_end_tag_seq())):
        # diverge from spec (TokeniserState.kt:196-206): no appropriate end
        # tag ahead — emit a synthetic end tag and re-enter TagOpen
        tag = t.create_tag_pending(False)
        tag.set_name(t.appropriate_end_tag_name() or "")
        save_markup = t.markup_start
        t.markup_start = -1  # synthetic token: no source range
        t.emit_tag_pending()
        t.markup_start = save_markup
        t.state = TAG_OPEN
    else:
        t._emit_chars("<")
        t.state = RCDATA


def _s_rcdata_end_tag_open(t: Tokeniser) -> None:
    if t._matches_ascii_alpha():
        t.create_tag_pending(False)
        c = t._current()
        t._tag.append_tag_name(c)
        t._data_buffer.append(c)
        t.pos += 1
        t.state = RCDATA_END_TAG_NAME
    else:
        t._emit_chars("</")
        t.state = RCDATA


def _s_rcdata_end_tag_name(t: Tokeniser) -> None:
    if t._matches_ascii_alpha():
        name = t._consume_letters()
        t._tag.append_tag_name(name)
        t._data_buffer.append(name)
        return
    c = t._consume()
    if c in _WS and t.is_appropriate_end_tag():
        t.state = BEFORE_ATTR_NAME
    elif c == "/" and t.is_appropriate_end_tag():
        t.state = SELF_CLOSING_START_TAG
    elif c == ">" and t.is_appropriate_end_tag():
        t.emit_tag_pending()
        t.state = DATA
    else:
        t._emit_chars("</" + "".join(t._data_buffer))
        t._unconsume()
        t.state = RCDATA


def _s_rawtext_lt(t: Tokeniser) -> None:
    if t._current() == "/":
        t.create_temp_buffer()
        t.pos += 1
        t.state = RAWTEXT_END_TAG_OPEN
    else:
        t._emit_chars("<")
        t.state = RAWTEXT


def _read_end_tag(t: Tokeniser, a: int, b: int) -> None:
    if t._matches_ascii_alpha():
        t.create_tag_pending(False)
        t.state = a
    else:
        t._emit_chars("</")
        t.state = b


def _s_rawtext_end_tag_open(t: Tokeniser) -> None:
    _read_end_tag(t, RAWTEXT_END_TAG_NAME, RAWTEXT)


def _handle_data_end_tag(t: Tokeniser, else_state: int) -> None:
    if t._matches_letter():
        name = t._consume_letters()
        t._tag.append_tag_name(name)
        t._data_buffer.append(name)
        return
    needs_exit = False
    if t.is_appropriate_end_tag() and t.pos < t.n:
        c = t._consume()
        if c in _WS:
            t.state = BEFORE_ATTR_NAME
        elif c == "/":
            t.state = SELF_CLOSING_START_TAG
        elif c == ">":
            t.emit_tag_pending()
            t.state = DATA
        else:
            t._data_buffer.append(c)
            needs_exit = True
    else:
        needs_exit = True
    if needs_exit:
        t._emit_chars("</" + "".join(t._data_buffer))
        t.state = else_state


def _s_rawtext_end_tag_name(t: Tokeniser) -> None:
    _handle_data_end_tag(t, RAWTEXT)


def _s_script_data_lt(t: Tokeniser) -> None:
    c = t._consume()
    if c == "/":
        t.create_temp_buffer()
        t.state = SCRIPT_DATA_END_TAG_OPEN
    elif c == "!":
        t._emit_chars("<!")
        t.state = SCRIPT_DATA_ESCAPE_START
    elif c == EOF:
        t._emit_chars("<")
        t.error("eof script <")
        t.state = DATA
    else:
        t._emit_chars("<")
        t._unconsume()
        t.state = SCRIPT_DATA


def _s_script_data_end_tag_open(t: Tokeniser) -> None:
    _read_end_tag(t, SCRIPT_DATA_END_TAG_NAME, SCRIPT_DATA)


def _s_script_data_end_tag_name(t: Tokeniser) -> None:
    _handle_data_end_tag(t, SCRIPT_DATA)


def _s_script_data_escape_start(t: Tokeniser) -> None:
    if t._current() == "-":
        t._emit_chars("-")
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPE_START_DASH
    else:
        t.state = SCRIPT_DATA


def _s_script_data_escape_start_dash(t: Tokeniser) -> None:
    if t._current() == "-":
        t._emit_chars("-")
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPED_DASH_DASH
    else:
        t.state = SCRIPT_DATA


def _s_script_data_escaped(t: Tokeniser) -> None:
    if t.pos >= t.n:
        t.error("eof script escaped")
        t.state = DATA
        return
    c = t._current()
    if c == "-":
        t._emit_chars("-")
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPED_DASH
    elif c == "<":
        t.markup_start = t.pos
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPED_LT
    elif c == "\x00":
        t.error("script escaped null")
        t.pos += 1
        t._emit_chars(REPLACEMENT)
    else:
        t._emit_chars(t._consume_scan(_ESCAPED_SCAN))


def _s_script_data_escaped_dash(t: Tokeniser) -> None:
    if t.pos >= t.n:
        t.error("eof script escaped dash")
        t.state = DATA
        return
    c = t._consume()
    if c == "-":
        t._emit_chars(c)
        t.state = SCRIPT_DATA_ESCAPED_DASH_DASH
    elif c == "<":
        t.markup_start = t.pos - 1
        t.state = SCRIPT_DATA_ESCAPED_LT
    elif c == "\x00":
        t.error("null")
        t._emit_chars(REPLACEMENT)
        t.state = SCRIPT_DATA_ESCAPED
    else:
        t._emit_chars(c)
        t.state = SCRIPT_DATA_ESCAPED


def _s_script_data_escaped_dash_dash(t: Tokeniser) -> None:
    if t.pos >= t.n:
        t.error("eof script escaped dash dash")
        t.state = DATA
        return
    c = t._consume()
    if c == "-":
        t._emit_chars(c)
    elif c == "<":
        t.markup_start = t.pos - 1
        t.state = SCRIPT_DATA_ESCAPED_LT
    elif c == ">":
        t._emit_chars(c)
        t.state = SCRIPT_DATA
    elif c == "\x00":
        t.error("null")
        t._emit_chars(REPLACEMENT)
        t.state = SCRIPT_DATA_ESCAPED
    else:
        t._emit_chars(c)
        t.state = SCRIPT_DATA_ESCAPED


def _s_script_data_escaped_lt(t: Tokeniser) -> None:
    if t._matches_ascii_alpha():
        t.create_temp_buffer()
        c = t._current()
        t._data_buffer.append(c)
        t._emit_chars("<" + c)
        t.pos += 1
        t.state = SCRIPT_DATA_DOUBLE_ESCAPE_START
    elif t._current() == "/":
        t.create_temp_buffer()
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPED_END_TAG_OPEN
    else:
        t._emit_chars("<")
        t.state = SCRIPT_DATA_ESCAPED


def _s_script_data_escaped_end_tag_open(t: Tokeniser) -> None:
    if t._matches_ascii_alpha():
        t.create_tag_pending(False)
        c = t._current()
        t._tag.append_tag_name(c)
        t._data_buffer.append(c)
        t.pos += 1
        t.state = SCRIPT_DATA_ESCAPED_END_TAG_NAME
    else:
        t._emit_chars("</")
        t.state = SCRIPT_DATA_ESCAPED


def _s_script_data_escaped_end_tag_name(t: Tokeniser) -> None:
    _handle_data_end_tag(t, SCRIPT_DATA_ESCAPED)


def _handle_data_double_escape(t: Tokeniser, primary: int, fallback: int) -> None:
    if t._matches_letter():
        name = t._consume_letters()
        t._data_buffer.append(name)
        t._emit_chars(name)
        return
    c = t._consume()
    if c in _WS or c in _SLASH_GT:
        if "".join(t._data_buffer) == "script":
            t.state = primary
        else:
            t.state = fallback
        t._emit_chars(c)
    else:
        t._unconsume()
        t.state = fallback


def _s_script_data_double_escape_start(t: Tokeniser) -> None:
    _handle_data_double_escape(t, SCRIPT_DATA_DOUBLE_ESCAPED, SCRIPT_DATA_ESCAPED)


def _s_script_data_double_escaped(t: Tokeniser) -> None:
    c = t._current()
    if c == "-":
        t._emit_chars(c)
        t.pos += 1
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED_DASH
    elif c == "<":
        t._emit_chars(c)
        t.pos += 1
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED_LT
    elif c == "\x00":
        t.error("null")
        t.pos += 1
        t._emit_chars(REPLACEMENT)
    elif c == EOF:
        t.error("eof")
        t.state = DATA
    else:
        t._emit_chars(t._consume_scan(_ESCAPED_SCAN))


def _s_script_data_double_escaped_dash(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t._emit_chars(c)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED_DASH_DASH
    elif c == "<":
        t._emit_chars(c)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED_LT
    elif c == "\x00":
        t.error("null")
        t._emit_chars(REPLACEMENT)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED
    elif c == EOF:
        t.error("eof")
        t.state = DATA
    else:
        t._emit_chars(c)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED


def _s_script_data_double_escaped_dash_dash(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t._emit_chars(c)
    elif c == "<":
        t._emit_chars(c)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED_LT
    elif c == ">":
        t._emit_chars(c)
        t.state = SCRIPT_DATA
    elif c == "\x00":
        t.error("null")
        t._emit_chars(REPLACEMENT)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED
    elif c == EOF:
        t.error("eof")
        t.state = DATA
    else:
        t._emit_chars(c)
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED


def _s_script_data_double_escaped_lt(t: Tokeniser) -> None:
    if t._current() == "/":
        t._emit_chars("/")
        t.create_temp_buffer()
        t.pos += 1
        t.state = SCRIPT_DATA_DOUBLE_ESCAPE_END
    else:
        t.state = SCRIPT_DATA_DOUBLE_ESCAPED


def _s_script_data_double_escape_end(t: Tokeniser) -> None:
    _handle_data_double_escape(t, SCRIPT_DATA_ESCAPED, SCRIPT_DATA_DOUBLE_ESCAPED)


def _s_before_attr_name(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == "/":
        t.state = SELF_CLOSING_START_TAG
    elif c == "<":
        t._unconsume()
        t.error("< before attr name")
        t.emit_tag_pending()
        t.state = DATA
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == "\x00":
        t._unconsume()
        t.error("null before attr name")
        t._tag.new_attribute()
        t.state = ATTR_NAME
    elif c == EOF:
        t.error("eof before attr name")
        t.state = DATA
    elif c in _QUOTE_EQ:
        t.error("quote before attr name")
        t._tag.new_attribute()
        t._tag.append_attr_name(c, t.pos - 1, t.pos)
        t.state = ATTR_NAME
    else:
        t._tag.new_attribute()
        t._unconsume()
        t.state = ATTR_NAME


def _s_attr_name(t: Tokeniser) -> None:
    p0 = t.pos
    name = t._consume_scan(_ATTR_NAME_SCAN)
    if name:
        t._tag.append_attr_name(name, p0, t.pos)
    c = t._consume()
    if c in _WS:
        t.state = AFTER_ATTR_NAME
    elif c == "/":
        t.state = SELF_CLOSING_START_TAG
    elif c == "=":
        t.state = BEFORE_ATTR_VALUE
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof in attr name")
        t.state = DATA
    elif c in _QUOTE_LT:
        t.error("quote in attr name")
        t._tag.append_attr_name(c, t.pos - 1, t.pos)
    else:
        t._tag.append_attr_name(c, t.pos - 1, t.pos)


def _s_after_attr_name(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == "/":
        t.state = SELF_CLOSING_START_TAG
    elif c == "=":
        t.state = BEFORE_ATTR_VALUE
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == "\x00":
        t.error("null after attr name")
        t._tag.append_attr_name(REPLACEMENT, t.pos - 1, t.pos)
        t.state = ATTR_NAME
    elif c == EOF:
        t.error("eof after attr name")
        t.state = DATA
    elif c in _QUOTE_LT:
        t.error("quote after attr name")
        t._tag.new_attribute()
        t._tag.append_attr_name(c, t.pos - 1, t.pos)
        t.state = ATTR_NAME
    else:
        t._tag.new_attribute()
        t._unconsume()
        t.state = ATTR_NAME


def _s_before_attr_value(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == '"':
        t.state = ATTR_VALUE_DQ
    elif c == "&":
        t._unconsume()
        t.state = ATTR_VALUE_UNQUOTED
    elif c == "'":
        t.state = ATTR_VALUE_SQ
    elif c == "\x00":
        t.error("null before attr value")
        t._tag.append_attr_value(REPLACEMENT, t.pos - 1, t.pos)
        t.state = ATTR_VALUE_UNQUOTED
    elif c == EOF:
        t.error("eof before attr value")
        t.emit_tag_pending()
        t.state = DATA
    elif c == ">":
        t.error("> before attr value")
        t.emit_tag_pending()
        t.state = DATA
    elif c in _LT_EQ_BT:
        t.error("unexpected before attr value")
        t._tag.append_attr_value(c, t.pos - 1, t.pos)
        t.state = ATTR_VALUE_UNQUOTED
    else:
        t._unconsume()
        t.state = ATTR_VALUE_UNQUOTED


def _attr_value_quoted(t: Tokeniser, quote: str, scan: re.Pattern) -> None:
    p0 = t.pos
    value = t._consume_scan(scan)
    if value:
        t._tag.append_attr_value(value, p0, t.pos)
    else:
        t._tag.set_empty_attr_value(t.pos)
    c = t._consume()
    if c == quote:
        t.state = AFTER_ATTR_VALUE_QUOTED
    elif c == "&":
        amp = t.pos - 1
        ref = t.consume_char_ref(quote, True)
        t._tag.append_attr_value(ref if ref is not None else "&",
                                 amp, t.pos)
    elif c == "\x00":
        t.error("null in attr value")
        t._tag.append_attr_value(REPLACEMENT, t.pos - 1, t.pos)
    elif c == EOF:
        t.error("eof in attr value")
        t.state = DATA
    else:
        t._tag.append_attr_value(c, t.pos - 1, t.pos)


def _s_attr_value_dq(t: Tokeniser) -> None:
    _attr_value_quoted(t, '"', _ATTR_VAL_DQ_SCAN)


def _s_attr_value_sq(t: Tokeniser) -> None:
    _attr_value_quoted(t, "'", _ATTR_VAL_SQ_SCAN)


def _s_attr_value_unquoted(t: Tokeniser) -> None:
    p0 = t.pos
    value = t._consume_scan(_ATTR_VAL_UNQ_SCAN)
    if value:
        t._tag.append_attr_value(value, p0, t.pos)
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_ATTR_NAME
    elif c == "&":
        amp = t.pos - 1
        ref = t.consume_char_ref(">", True)
        t._tag.append_attr_value(ref if ref is not None else "&",
                                 amp, t.pos)
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == "\x00":
        t.error("null in attr value")
        t._tag.append_attr_value(REPLACEMENT, t.pos - 1, t.pos)
    elif c == EOF:
        t.error("eof in attr value")
        t.state = DATA
    elif c in _UNQ_ERR:
        t.error("quote in unquoted attr value")
        t._tag.append_attr_value(c, t.pos - 1, t.pos)
    else:
        t._tag.append_attr_value(c, t.pos - 1, t.pos)


def _s_after_attr_value_quoted(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_ATTR_NAME
    elif c == "/":
        t.state = SELF_CLOSING_START_TAG
    elif c == ">":
        t.emit_tag_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof after attr value")
        t.state = DATA
    else:
        t._unconsume()
        t.error("unexpected after attr value")
        t.state = BEFORE_ATTR_NAME


def _s_self_closing_start_tag(t: Tokeniser) -> None:
    c = t._consume()
    if c == ">":
        t._tag.self_closing = True
        t.emit_tag_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof in self closing tag")
        t.state = DATA
    else:
        t._unconsume()
        t.error("unexpected in self closing tag")
        t.state = BEFORE_ATTR_NAME


def _s_bogus_comment(t: Tokeniser) -> None:
    t._comment.data.append(t._consume_to_char(">"))
    if t.pos < t.n:
        t.pos += 1  # consume '>'
    t.emit_comment_pending()
    t.state = DATA


def _s_markup_decl_open(t: Tokeniser) -> None:
    if t._match_consume("--"):
        t.create_comment_pending()
        t.state = COMMENT_START
    elif t._match_consume_ic("DOCTYPE"):
        t.state = DOCTYPE_STATE
    elif t._match_consume("[CDATA["):
        t.create_temp_buffer()
        t.state = CDATA_SECTION
    else:
        t.error("markup decl open")
        t.create_comment_pending(bogus=True)
        t.state = BOGUS_COMMENT


def _s_comment_start(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t.state = COMMENT_START_DASH
    elif c == "\x00":
        t.error("null in comment")
        t._comment.data.append(REPLACEMENT)
        t.state = COMMENT_STATE
    elif c == ">":
        t.error("> in comment start")
        t.emit_comment_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof in comment")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._unconsume()
        t.state = COMMENT_STATE


def _s_comment_start_dash(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t.state = COMMENT_END
    elif c == "\x00":
        t.error("null in comment")
        t._comment.data.append(REPLACEMENT)
        t.state = COMMENT_STATE
    elif c == ">":
        t.error("> in comment start dash")
        t.emit_comment_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof in comment")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._comment.data.append(c)
        t.state = COMMENT_STATE


def _s_comment(t: Tokeniser) -> None:
    c = t._current()
    if c == "-":
        t.pos += 1
        t.state = COMMENT_END_DASH
    elif c == "\x00":
        t.error("null in comment")
        t.pos += 1
        t._comment.data.append(REPLACEMENT)
    elif c == EOF:
        t.error("eof in comment")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._comment.data.append(t._consume_scan(_COMMENT_SCAN))


def _s_comment_end_dash(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t.state = COMMENT_END
    elif c == "\x00":
        t.error("null in comment")
        t._comment.data.append("-" + REPLACEMENT)
        t.state = COMMENT_STATE
    elif c == EOF:
        t.error("eof in comment")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._comment.data.append("-" + c)
        t.state = COMMENT_STATE


def _s_comment_end(t: Tokeniser) -> None:
    c = t._consume()
    if c == ">":
        t.emit_comment_pending()
        t.state = DATA
    elif c == "\x00":
        t.error("null in comment end")
        t._comment.data.append("--" + REPLACEMENT)
        t.state = COMMENT_STATE
    elif c == "!":
        t.state = COMMENT_END_BANG
    elif c == "-":
        t._comment.data.append("-")
    elif c == EOF:
        t.error("eof in comment end")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._comment.data.append("--" + c)
        t.state = COMMENT_STATE


def _s_comment_end_bang(t: Tokeniser) -> None:
    c = t._consume()
    if c == "-":
        t._comment.data.append("--!")
        t.state = COMMENT_END_DASH
    elif c == ">":
        t.emit_comment_pending()
        t.state = DATA
    elif c == "\x00":
        t.error("null in comment end bang")
        t._comment.data.append("--!" + REPLACEMENT)
        t.state = COMMENT_STATE
    elif c == EOF:
        t.error("eof in comment end bang")
        t.emit_comment_pending()
        t.state = DATA
    else:
        t._comment.data.append("--!" + c)
        t.state = COMMENT_STATE


def _s_doctype(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_DOCTYPE_NAME
    elif c == EOF:
        t.error("eof in doctype")
        t.create_doctype_pending()
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == ">":
        t.error("> in doctype")
        t.create_doctype_pending()
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected in doctype")
        t._unconsume()
        t.state = BEFORE_DOCTYPE_NAME


def _s_before_doctype_name(t: Tokeniser) -> None:
    if t._matches_ascii_alpha():
        t.create_doctype_pending()
        t.state = DOCTYPE_NAME
        return
    c = t._consume()
    if c in _WS:
        return
    if c == "\x00":
        t.error("null in doctype name")
        t.create_doctype_pending()
        t._doctype.name.append(REPLACEMENT)
        t.state = DOCTYPE_NAME
    elif c == EOF:
        t.error("eof in doctype")
        t.create_doctype_pending()
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.create_doctype_pending()
        t._doctype.name.append(c)
        t.state = DOCTYPE_NAME


def _s_doctype_name(t: Tokeniser) -> None:
    if t._matches_letter():
        t._doctype.name.append(t._consume_letters())
        return
    c = t._consume()
    if c == ">":
        t.emit_doctype_pending()
        t.state = DATA
    elif c in _WS:
        t.state = AFTER_DOCTYPE_NAME
    elif c == "\x00":
        t.error("null in doctype name")
        t._doctype.name.append(REPLACEMENT)
    elif c == EOF:
        t.error("eof in doctype name")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t._doctype.name.append(c)


def _s_after_doctype_name(t: Tokeniser) -> None:
    if t.pos >= t.n:
        t.error("eof after doctype name")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
        return
    c = t._current()
    if c in _WS:
        t.pos += 1
    elif c == ">":
        t.emit_doctype_pending()
        t.pos += 1
        t.state = DATA
    elif t._match_consume_ic("PUBLIC"):
        t._doctype.pub_sys_key = "PUBLIC"
        t.state = AFTER_DOCTYPE_PUBLIC_KEYWORD
    elif t._match_consume_ic("SYSTEM"):
        t._doctype.pub_sys_key = "SYSTEM"
        t.state = AFTER_DOCTYPE_SYSTEM_KEYWORD
    else:
        t.error("unexpected after doctype name")
        t._doctype.force_quirks = True
        t.pos += 1
        t.state = BOGUS_DOCTYPE


def _s_after_doctype_public_keyword(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_DOCTYPE_PUBLIC_ID
    elif c == '"':
        t.error("quote after public keyword")
        t.state = DOCTYPE_PUBLIC_ID_DQ
    elif c == "'":
        t.error("quote after public keyword")
        t.state = DOCTYPE_PUBLIC_ID_SQ
    elif c == ">":
        t.error("> after public keyword")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof after public keyword")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected after public keyword")
        t._doctype.force_quirks = True
        t.state = BOGUS_DOCTYPE


def _s_before_doctype_public_id(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == '"':
        t.state = DOCTYPE_PUBLIC_ID_DQ
    elif c == "'":
        t.state = DOCTYPE_PUBLIC_ID_SQ
    elif c == ">":
        t.error("> before public id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof before public id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected before public id")
        t._doctype.force_quirks = True
        t.state = BOGUS_DOCTYPE


def _doctype_id_quoted(t: Tokeniser, quote: str, target: list,
                       after_state: int) -> None:
    c = t._consume()
    if c == quote:
        t.state = after_state
    elif c == "\x00":
        t.error("null in doctype id")
        target.append(REPLACEMENT)
    elif c == ">":
        t.error("> in doctype id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof in doctype id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        target.append(c)


def _s_doctype_public_id_dq(t: Tokeniser) -> None:
    _doctype_id_quoted(t, '"', t._doctype.public_identifier,
                       AFTER_DOCTYPE_PUBLIC_ID)


def _s_doctype_public_id_sq(t: Tokeniser) -> None:
    _doctype_id_quoted(t, "'", t._doctype.public_identifier,
                       AFTER_DOCTYPE_PUBLIC_ID)


def _s_after_doctype_public_id(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        t.state = BETWEEN_DOCTYPE_PUBLIC_AND_SYSTEM
    elif c == ">":
        t.emit_doctype_pending()
        t.state = DATA
    elif c == '"':
        t.error("quote after public id")
        t.state = DOCTYPE_SYSTEM_ID_DQ
    elif c == "'":
        t.error("quote after public id")
        t.state = DOCTYPE_SYSTEM_ID_SQ
    elif c == EOF:
        t.error("eof after public id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected after public id")
        t._doctype.force_quirks = True
        t.state = BOGUS_DOCTYPE


def _s_between_doctype_public_and_system(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == ">":
        t.emit_doctype_pending()
        t.state = DATA
    elif c == '"':
        t.error("quote between ids")
        t.state = DOCTYPE_SYSTEM_ID_DQ
    elif c == "'":
        t.error("quote between ids")
        t.state = DOCTYPE_SYSTEM_ID_SQ
    elif c == EOF:
        t.error("eof between ids")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected between ids")
        t._doctype.force_quirks = True
        t.state = BOGUS_DOCTYPE


def _s_after_doctype_system_keyword(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        t.state = BEFORE_DOCTYPE_SYSTEM_ID
    elif c == ">":
        t.error("> after system keyword")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == '"':
        t.error("quote after system keyword")
        t.state = DOCTYPE_SYSTEM_ID_DQ
    elif c == "'":
        t.error("quote after system keyword")
        t.state = DOCTYPE_SYSTEM_ID_SQ
    elif c == EOF:
        t.error("eof after system keyword")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected after system keyword")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()


def _s_before_doctype_system_id(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == '"':
        t.state = DOCTYPE_SYSTEM_ID_DQ
    elif c == "'":
        t.state = DOCTYPE_SYSTEM_ID_SQ
    elif c == ">":
        t.error("> before system id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof before system id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected before system id")
        t._doctype.force_quirks = True
        t.state = BOGUS_DOCTYPE


def _s_doctype_system_id_dq(t: Tokeniser) -> None:
    _doctype_id_quoted(t, '"', t._doctype.system_identifier,
                       AFTER_DOCTYPE_SYSTEM_ID)


def _s_doctype_system_id_sq(t: Tokeniser) -> None:
    _doctype_id_quoted(t, "'", t._doctype.system_identifier,
                       AFTER_DOCTYPE_SYSTEM_ID)


def _s_after_doctype_system_id(t: Tokeniser) -> None:
    c = t._consume()
    if c in _WS:
        return
    if c == ">":
        t.emit_doctype_pending()
        t.state = DATA
    elif c == EOF:
        t.error("eof after system id")
        t._doctype.force_quirks = True
        t.emit_doctype_pending()
        t.state = DATA
    else:
        t.error("unexpected after system id")
        t.state = BOGUS_DOCTYPE


def _s_bogus_doctype(t: Tokeniser) -> None:
    c = t._consume()
    if c == ">" or c == EOF:
        t.emit_doctype_pending()
        t.state = DATA
    # else: discard


def _s_cdata_section(t: Tokeniser) -> None:
    data = t._consume_to_str("]]>")
    t._data_buffer.append(data)
    if t._match_consume("]]>") or t.pos >= t.n:
        t._emit_token(CDataTok("".join(t._data_buffer)))
        t.state = DATA


_STATES = [
    _s_data, _s_char_ref_in_data, _s_rcdata, _s_char_ref_in_rcdata,
    _s_rawtext, _s_script_data, _s_plaintext, _s_tag_open, _s_end_tag_open,
    _s_tag_name, _s_rcdata_lt, _s_rcdata_end_tag_open, _s_rcdata_end_tag_name,
    _s_rawtext_lt, _s_rawtext_end_tag_open, _s_rawtext_end_tag_name,
    _s_script_data_lt, _s_script_data_end_tag_open, _s_script_data_end_tag_name,
    _s_script_data_escape_start, _s_script_data_escape_start_dash,
    _s_script_data_escaped, _s_script_data_escaped_dash,
    _s_script_data_escaped_dash_dash, _s_script_data_escaped_lt,
    _s_script_data_escaped_end_tag_open, _s_script_data_escaped_end_tag_name,
    _s_script_data_double_escape_start, _s_script_data_double_escaped,
    _s_script_data_double_escaped_dash, _s_script_data_double_escaped_dash_dash,
    _s_script_data_double_escaped_lt, _s_script_data_double_escape_end,
    _s_before_attr_name, _s_attr_name, _s_after_attr_name,
    _s_before_attr_value, _s_attr_value_dq, _s_attr_value_sq,
    _s_attr_value_unquoted, _s_after_attr_value_quoted,
    _s_self_closing_start_tag, _s_bogus_comment, _s_markup_decl_open,
    _s_comment_start, _s_comment_start_dash, _s_comment, _s_comment_end_dash,
    _s_comment_end, _s_comment_end_bang, _s_doctype, _s_before_doctype_name,
    _s_doctype_name, _s_after_doctype_name, _s_after_doctype_public_keyword,
    _s_before_doctype_public_id, _s_doctype_public_id_dq,
    _s_doctype_public_id_sq, _s_after_doctype_public_id,
    _s_between_doctype_public_and_system, _s_after_doctype_system_keyword,
    _s_before_doctype_system_id, _s_doctype_system_id_dq,
    _s_doctype_system_id_sq, _s_after_doctype_system_id, _s_bogus_doctype,
    _s_cdata_section,
]
assert len(_STATES) == 67
