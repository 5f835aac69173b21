"""CSS selector engine: query parser → evaluator AST → collector.

Semantics per reference ``select/QueryParser.kt`` (grammar, OR
precedence, sub-query consumption), ``select/Evaluator.kt`` (~40
evaluators with per-evaluator cost), ``select/CombiningEvaluator.kt``
(And/Or sorted by ascending cost before short-circuit),
``select/StructuralEvaluator.kt`` (parent/sibling walkers memoized per
(root, element)), ``select/Collector.kt`` (lazy DFS filter with
findFirst early exit) and ``parser/TokenQueue.kt`` (selector lexing,
CSS identifier escapes).

Compiled evaluators are cached per worker process in ``_QUERY_CACHE``
(the Ray-native analogue of the reference's compiled-selector reuse) —
compile once per actor, evaluate per document.
"""

from __future__ import annotations

import re
from typing import Iterator

from .dom import (
    CDataNode,
    Comment,
    Document,
    DocumentType,
    Element,
    PseudoTextElement,
    TextNode,
    XmlDeclaration,
    normalise_whitespace,
)
from .tags import Tag, value_of as tag_value_of


class SelectorParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# TokenQueue — selector mini-lexer (parser/TokenQueue.kt)

class TokenQueue:
    __slots__ = ("s", "pos")

    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def is_empty(self) -> bool:
        return self.pos >= len(self.s)

    def current(self) -> str:
        return self.s[self.pos]

    def consume(self) -> str:
        c = self.s[self.pos]
        self.pos += 1
        return c

    def matches(self, seq: str) -> bool:
        return self.s.startswith(seq, self.pos)

    def matches_any(self, chars: str) -> bool:
        return not self.is_empty() and self.s[self.pos] in chars

    def match_chomp(self, seq: str) -> bool:
        if self.matches(seq):
            self.pos += len(seq)
            return True
        return False

    def matches_word(self) -> bool:
        return not self.is_empty() and \
            (self.s[self.pos].isalnum() or self.s[self.pos] == "_")

    def consume_whitespace(self) -> bool:
        seen = False
        while not self.is_empty() and self.s[self.pos] in " \t\n\f\r":
            self.pos += 1
            seen = True
        return seen

    def remainder(self) -> str:
        out = self.s[self.pos:]
        self.pos = len(self.s)
        return out

    def consume_to(self, seq: str) -> str:
        """Consume up to (not including) the first occurrence of ``seq``
        (TokenQueue.consumeTo); rest of queue if absent."""
        idx = self.s.find(seq, self.pos)
        if idx == -1:
            return self.remainder()
        out = self.s[self.pos:idx]
        self.pos = idx
        return out

    def chomp_to_ignore_case(self, seq: str) -> str:
        """Consume up to the first case-insensitive occurrence of ``seq``
        and chomp the marker itself (TokenQueue.chompToIgnoreCase)."""
        idx = self.s.lower().find(seq.lower(), self.pos)
        if idx == -1:
            return self.remainder()
        out = self.s[self.pos:idx]
        self.pos = idx + len(seq)
        return out

    def add_first(self, seq: str) -> None:
        """Push a string onto the front of the queue
        (TokenQueue.addFirst)."""
        self.s = seq + self.s[self.pos:]
        self.pos = 0

    def consume_word(self) -> str:
        """Consume a run of letters/digits (TokenQueue.consumeWord)."""
        start = self.pos
        while not self.is_empty() and self.s[self.pos].isalnum():
            self.pos += 1
        return self.s[start:self.pos]

    def consume_to_any(self, seqs) -> str:
        start = self.pos
        n = len(self.s)
        while self.pos < n:
            if any(self.s.startswith(seq, self.pos) for seq in seqs):
                break
            self.pos += 1
        return self.s[start:self.pos]

    def chomp_balanced(self, open_ch: str, close_ch: str) -> str:
        """TokenQueue.kt:207 — consume balanced open..close, return inside.
        Handles quotes and backslash escapes."""
        start = -1
        end = -1
        depth = 0
        last = "\x00"
        in_single = False
        in_double = False
        in_regex_q = False
        while not self.is_empty():
            c = self.consume()
            if last != "\\":
                if c == "'" and c != open_ch and not in_double:
                    in_single = not in_single
                elif c == '"' and c != open_ch and not in_single:
                    in_double = not in_double
                if in_single or in_double or in_regex_q:
                    last = c
                    continue
                if c == open_ch:
                    depth += 1
                    if start == -1:
                        start = self.pos
                elif c == close_ch:
                    depth -= 1
            if depth > 0 and last != "\x00":
                end = self.pos
            last = c
            if depth <= 0 and start != -1:
                break
        out = self.s[start:end] if end >= 0 else ""
        if depth > 0:
            raise SelectorParseError(
                f"Did not find balanced marker at '{out}'")
        return out

    def consume_css_identifier(self) -> str:
        """CSS identifier incl. backslash escapes (TokenQueue.kt:294)."""
        out: list[str] = []
        s, n = self.s, len(self.s)
        while self.pos < n:
            c = s[self.pos]
            if c == "\\" and self.pos + 1 < n:
                nxt = s[self.pos + 1]
                m = re.match(r"[0-9a-fA-F]{1,6}", s[self.pos + 1:self.pos + 7])
                if m:  # hex escape
                    out.append(chr(int(m.group(), 16)))
                    self.pos += 1 + len(m.group())
                    if self.pos < n and s[self.pos] == " ":
                        self.pos += 1
                else:
                    out.append(nxt)
                    self.pos += 2
            elif c.isalnum() or c in "-_" or ord(c) >= 0x80:
                out.append(c)
                self.pos += 1
            else:
                break
        return "".join(out)

    def consume_element_selector(self) -> str:
        out: list[str] = []
        s, n = self.s, len(self.s)
        while self.pos < n:
            if s.startswith("*|", self.pos):
                out.append("*|")
                self.pos += 2
            elif s[self.pos] == "|":
                out.append("|")
                self.pos += 1
            elif s[self.pos] == "\\" and self.pos + 1 < n:
                out.append(s[self.pos + 1])
                self.pos += 2
            elif s[self.pos].isalnum() or s[self.pos] in "-_*" \
                    or ord(s[self.pos]) >= 0x80:
                out.append(s[self.pos])
                self.pos += 1
            else:
                break
        return "".join(out)

    @staticmethod
    def unescape(s: str) -> str:
        if "\\" not in s:
            return s
        out: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "\\" and i + 1 < n:
                out.append(s[i + 1])
                i += 2
            else:
                out.append(c)
                i += 1
        return "".join(out)

    @staticmethod
    def escape_css_identifier(ident: str) -> str:
        """Serialize a string as a CSS identifier (used by cssSelector)."""
        out: list[str] = []
        for i, c in enumerate(ident):
            if c.isalnum() and c.isascii() or c in "-_" or ord(c) >= 0x80:
                if i == 0 and c.isdigit():
                    out.append(f"\\{ord(c):x} ")
                else:
                    out.append(c)
            else:
                out.append("\\" + c)
        return "".join(out)


# ---------------------------------------------------------------------------
# Evaluators

class Evaluator:
    cost = 5

    def matches(self, root: Element, element: Element) -> bool:
        raise NotImplementedError

    def reset(self) -> None:
        pass


class AllElements(Evaluator):
    cost = 10

    def matches(self, root, element):
        return True

    def __repr__(self):
        return "*"


class TagIs(Evaluator):
    cost = 1

    def __init__(self, name: str):
        self.name = name

    def matches(self, root, element):
        return element.normal_name() == self.name

    def __repr__(self):
        return self.name


class TagStartsWith(Evaluator):
    def __init__(self, prefix: str):
        self.prefix = prefix

    def matches(self, root, element):
        return element.normal_name().startswith(self.prefix)

    def __repr__(self):
        return self.prefix


class TagEndsWith(Evaluator):
    def __init__(self, suffix: str):
        self.suffix = suffix

    def matches(self, root, element):
        return element.normal_name().endswith(self.suffix)

    def __repr__(self):
        return self.suffix


class IdIs(Evaluator):
    cost = 2

    def __init__(self, id_: str):
        self.id = id_

    def matches(self, root, element):
        return element.id() == self.id

    def __repr__(self):
        return f"#{self.id}"


class ClassIs(Evaluator):
    cost = 6

    def __init__(self, cls: str):
        self.cls = cls

    def matches(self, root, element):
        return element.has_class(self.cls)

    def __repr__(self):
        return f".{self.cls}"


class HasAttr(Evaluator):
    cost = 2

    def __init__(self, key: str):
        self.key = key

    def matches(self, root, element):
        return element.has_attr(self.key)

    def __repr__(self):
        return f"[{self.key}]"


class AttrStarting(Evaluator):
    cost = 6

    def __init__(self, prefix: str):
        self.prefix = prefix.lower()

    def matches(self, root, element):
        attrs = element.attributes()
        if attrs is None:
            return False
        return any(k.lower().startswith(self.prefix) for k, _ in attrs)

    def __repr__(self):
        return f"[^{self.prefix}]"


def _norm_attr_value(value: str, trim: bool = True) -> str:
    if (value.startswith("'") and value.endswith("'")) or \
            (value.startswith('"') and value.endswith('"')):
        value = value[1:-1]
    value = value.lower()
    return value.strip() if trim else value


class AttrValue(Evaluator):
    cost = 3

    def __init__(self, key: str, value: str, trim: bool = True):
        self.key = key.strip().lower()
        self.value = _norm_attr_value(value, trim)

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            self.value == element.attr(self.key).strip().lower()

    def __repr__(self):
        return f"[{self.key}={self.value}]"


class AttrValueNot(AttrValue):
    def matches(self, root, element):
        return self.value != element.attr(self.key).lower()

    def __repr__(self):
        return f"[{self.key}!={self.value}]"


class AttrValueStarting(AttrValue):
    cost = 4

    def __init__(self, key, value):
        super().__init__(key, value, trim=False)

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            element.attr(self.key).lower().startswith(self.value)

    def __repr__(self):
        return f"[{self.key}^={self.value}]"


class AttrValueEnding(AttrValue):
    cost = 4

    def __init__(self, key, value):
        super().__init__(key, value, trim=False)

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            element.attr(self.key).lower().endswith(self.value)

    def __repr__(self):
        return f"[{self.key}$={self.value}]"


class AttrValueContaining(AttrValue):
    cost = 6

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            self.value in element.attr(self.key).lower()

    def __repr__(self):
        return f"[{self.key}*={self.value}]"


class AttrValueMatching(Evaluator):
    cost = 8

    def __init__(self, key: str, pattern: re.Pattern):
        self.key = key.strip().lower()
        self.pattern = pattern

    def matches(self, root, element):
        return element.has_attr(self.key) and \
            self.pattern.search(element.attr(self.key)) is not None

    def __repr__(self):
        return f"[{self.key}~={self.pattern.pattern}]"


class IndexLessThan(Evaluator):
    def __init__(self, index: int):
        self.index = index

    def matches(self, root, element):
        return root is not element and \
            element.element_sibling_index() < self.index

    def __repr__(self):
        return f":lt({self.index})"


class IndexGreaterThan(Evaluator):
    def __init__(self, index: int):
        self.index = index

    def matches(self, root, element):
        return element.element_sibling_index() > self.index

    def __repr__(self):
        return f":gt({self.index})"


class IndexEquals(Evaluator):
    def __init__(self, index: int):
        self.index = index

    def matches(self, root, element):
        return element.element_sibling_index() == self.index

    def __repr__(self):
        return f":eq({self.index})"


class IsFirstChild(Evaluator):
    def matches(self, root, element):
        p = element.parent()
        return p is not None and not isinstance(p, Document) and \
            element is p.first_element_child()

    def __repr__(self):
        return ":first-child"


class IsLastChild(Evaluator):
    def matches(self, root, element):
        p = element.parent()
        return p is not None and not isinstance(p, Document) and \
            element is p.last_element_child()

    def __repr__(self):
        return ":last-child"


class IsOnlyChild(Evaluator):
    def matches(self, root, element):
        p = element.parent()
        return p is not None and not isinstance(p, Document) and \
            not element.sibling_elements()

    def __repr__(self):
        return ":only-child"


class IsOnlyOfType(Evaluator):
    def matches(self, root, element):
        p = element.parent()
        if p is None or isinstance(p, Document):
            return False
        pos = 0
        for sib in p.children():
            if sib.normal_name() == element.normal_name():
                pos += 1
            if pos > 1:
                break
        return pos == 1

    def __repr__(self):
        return ":only-of-type"


class IsRoot(Evaluator):
    cost = 1

    def matches(self, root, element):
        r = root.first_element_child() if isinstance(root, Document) else root
        return element is r

    def __repr__(self):
        return ":root"


class IsEmpty(Evaluator):
    def matches(self, root, element):
        for n in element.child_nodes():
            if isinstance(n, TextNode):
                if not n.is_blank():
                    return False
            elif not isinstance(n, (Comment, XmlDeclaration, DocumentType)):
                return False
        return True

    def __repr__(self):
        return ":empty"


class CssNth(Evaluator):
    pseudo_class: str = ""

    def __init__(self, a: int, b: int):
        self.a = a
        self.b = b

    def __repr__(self):
        if self.a == 0:
            return f":{self.pseudo_class}({self.b})"
        if self.b == 0:
            return f":{self.pseudo_class}({self.a}n)"
        sign = "+" if self.b >= 0 else ""
        return f":{self.pseudo_class}({self.a}n{sign}{self.b})"

    def calc(self, root, element) -> int:
        raise NotImplementedError

    def matches(self, root, element):
        p = element.parent()
        if p is None or isinstance(p, Document):
            return False
        pos = self.calc(root, element)
        if self.a == 0:
            return pos == self.b
        return (pos - self.b) * self.a >= 0 and (pos - self.b) % self.a == 0


class IsNthChild(CssNth):
    pseudo_class = "nth-child"

    def calc(self, root, element):
        return element.element_sibling_index() + 1


class IsNthLastChild(CssNth):
    pseudo_class = "nth-last-child"

    def calc(self, root, element):
        p = element.parent()
        if p is None:
            return 0
        return len(p.children()) - element.element_sibling_index()


class IsNthOfType(CssNth):
    pseudo_class = "nth-of-type"

    def calc(self, root, element):
        p = element.parent()
        if p is None:
            return 0
        pos = 0
        name = element.normal_name()
        for node in p.child_nodes():
            if node.normal_name() == name:
                pos += 1
            if node is element:
                break
        return pos


class IsNthLastOfType(CssNth):
    pseudo_class = "nth-last-of-type"

    def calc(self, root, element):
        if element.parent() is None:
            return 0
        pos = 0
        name = element.normal_name()
        nxt = element
        while nxt is not None:
            if nxt.normal_name() == name:
                pos += 1
            nxt = nxt.next_element_sibling()
        return pos


class IsFirstOfType(IsNthOfType):
    def __init__(self):
        super().__init__(0, 1)

    def __repr__(self):
        return ":first-of-type"


class IsLastOfType(IsNthLastOfType):
    def __init__(self):
        super().__init__(0, 1)

    def __repr__(self):
        return ":last-of-type"


class ContainsText(Evaluator):
    cost = 10

    def __init__(self, text: str):
        self.text = normalise_whitespace(text).lower()

    def matches(self, root, element):
        return self.text in element.text().lower()

    def __repr__(self):
        return f":contains({self.text})"


class ContainsOwnText(Evaluator):
    def __init__(self, text: str):
        self.text = normalise_whitespace(text).lower()

    def matches(self, root, element):
        return self.text in element.own_text().lower()

    def __repr__(self):
        return f":containsOwn({self.text})"


class ContainsWholeText(Evaluator):
    cost = 10

    def __init__(self, text: str):
        self.text = text

    def matches(self, root, element):
        return self.text in element.whole_text()

    def __repr__(self):
        return f":containsWholeText({self.text})"


class ContainsWholeOwnText(Evaluator):
    def __init__(self, text: str):
        self.text = text

    def matches(self, root, element):
        return self.text in element.whole_own_text()

    def __repr__(self):
        return f":containsWholeOwnText({self.text})"


class ContainsData(Evaluator):
    def __init__(self, text: str):
        self.text = text.lower()

    def matches(self, root, element):
        return self.text in element.data().lower()

    def __repr__(self):
        return f":containsData({self.text})"


class MatchesRe(Evaluator):
    cost = 8

    def __init__(self, pattern: re.Pattern):
        self.pattern = pattern

    def matches(self, root, element):
        return self.pattern.search(element.text()) is not None

    def __repr__(self):
        return f":matches({self.pattern.pattern})"


class MatchesOwnRe(MatchesRe):
    cost = 7

    def matches(self, root, element):
        return self.pattern.search(element.own_text()) is not None

    def __repr__(self):
        return f":matchesOwn({self.pattern.pattern})"


class MatchesWholeTextRe(MatchesRe):
    def matches(self, root, element):
        return self.pattern.search(element.whole_text()) is not None

    def __repr__(self):
        return f":matchesWholeText({self.pattern.pattern})"


class MatchesWholeOwnTextRe(MatchesRe):
    cost = 7

    def matches(self, root, element):
        return self.pattern.search(element.whole_own_text()) is not None

    def __repr__(self):
        return f":matchesWholeOwnText({self.pattern.pattern})"


class MatchText(Evaluator):
    cost = -1  # forces first evaluation; rewrites text nodes into pseudo els

    def matches(self, root, element):
        if isinstance(element, PseudoTextElement):
            return True
        for text_node in element.text_nodes():
            attrs = element.attributes()
            pel = PseudoTextElement(
                tag_value_of(element.tag_name(), element.tag.namespace,
                             preserve_case=True),
                element.base_uri(),
                attrs.clone() if attrs is not None else None)
            text_node.replace_with(pel)
            pel.append_child(text_node)
        return False

    def __repr__(self):
        return ":matchText"


# -- combining / structural

class And(Evaluator):
    def __init__(self, evaluators: list[Evaluator]):
        self.evaluators = list(evaluators)
        self.sorted_evals = sorted(self.evaluators, key=lambda e: e.cost)
        self.cost = sum(e.cost for e in self.evaluators)

    def matches(self, root, element):
        for e in self.sorted_evals:
            if not e.matches(root, element):
                return False
        return True

    def reset(self):
        for e in self.evaluators:
            e.reset()

    def __repr__(self):
        return "".join(repr(e) for e in self.evaluators)


class Or(Evaluator):
    def __init__(self, evaluators: list[Evaluator] | None = None):
        self.evaluators: list[Evaluator] = list(evaluators or [])
        self._resort()

    def _resort(self):
        self.sorted_evals = sorted(self.evaluators, key=lambda e: e.cost)
        self.cost = sum(e.cost for e in self.evaluators) + 2

    def add(self, e: Evaluator) -> None:
        self.evaluators.append(e)
        self._resort()

    def rightmost(self) -> Evaluator | None:
        return self.evaluators[-1] if self.evaluators else None

    def replace_rightmost(self, e: Evaluator) -> None:
        self.evaluators[-1] = e
        self._resort()

    def matches(self, root, element):
        for e in self.sorted_evals:
            if e.matches(root, element):
                return True
        return False

    def reset(self):
        for e in self.evaluators:
            e.reset()

    def __repr__(self):
        return ", ".join(repr(e) for e in self.evaluators)


class Structural(Evaluator):
    def __init__(self, evaluator: Evaluator):
        self.evaluator = evaluator
        self._memo: dict[int, dict[int, bool]] = {}

    def memo_matches(self, root: Element, element: Element) -> bool:
        root_memo = self._memo.get(id(root))
        if root_memo is None:
            root_memo = {}
            self._memo[id(root)] = root_memo
        key = id(element)
        hit = root_memo.get(key)
        if hit is None:
            hit = self.evaluator.matches(root, element)
            root_memo[key] = hit
        return hit

    def reset(self):
        self._memo.clear()
        self.evaluator.reset()


class Root(Evaluator):
    cost = 1

    def matches(self, root, element):
        return root is element

    def __repr__(self):
        return ""


class Has(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 10 * evaluator.cost
        self.check_siblings = self._wants_siblings(evaluator)

    @staticmethod
    def _wants_siblings(e: Evaluator) -> bool:
        if isinstance(e, (And, Or)):
            return any(isinstance(inner, (PreviousSibling,
                                          ImmediatePreviousSibling))
                       for inner in e.evaluators)
        return False

    def matches(self, root, element):
        if self.check_siblings:
            sib = _first_element_sibling(element)
            while sib is not None:
                if sib is not element and \
                        self.evaluator.matches(element, sib):
                    return True
                sib = sib.next_element_sibling()
        for el in element.stream():
            if el is element:
                continue
            if self.evaluator.matches(element, el):
                return True
        return False

    def __repr__(self):
        return f":has({self.evaluator!r})"


class Is(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 2 + evaluator.cost

    def matches(self, root, element):
        return self.evaluator.matches(root, element)

    def __repr__(self):
        return f":is({self.evaluator!r})"


class Not(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 2 + evaluator.cost

    def matches(self, root, element):
        return not self.memo_matches(root, element)

    def __repr__(self):
        return f":not({self.evaluator!r})"


class Parent(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 2 * evaluator.cost

    def matches(self, root, element):
        if root is element:
            return False
        parent = element.parent()
        while parent is not None:
            if self.memo_matches(root, parent):
                return True
            if parent is root:
                break
            parent = parent.parent()
        return False

    def __repr__(self):
        return f"{self.evaluator!r} "


class ImmediateParentRun(Evaluator):
    def __init__(self, evaluator: Evaluator):
        self.evaluators = [evaluator]
        self.cost = 2 + evaluator.cost

    def add(self, evaluator: Evaluator) -> None:
        self.evaluators.append(evaluator)
        self.cost += evaluator.cost

    def matches(self, root, element):
        if element is root:
            return False
        el = element
        for i in range(len(self.evaluators) - 1, -1, -1):
            if el is None:
                return False
            if not self.evaluators[i].matches(root, el):
                return False
            el = el.parent()
        return True

    def reset(self):
        for e in self.evaluators:
            e.reset()

    def __repr__(self):
        return " > ".join(repr(e) for e in self.evaluators)


class PreviousSibling(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 3 * evaluator.cost

    def matches(self, root, element):
        if root is element:
            return False
        sibling = _first_element_sibling(element)
        while sibling is not None:
            if sibling is element:
                break
            if self.memo_matches(root, sibling):
                return True
            sibling = sibling.next_element_sibling()
        return False

    def __repr__(self):
        return f"{self.evaluator!r} ~ "


class ImmediatePreviousSibling(Structural):
    def __init__(self, evaluator: Evaluator):
        super().__init__(evaluator)
        self.cost = 2 + evaluator.cost

    def matches(self, root, element):
        if root is element:
            return False
        prev = element.previous_element_sibling()
        return prev is not None and self.memo_matches(root, prev)

    def __repr__(self):
        return f"{self.evaluator!r} + "


def _first_element_sibling(element: Element) -> Element | None:
    p = element.parent()
    if p is None:
        return element
    return p.first_element_child()


# ---------------------------------------------------------------------------
# QueryParser

_COMBINATORS = ",>+~ "
_ATTRIBUTE_EVALS = ("=", "!=", "^=", "$=", "*=", "~=")
_NTH_AB = re.compile(r"(([+-])?(\d+)?)n(\s*([+-])?\s*\d+)?", re.I)
_NTH_B = re.compile(r"([+-])?(\d+)")


def _js_supported_regex(regex: str) -> re.Pattern:
    """Reference maps (?i) etc. — python re handles inline flags natively."""
    return re.compile(regex)


class QueryParser:
    def __init__(self, query: str):
        query = query.strip()
        if not query:
            raise SelectorParseError("String must not be empty")
        self.query = query
        self.tq = TokenQueue(query)
        self.evals: list[Evaluator] = []

    def parse(self) -> Evaluator:
        tq = self.tq
        tq.consume_whitespace()
        if tq.matches_any(_COMBINATORS):
            self.evals.append(Root())
            self._combinator(tq.consume())
        else:
            self.evals.append(self._consume_evaluator())
        while not tq.is_empty():
            seen_white = tq.consume_whitespace()
            if tq.matches_any(_COMBINATORS):
                self._combinator(tq.consume())
            elif seen_white:
                self._combinator(" ")
            else:
                self.evals.append(self._consume_evaluator())
        if len(self.evals) == 1:
            return self.evals[0]
        return And(self.evals)

    def _combinator(self, combinator: str) -> None:
        self.tq.consume_whitespace()
        sub_query = self._consume_sub_query()
        new_eval = parse_query(sub_query)
        replace_rightmost = False
        if len(self.evals) == 1:
            current = root_eval = self.evals[0]
            if isinstance(root_eval, Or) and combinator != ",":
                current = root_eval.rightmost()
                replace_rightmost = True
        else:
            current = root_eval = And(self.evals)
        self.evals = []
        if combinator == ">":
            run = current if isinstance(current, ImmediateParentRun) \
                else ImmediateParentRun(current)
            run.add(new_eval)
            current = run
        elif combinator == " ":
            current = And([Parent(current), new_eval])
        elif combinator == "+":
            current = And([ImmediatePreviousSibling(current), new_eval])
        elif combinator == "~":
            current = And([PreviousSibling(current), new_eval])
        elif combinator == ",":
            if isinstance(current, Or):
                or_ = current
            else:
                or_ = Or()
                or_.add(current)
            or_.add(new_eval)
            current = or_
        else:
            raise SelectorParseError(f"Unknown combinator '{combinator}'")
        if replace_rightmost:
            root_eval.replace_rightmost(current)
        else:
            root_eval = current
        self.evals.append(root_eval)

    def _consume_sub_query(self) -> str:
        tq = self.tq
        sq: list[str] = []
        seen_clause = False
        while not tq.is_empty():
            if tq.matches_any(_COMBINATORS):
                if seen_clause:
                    break
                sq.append(tq.consume())
                continue
            seen_clause = True
            if tq.matches("("):
                sq.append("(" + tq.chomp_balanced("(", ")") + ")")
            elif tq.matches("["):
                sq.append("[" + tq.chomp_balanced("[", "]") + "]")
            elif tq.matches("\\"):
                sq.append(tq.consume())
                if not tq.is_empty():
                    sq.append(tq.consume())
            else:
                sq.append(tq.consume())
        return "".join(sq)

    def _consume_evaluator(self) -> Evaluator:
        tq = self.tq
        if tq.match_chomp("#"):
            ident = tq.consume_css_identifier()
            if not ident:
                raise SelectorParseError("empty id selector")
            return IdIs(ident)
        elif tq.match_chomp("."):
            ident = tq.consume_css_identifier()
            if not ident:
                raise SelectorParseError("empty class selector")
            return ClassIs(ident.strip())
        elif tq.matches_word() or tq.matches("*|"):
            return self._by_tag()
        elif tq.matches("["):
            return self._by_attribute()
        elif tq.match_chomp("*"):
            return AllElements()
        elif tq.match_chomp(":"):
            return self._parse_pseudo()
        raise SelectorParseError(
            f"Could not parse query '{self.query}': unexpected token at "
            f"'{tq.remainder()}'")

    def _by_tag(self) -> Evaluator:
        name = self.tq.consume_element_selector().strip().lower()
        if not name:
            raise SelectorParseError("empty tag selector")
        if name.startswith("*|"):
            plain = name[2:]
            return Or([TagIs(plain), TagEndsWith(":" + plain)])
        elif name.endswith("|*"):
            return TagStartsWith(name[:-2] + ":")
        elif "|" in name:
            name = name.replace("|", ":")
        return TagIs(name)

    def _by_attribute(self) -> Evaluator:
        cq = TokenQueue(self.tq.chomp_balanced("[", "]"))
        key = cq.consume_to_any(_ATTRIBUTE_EVALS)
        if not key:
            raise SelectorParseError("empty attribute selector")
        cq.consume_whitespace()
        if cq.is_empty():
            if key.startswith("^"):
                return AttrStarting(key[1:])
            if key == "*":
                return AttrStarting("")
            return HasAttr(key.strip().lower())
        if cq.match_chomp("="):
            return AttrValue(key, cq.remainder())
        if cq.match_chomp("!="):
            return AttrValueNot(key, cq.remainder())
        if cq.match_chomp("^="):
            return AttrValueStarting(key, cq.remainder())
        if cq.match_chomp("$="):
            return AttrValueEnding(key, cq.remainder())
        if cq.match_chomp("*="):
            return AttrValueContaining(key, cq.remainder())
        if cq.match_chomp("~="):
            return AttrValueMatching(key, _js_supported_regex(cq.remainder()))
        raise SelectorParseError(
            f"Could not parse attribute query '{self.query}'")

    def _consume_parens(self) -> str:
        return self.tq.chomp_balanced("(", ")")

    def _consume_index(self) -> int:
        index = self._consume_parens().strip()
        if not index.isdigit():
            raise SelectorParseError("Index must be numeric")
        return int(index)

    def _css_nth_child(self, backwards: bool, of_type: bool) -> Evaluator:
        arg = self._consume_parens().strip().lower()
        m_ab = _NTH_AB.fullmatch(arg)
        m_b = _NTH_B.fullmatch(arg)
        if arg == "odd":
            a, b = 2, 1
        elif arg == "even":
            a, b = 2, 0
        elif m_ab is not None:
            a = int(m_ab.group(1).lstrip("+")) \
                if m_ab.group(3) is not None else \
                (-1 if m_ab.group(2) == "-" else 1)
            b = int(m_ab.group(4).replace(" ", "").lstrip("+")) \
                if m_ab.group(4) is not None else 0
        elif m_b is not None:
            a = 0
            b = int(arg.lstrip("+"))
        else:
            raise SelectorParseError(f"Could not parse nth-index '{arg}'")
        if of_type:
            return IsNthLastOfType(a, b) if backwards else IsNthOfType(a, b)
        return IsNthLastChild(a, b) if backwards else IsNthChild(a, b)

    def _parse_pseudo(self) -> Evaluator:
        pseudo = self.tq.consume_css_identifier()
        if pseudo == "lt":
            return IndexLessThan(self._consume_index())
        if pseudo == "gt":
            return IndexGreaterThan(self._consume_index())
        if pseudo == "eq":
            return IndexEquals(self._consume_index())
        if pseudo == "has":
            return Has(parse_query(self._consume_parens()))
        if pseudo == "is":
            return Is(parse_query(self._consume_parens()))
        if pseudo == "contains":
            return ContainsText(TokenQueue.unescape(self._consume_parens()))
        if pseudo == "containsOwn":
            return ContainsOwnText(TokenQueue.unescape(self._consume_parens()))
        if pseudo == "containsWholeText":
            return ContainsWholeText(
                TokenQueue.unescape(self._consume_parens()))
        if pseudo == "containsWholeOwnText":
            return ContainsWholeOwnText(
                TokenQueue.unescape(self._consume_parens()))
        if pseudo == "containsData":
            return ContainsData(TokenQueue.unescape(self._consume_parens()))
        if pseudo == "matches":
            return MatchesRe(_js_supported_regex(self._consume_parens()))
        if pseudo == "matchesOwn":
            return MatchesOwnRe(_js_supported_regex(self._consume_parens()))
        if pseudo == "matchesWholeText":
            return MatchesWholeTextRe(
                _js_supported_regex(self._consume_parens()))
        if pseudo == "matchesWholeOwnText":
            return MatchesWholeOwnTextRe(
                _js_supported_regex(self._consume_parens()))
        if pseudo == "not":
            return Not(parse_query(self._consume_parens()))
        if pseudo == "nth-child":
            return self._css_nth_child(False, False)
        if pseudo == "nth-last-child":
            return self._css_nth_child(True, False)
        if pseudo == "nth-of-type":
            return self._css_nth_child(False, True)
        if pseudo == "nth-last-of-type":
            return self._css_nth_child(True, True)
        if pseudo == "first-child":
            return IsFirstChild()
        if pseudo == "last-child":
            return IsLastChild()
        if pseudo == "first-of-type":
            return IsFirstOfType()
        if pseudo == "last-of-type":
            return IsLastOfType()
        if pseudo == "only-child":
            return IsOnlyChild()
        if pseudo == "only-of-type":
            return IsOnlyOfType()
        if pseudo == "empty":
            return IsEmpty()
        if pseudo == "root":
            return IsRoot()
        if pseudo == "matchText":
            return MatchText()
        raise SelectorParseError(
            f"Could not parse query '{self.query}': unknown pseudo "
            f"':{pseudo}'")


_QUERY_CACHE: dict[str, Evaluator] = {}
_QUERY_CACHE_MAX = 2048


def parse_query(query: str) -> Evaluator:
    cached = _QUERY_CACHE.get(query)
    if cached is not None:
        return cached
    ev = QueryParser(query).parse()
    if len(_QUERY_CACHE) < _QUERY_CACHE_MAX:
        _QUERY_CACHE[query.strip()] = ev
    return ev


# ---------------------------------------------------------------------------
# EvaluatorDebug.sexpr (ksoup-test select/EvaluatorDebug.kt:49-87): render
# the parsed evaluator tree as an s-expression with the REFERENCE's class
# names, so parse-tree goldens can be compared verbatim.

_SEXPR_NAMES = {
    "TagIs": "Tag",
    "IdIs": "Id",
    "ClassIs": "Class",
    "HasAttr": "Attribute",
    "AttrStarting": "AttributeStarting",
    "AttrValue": "AttributeWithValue",
    "AttrValueNot": "AttributeWithValueNot",
    "AttrValueStarting": "AttributeWithValueStarting",
    "AttrValueEnding": "AttributeWithValueEnding",
    "AttrValueContaining": "AttributeWithValueContaining",
    "AttrValueMatching": "AttributeWithValueMatching",
    "MatchesRe": "Matches",
    "MatchesOwnRe": "MatchesOwn",
    "MatchesWholeTextRe": "MatchesWholeText",
    "MatchesWholeOwnTextRe": "MatchesWholeOwnText",
}


def sexpr(query: str | Evaluator) -> str:
    """Debug s-expression of a parsed query, e.g.
    ``(And (Tag 'b')(Parent (Tag 'a')))`` — combining evaluators render
    children in cost-sorted order (as the reference's asElement walks
    ``sortedEvaluators``)."""
    ev = parse_query(query) if isinstance(query, str) else query
    out: list[str] = []
    _sexpr_walk(ev, out)
    return "".join(out)


def _sexpr_walk(ev: Evaluator, out: list[str]) -> None:
    name = type(ev).__name__
    out.append("(" + _SEXPR_NAMES.get(name, name))
    if isinstance(ev, (And, Or)):
        children = ev.sorted_evals
    elif isinstance(ev, ImmediateParentRun):
        children = ev.evaluators
    elif isinstance(ev, Structural):
        children = [ev.evaluator]
    else:
        children = []
    if children:
        out.append(" ")
        for child in children:
            _sexpr_walk(child, out)
    else:
        out.append(f" '{ev!r}'")
    out.append(")")


# ---------------------------------------------------------------------------
# Collector (select/Collector.kt:17-41)

def _tag_union(ev: Evaluator) -> set[str] | None:
    """If the evaluator is a pure tag-name union (``script, style, nav``
    — the boilerplate-strip shape), return the name set for a fast
    set-lookup walk; else None."""
    if isinstance(ev, TagIs):
        return {ev.name}
    if isinstance(ev, Or) and ev.evaluators and \
            all(isinstance(e, TagIs) for e in ev.evaluators):
        return {e.name for e in ev.evaluators}
    return None


def collect(evaluator: Evaluator, root: Element) -> list[Element]:
    evaluator.reset()
    out: list[Element] = []
    # inline iterative pre-order walk (hot path: one evaluator call per
    # element, no generator machinery)
    names = _tag_union(evaluator)
    stack: list = [root]
    pop = stack.pop
    if names is not None:
        while stack:
            node = pop()
            if isinstance(node, Element):
                if node.tag.normal_name in names:
                    out.append(node)
                kids = node._child_nodes
                if kids:
                    stack.extend(reversed(kids))
        return out
    matches = evaluator.matches
    while stack:
        node = pop()
        if isinstance(node, Element):
            if matches(root, node):
                out.append(node)
            kids = node._child_nodes
            if kids:
                stack.extend(reversed(kids))
    return out


def find_first(evaluator: Evaluator, root: Element) -> Element | None:
    evaluator.reset()
    matches = evaluator.matches
    stack: list = [root]
    pop = stack.pop
    while stack:
        node = pop()
        if isinstance(node, Element):
            if matches(root, node):
                return node
            kids = node._child_nodes
            if kids:
                stack.extend(reversed(kids))
    return None


def select(query: str | Evaluator, root: Element) -> list[Element]:
    ev = parse_query(query) if isinstance(query, str) else query
    return collect(ev, root)


def select_first(query: str | Evaluator, root: Element) -> Element | None:
    ev = parse_query(query) if isinstance(query, str) else query
    return find_first(ev, root)


def select_in_roots(query: str, roots: list[Element]) -> list[Element]:
    """Selector.select(query, roots) — union w/ identity dedup
    (Selector.kt:123-140)."""
    ev = parse_query(query)
    seen: set[int] = set()
    out: list[Element] = []
    for root in roots:
        for el in collect(ev, root):
            if id(el) not in seen:
                seen.add(id(el))
                out.append(el)
    return out


def filter_out(elements: list[Element], out_els: list[Element]) -> list[Element]:
    """Selector.filterOut (Selector.kt:144-160)."""
    excluded = {id(e) for e in out_els}
    return [e for e in elements if id(e) not in excluded]
