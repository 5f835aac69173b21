"""Source position helpers — the reference's Range / Position surface
(nodes/Range.kt) over the char-offset spans the tokenizer and tree
builder stamp on nodes (`TextNode.span`, `Element.span` /
`Element.end_span`, `Comment.span`).

The reference renders a position as ``line,column:pos`` (1-based
line/column, 0-based char offset) and a range as ``start-end``.
Implicitly-created or synthetically-closed nodes carry ``None`` spans
here (the reference stamps zero-width implicit ranges instead — a
documented deviation; `is_implicit` on a None span is True)."""

from __future__ import annotations

from bisect import bisect_right


class SourceMap:
    """Offset → (line, column) converter for one source document."""

    def __init__(self, source: str):
        self.source = source
        # offsets one past each newline = start offset of each line > 1
        starts = [0]
        idx = source.find("\n")
        while idx != -1:
            starts.append(idx + 1)
            idx = source.find("\n", idx + 1)
        self._line_starts = starts

    def line_col(self, pos: int) -> tuple[int, int]:
        line = bisect_right(self._line_starts, pos)
        return line, pos - self._line_starts[line - 1] + 1

    def fmt_pos(self, pos: int) -> str:
        line, col = self.line_col(pos)
        return f"{line},{col}:{pos}"

    def fmt_range(self, span: tuple | None) -> str:
        """Render a (start, end) span as the reference's Range string,
        e.g. ``1,1:0-2,12:19``; None (implicit) renders as 'untracked'."""
        if span is None:
            return "untracked"
        return f"{self.fmt_pos(span[0])}-{self.fmt_pos(span[1])}"


def is_tracked(span: tuple | None) -> bool:
    return span is not None
