"""TEDS — Tree-Edit-Distance Similarity for tables, from scratch.

Pipeline pieces (reference parity targets, not copies):

- :class:`TableNode` — tree node with ``tag, colspan, rowspan, content,
  children`` mirroring the reference's TableTree shape
  (packages/docling-metrics-table/docling_metrics_table/utils/teds.py:37-43).
- bracket serialization / parsing — the wire format used to ship trees
  across process boundaries in the reference (teds.py:45-165, C++ parser
  cpp_src/parser/bracket_notation_parser.h). In our engine the bracket
  string is a DataFrame STRING column; trees are parsed inside the UDF.
- :func:`html_to_tree` — stdlib ``html.parser`` DOM walk replacing the
  reference's lxml walk (teds.py:211-244): th normalized to td,
  colspan/rowspan attributes parsed with default 1, cell text
  char-tokenized.
- :func:`tree_edit_distance` — the Zhang–Shasha algorithm (Zhang & Shasha,
  SIAM J. Comput. 1989 — published) with the reference's custom costs
  (teds.py:13-34): insert/delete cost 1; rename cost 1 if tag/colspan/rowspan
  differ, else the normalized character Levenshtein of cell content for
  td/th, else 0. (The reference's C++ path uses APTED with identical costs;
  Zhang–Shasha computes the same exact TED value, per the north rule which
  names Zhang-Shasha explicitly.)
- :func:`teds_score` — ``1 − distance / max(n_nodes_a, n_nodes_b)`` with
  node counts taken from the full trees (C++ path semantics,
  cpp_src/pybind/teds_manager.h:87-96).

Malformed bracket strings raise ``ValueError`` — the reference surfaces an
(error_id, error_msg) channel and re-raises (docling_metrics_table.py:219-220);
our UDFs catch and emit an error struct column.
"""

from __future__ import annotations

import ast
import json
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from docling_metrics_spark.kernels.levenshtein import levenshtein


@dataclass
class TableNode:
    tag: str
    colspan: int | None = None
    rowspan: int | None = None
    content: list[str] | None = None
    children: list["TableNode"] = field(default_factory=list)
    # header provenance (th tag or thead ancestor) — carried for the GriTS
    # cells schema; ignored by TEDS costs and bracket serialization, where
    # th is normalized to td (reference teds.py:219-221)
    header: bool = False

    def is_cell(self) -> bool:
        return self.tag in ("td", "th")

    def size(self) -> int:
        return 1 + sum(c.size() for c in self.children)


# ---------------------------------------------------------------------------
# Bracket notation (wire format for trees in a STRING column)
# ---------------------------------------------------------------------------

# Deepest nesting accepted from ANY tree input (HTML or raw bracket wire
# format) — see the parser note below.
MAX_TABLE_DEPTH = 200

_TAG_RE = re.compile(r'\s*"tag":\s*(\w+)')
_SPAN_RE = re.compile(r'\s*,\s*"colspan":\s*(\d+)\s*,\s*"rowspan":\s*(\d+)')
_TEXT_RE = re.compile(r'\s*,\s*"text":\s*(\[.*?\])(?=\s*[{}])', re.DOTALL)


def tree_to_bracket(node: TableNode) -> str:
    """Serialize a tree to bracket notation."""
    parts: list[str] = []
    _serialize(node, parts)
    return "".join(parts)


def _serialize(node: TableNode, out: list[str]) -> None:
    if node.is_cell():
        out.append(
            '{"tag": %s, "colspan": %d, "rowspan": %d, "text": %s'
            % (
                node.tag,
                node.colspan or 1,
                node.rowspan or 1,
                json.dumps(node.content or []),
            )
        )
    else:
        out.append('{"tag": %s' % node.tag)
    for child in node.children:
        _serialize(child, out)
    out.append("}")


def bracket_to_tree(s: str) -> TableNode:
    """Parse bracket notation into a tree; raises ValueError on malformed input."""
    node, pos = _parse_node(s, 0)
    while pos < len(s) and s[pos].isspace():
        pos += 1
    if pos != len(s):
        raise ValueError(f"trailing data at position {pos} in bracket string")
    return node


def _parse_node(s: str, pos: int, depth: int = 0) -> tuple[TableNode, int]:
    if depth > MAX_TABLE_DEPTH:
        # raw bracket strings are external wire-format input; cap nesting
        # here too so hostile payloads surface as ValueError, not
        # RecursionError (see MAX_TABLE_DEPTH)
        raise ValueError(
            f"bracket nesting deeper than {MAX_TABLE_DEPTH} levels"
        )
    while pos < len(s) and s[pos].isspace():
        pos += 1
    if pos >= len(s) or s[pos] != "{":
        raise ValueError(f"expected '{{' at position {pos}")
    pos += 1
    m = _TAG_RE.match(s, pos)
    if not m:
        raise ValueError(f"missing tag at position {pos}")
    tag = m.group(1)
    pos = m.end()

    node = TableNode(tag)
    span_m = _SPAN_RE.match(s, pos)
    if span_m:
        node.colspan = int(span_m.group(1))
        node.rowspan = int(span_m.group(2))
        pos = span_m.end()
        text_m = _TEXT_RE.match(s, pos)
        if text_m:
            pos = text_m.end()
            lit = text_m.group(1)
            try:
                node.content = [str(t) for t in json.loads(lit)]
            except ValueError:
                try:
                    node.content = [str(t) for t in ast.literal_eval(lit)]
                except (ValueError, SyntaxError) as exc:
                    raise ValueError(
                        f"bad text literal at position {pos}"
                    ) from exc
        else:
            node.content = []

    while True:
        while pos < len(s) and s[pos].isspace():
            pos += 1
        if pos >= len(s):
            raise ValueError("unexpected end of bracket string")
        if s[pos] == "}":
            return node, pos + 1
        if s[pos] == "{":
            child, pos = _parse_node(s, pos, depth + 1)
            node.children.append(child)
        else:
            raise ValueError(f"unexpected character {s[pos]!r} at position {pos}")


# ---------------------------------------------------------------------------
# HTML table -> tree (stdlib html.parser; replaces the reference's lxml walk)
# ---------------------------------------------------------------------------

_STRUCTURAL_TAGS = {"table", "thead", "tbody", "tfoot", "tr", "caption", "colgroup", "col"}


# Why the depth cap: downstream tree walks (size, serialization,
# Zhang-Shasha) use Python recursion; without a cap one adversarial
# document with thousands of nested <table> tags raises RecursionError —
# which is NOT the ValueError the Arrow UDF error channels catch — and
# kills the executor task. 200 is far beyond any real table and well
# inside the default recursion limit.


class _TableHTMLParser(HTMLParser):
    def __init__(self, structure_only: bool) -> None:
        super().__init__(convert_charrefs=True)
        self.structure_only = structure_only
        self.root: TableNode | None = None
        self._stack: list[TableNode] = []
        self._cell_depth = 0  # >0 while inside a td/th

    def handle_starttag(self, tag, attrs):
        if len(self._stack) > MAX_TABLE_DEPTH:
            raise ValueError(
                f"table nesting deeper than {MAX_TABLE_DEPTH} levels"
            )
        if tag in ("td", "th"):
            attr = dict(attrs)
            node = TableNode(
                "td",  # th normalized to td (reference teds.py:219-221)
                colspan=_int_attr(attr.get("colspan"), 1),
                rowspan=_int_attr(attr.get("rowspan"), 1),
                content=[],
                header=tag == "th"
                or any(n.tag == "thead" for n in self._stack),
            )
            self._attach(node)
            self._stack.append(node)
            self._cell_depth += 1
        elif tag in _STRUCTURAL_TAGS:
            node = TableNode(tag)
            self._attach(node)
            if tag not in ("col",):  # void element
                self._stack.append(node)
        # other tags inside cells (b, i, span…) contribute text only

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            if self._stack and self._stack[-1].tag == "td":
                self._stack.pop()
                self._cell_depth -= 1
        elif tag in _STRUCTURAL_TAGS and tag != "col":
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i].tag == tag:
                    del self._stack[i:]
                    break

    def handle_data(self, data):
        if self._cell_depth > 0 and not self.structure_only and data:
            cell = self._stack[-1]
            if cell.content is not None:
                # char-tokenized cell text (reference teds.py:197-209)
                cell.content.extend(data)

    def _attach(self, node: TableNode) -> None:
        if self.root is None:
            self.root = node
        elif self._stack:
            self._stack[-1].children.append(node)


def _int_attr(value, default: int) -> int:
    try:
        return int(value)
    except (TypeError, ValueError):
        return default


def html_to_tree(html: str, structure_only: bool = False) -> TableNode:
    """Parse a ``<table>…</table>`` HTML string into a TableNode tree."""
    p = _TableHTMLParser(structure_only)
    p.feed(html)
    p.close()
    if p.root is None:
        raise ValueError("no <table> element found in HTML")
    return p.root


def html_to_bracket(html: str, structure_only: bool = False) -> str:
    return tree_to_bracket(html_to_tree(html, structure_only))


def bracket_to_html(bracket: str) -> str:
    """Rebuild HTML from a bracket tree (spans emitted only when > 1,
    reference teds.py:257-277)."""
    return _node_to_html(bracket_to_tree(bracket))


def _node_to_html(node: TableNode) -> str:
    if node.is_cell():
        attrs = ""
        if (node.colspan or 1) > 1:
            attrs += f' colspan="{node.colspan}"'
        if (node.rowspan or 1) > 1:
            attrs += f' rowspan="{node.rowspan}"'
        text = "".join(node.content or [])
        return f"<td{attrs}>{text}</td>"
    inner = "".join(_node_to_html(c) for c in node.children)
    return f"<{node.tag}>{inner}</{node.tag}>"


# ---------------------------------------------------------------------------
# Zhang–Shasha tree edit distance with the reference's custom costs
# ---------------------------------------------------------------------------


def rename_cost(n1: TableNode, n2: TableNode) -> float:
    """Reference CustomConfig.rename semantics (teds.py:23-34)."""
    if (
        n1.tag != n2.tag
        or (n1.colspan or None) != (n2.colspan or None)
        or (n1.rowspan or None) != (n2.rowspan or None)
    ):
        return 1.0
    if n1.tag in ("td", "th"):
        c1, c2 = n1.content or [], n2.content or []
        if c1 or c2:
            return levenshtein(c1, c2) / max(len(c1), len(c2))
    return 0.0


def _postorder(root: TableNode) -> tuple[list[TableNode], list[int]]:
    """Iterative postorder; returns (nodes, leftmost-leaf index per node)."""
    nodes: list[TableNode] = []
    lml: list[int] = []

    def visit(node: TableNode) -> int:
        if not node.children:
            nodes.append(node)
            lml.append(len(nodes) - 1)
            return len(nodes) - 1
        first_leaf = None
        for child in node.children:
            idx = visit(child)
            if first_leaf is None:
                first_leaf = lml[idx]
        nodes.append(node)
        lml.append(first_leaf)
        return len(nodes) - 1

    visit(root)
    return nodes, lml


def tree_edit_distance(root1: TableNode, root2: TableNode) -> float:
    """Zhang–Shasha TED with unit insert/delete and custom rename cost."""
    t1, l1 = _postorder(root1)
    t2, l2 = _postorder(root2)
    _rename_memo.clear()
    n1, n2 = len(t1), len(t2)

    # keyroot = last node (in postorder) with its leftmost-leaf value
    keyroots1 = sorted({l1[i]: i for i in range(n1)}.values())
    keyroots2 = sorted({l2[i]: i for i in range(n2)}.values())

    td = [[0.0] * n2 for _ in range(n1)]

    for k1 in keyroots1:
        for k2 in keyroots2:
            _treedist(k1, k2, t1, t2, l1, l2, td)
    return td[n1 - 1][n2 - 1]


_rename_memo: dict[tuple[int, int], float] = {}


def _treedist(i: int, j: int, t1, t2, l1, l2, td) -> None:
    li, lj = l1[i], l2[j]
    m = i - li + 2
    n = j - lj + 2
    fd = [[0.0] * n for _ in range(m)]
    for x in range(1, m):
        fd[x][0] = fd[x - 1][0] + 1.0  # delete
    for y in range(1, n):
        fd[0][y] = fd[0][y - 1] + 1.0  # insert
    for x in range(1, m):
        node1 = t1[li + x - 1]
        for y in range(1, n):
            node2 = t2[lj + y - 1]
            if l1[li + x - 1] == li and l2[lj + y - 1] == lj:
                memo_key = (id(node1), id(node2))
                cost = _rename_memo.get(memo_key)
                if cost is None:
                    cost = rename_cost(node1, node2)
                    _rename_memo[memo_key] = cost
                fd[x][y] = min(
                    fd[x - 1][y] + 1.0,
                    fd[x][y - 1] + 1.0,
                    fd[x - 1][y - 1] + cost,
                )
                td[li + x - 1][lj + y - 1] = fd[x][y]
            else:
                p = l1[li + x - 1] - li
                q = l2[lj + y - 1] - lj
                fd[x][y] = min(
                    fd[x - 1][y] + 1.0,
                    fd[x][y - 1] + 1.0,
                    fd[p][q] + td[li + x - 1][lj + y - 1],
                )


def teds_detail_from_brackets(bracket_a: str, bracket_b: str) -> tuple[float, int, int]:
    """(tree-edit distance, size_a, size_b) — the un-normalized triple
    behind :func:`teds_from_brackets`, exposed so the bracket-pairs query
    can materialize it and a SQL oracle re-derive TEDS = 1 − d/max."""
    if bracket_a == bracket_b:
        # identical serialization ⇒ identical tree ⇒ TED 0; still parse to
        # reject malformed input, and take the size from the TREE — counting
        # '{' in the string over-counts when cell text itself contains
        # braces (it is JSON-embedded), which would disagree with the
        # tree.size() reported on the non-identical path
        n = bracket_to_tree(bracket_a).size()
        return 0, n, n
    ta = bracket_to_tree(bracket_a)
    tb = bracket_to_tree(bracket_b)
    return tree_edit_distance(ta, tb), ta.size(), tb.size()


def teds_from_brackets(bracket_a: str, bracket_b: str) -> tuple[float, int, int]:
    """TEDS = 1 − TED / max(sizes); returns (teds, size_a, size_b).

    Formula: cpp_src/pybind/teds_manager.h:87-96 (C++ path node counts are
    full bracket-tree sizes)."""
    dist, na, nb = teds_detail_from_brackets(bracket_a, bracket_b)
    return 1.0 - dist / max(na, nb), na, nb


def teds_from_html(html_a: str, html_b: str, structure_only: bool = False) -> float:
    teds, _, _ = teds_from_brackets(
        html_to_bracket(html_a, structure_only),
        html_to_bracket(html_b, structure_only),
    )
    return teds
