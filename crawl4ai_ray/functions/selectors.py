"""Lightweight DOM + CSS-selector subset (stdlib only — lxml/bs4 absent).

Supports the selector features the reference's JSON-CSS extraction schemas
use (/root/reference/crawl4ai/extraction_strategy.py:804-1242): tag,
``.class``, ``#id``, ``tag.class``, ``[attr]``/``[attr=value]``, descendant
combinator (space), child combinator (``>``), comma groups, ``:nth-child``
is NOT supported (documented limitation).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID = {"img", "br", "hr", "meta", "link", "input", "source", "base",
         "area", "col", "embed", "param", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text_parts")

    def __init__(self, tag: str, attrs: dict, parent=None):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.parent = parent
        self.text_parts: list[str] = []

    # -- text ---------------------------------------------------------------

    def text(self) -> str:
        out: list[str] = []

        def walk(n: Node):
            for i, part in enumerate(n.text_parts):
                out.append(part)
            for c in n.children:
                walk(c)

        walk(self)
        return re.sub(r"\s+", " ", "".join(out)).strip()

    def html(self) -> str:
        attrs = "".join(
            f' {k}="{v}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        inner = "".join(p for p in self.text_parts) + "".join(
            c.html() for c in self.children
        )
        if self.tag in _VOID:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].text_parts.append(data)


def parse_dom(html: str) -> Node:
    b = _DomBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


# -- selector engine --------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([.#]\w[\w-]*|\[[^\]]+\])")


def _match_simple(node: Node, simple: str) -> bool:
    m = _SIMPLE_RE.fullmatch(simple.strip())
    if not m:
        return False
    tag = m.group("tag")
    if tag and tag != "*" and node.tag != tag.lower():
        return False
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            if part[1:] not in node.classes():
                return False
        elif part.startswith("#"):
            if node.attrs.get("id") != part[1:]:
                return False
        elif part.startswith("["):
            inner = part[1:-1]
            if "=" in inner:
                k, _, v = inner.partition("=")
                if node.attrs.get(k.strip()) != v.strip().strip("\"'"):
                    return False
            else:
                if inner.strip() not in node.attrs:
                    return False
    return True


def select(root: Node, selector: str) -> list[Node]:
    """All nodes under root matching the selector (document order)."""
    results: list[Node] = []
    seen = set()
    for group in selector.split(","):
        tokens = group.replace(">", " > ").split()
        if not tokens:
            continue
        matched = _select_tokens(root, tokens)
        for n in matched:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    # document order
    order = {id(n): i for i, n in enumerate(root.iter())}
    results.sort(key=lambda n: order.get(id(n), 1 << 30))
    return results


# -- XPath subset engine ----------------------------------------------------

_XP_STEP = re.compile(r"(//|/)((?:[^/\[]|\[[^\]]*\])+)")
_XP_PRED = re.compile(r"\[([^\]]*)\]")


def _xp_parse(expr: str):
    """Parse an XPath subset expression into (axis, name, [predicates]).

    Grammar covered (the shapes the reference's JsonXPathExtractionStrategy
    schemas and its naive _basic_css_to_xpath conversion emit —
    extraction_strategy.py:1645-1667): ``//tag``, ``/tag``, ``.//tag``,
    ``./tag``, ``*``, chained steps, predicates ``[@attr='v']``,
    ``[@attr]``, ``[n]`` (1-based position), ``[contains(@attr,'v')]``,
    ``[text()='v']``."""
    expr = expr.strip()
    if expr.startswith("."):
        expr = expr[1:]
    steps = []
    for axis, step in _XP_STEP.findall(expr):
        preds = _XP_PRED.findall(step)
        name = _XP_PRED.sub("", step).strip()
        steps.append((axis, name, preds))
    return steps


def _xp_pred_match(node: Node, pred: str) -> bool:
    pred = pred.strip()
    m = re.fullmatch(r"contains\(\s*@([\w-]+)\s*,\s*['\"](.*)['\"]\s*\)",
                     pred)
    if m:
        return m.group(2) in (node.attrs.get(m.group(1)) or "")
    m = re.fullmatch(r"contains\(\s*text\(\)\s*,\s*['\"](.*)['\"]\s*\)",
                     pred)
    if m:
        return m.group(1) in node.text()
    m = re.fullmatch(r"text\(\)\s*=\s*['\"](.*)['\"]", pred)
    if m:
        return node.text() == m.group(1)
    m = re.fullmatch(r"@([\w-]+)\s*=\s*['\"](.*)['\"]", pred)
    if m:
        return node.attrs.get(m.group(1)) == m.group(2)
    m = re.fullmatch(r"@([\w-]+)", pred)
    if m:
        return m.group(1) in node.attrs
    return False


def xpath_select(root: Node, expr: str) -> list[Node]:
    """Evaluate the XPath subset relative to ``root``; document order."""
    steps = _xp_parse(expr)
    if not steps:
        # "." / "./" = the context node itself
        return [root] if expr.strip() in (".", "./") else []
    current = [root]
    for axis, name, preds in steps:
        nxt: list[Node] = []
        nxt_ids: set[int] = set()
        for base in current:
            pool = (
                [n for n in base.iter() if n is not base] if axis == "//"
                else base.children
            )
            cands = [n for n in pool
                     if name == "*" or n.tag == name.lower()]
            for pred in preds:
                if re.fullmatch(r"\d+", pred.strip()):
                    # XPath positional semantics: [n] binds per PARENT
                    # (lxml's //p[1] returns the first p of EVERY parent,
                    # not the first of the pooled descendants)
                    i = int(pred) - 1          # 1-based position
                    by_parent: dict[int, list[Node]] = {}
                    order: list[int] = []
                    for n in cands:
                        pid = id(n.parent)
                        if pid not in by_parent:
                            by_parent[pid] = []
                            order.append(pid)
                        by_parent[pid].append(n)
                    cands = [by_parent[pid][i] for pid in order
                             if i < len(by_parent[pid])]
                else:
                    cands = [n for n in cands if _xp_pred_match(n, pred)]
            for n in cands:
                if id(n) not in nxt_ids:
                    nxt_ids.add(id(n))
                    nxt.append(n)
        current = nxt
    order = {id(n): i for i, n in enumerate(root.iter())}
    return sorted(current, key=lambda n: order.get(id(n), 1 << 30))


def css_to_xpath(css_selector: str) -> str:
    """The reference's naive CSS→XPath fallback (extraction_strategy.py:
    1645-1658): selectors containing '/' pass through as XPath; otherwise
    ' > ' maps to child steps and ' ' to descendant steps."""
    if "/" in css_selector or css_selector.strip() == ".":
        return css_selector
    if " > " in css_selector:
        return "//" + "/".join(css_selector.split(" > "))
    if " " in css_selector:
        return "//" + "//".join(css_selector.split(" "))
    return "//" + css_selector


def _select_tokens(root: Node, tokens: list[str]) -> list[Node]:
    current = [root]
    child_only = False
    for tok in tokens:
        if tok == ">":
            child_only = True
            continue
        nxt: list[Node] = []
        nxt_ids = set()
        for base in current:
            pool = (
                base.children if child_only
                else [n for n in base.iter() if n is not base]
            )
            for n in pool:
                if _match_simple(n, tok) and id(n) not in nxt_ids:
                    nxt_ids.add(id(n))
                    nxt.append(n)
        current = nxt
        child_only = False
    return current
