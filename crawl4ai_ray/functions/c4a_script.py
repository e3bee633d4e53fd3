"""C4A-Script compiler — behavioral port of the reference's scripting
layer (reference ``crawl4ai/script/c4ai_script.py:1-690``,
``c4a_compile.py:1-397``, ``c4a_result.py:1-219``).

C4A-Script is the reference's tiny page-interaction DSL (``GO`` /
``CLICK`` / ``WAIT`` / ``IF`` / ``REPEAT`` / ``PROC`` ...) compiled to a
list of JavaScript statements that feed ``CrawlerRunConfig(js_code=...)``.
The compile step is pure text→text data-plane (the browser that would
EXECUTE the JS is out of this engine's scope, like S7); a user's script
library compiles here unchanged.

Implementation: the reference parses with a lark LALR grammar
(``c4ai_script.py:131-193``); lark is absent in this environment, so
this module implements its own line-oriented tokenizer +
recursive-descent parser for the same grammar, then reproduces the
reference's passes and JS emission law-for-law:

- AST→IR laws of ``ASTBuilder`` (``c4ai_script.py:211-319``): WAIT
  payload typing (number→seconds, quoted→text, backticks/bare→selector,
  float() coercion so ``WAIT 3`` emits ``3.0*1000``), click
  selector-vs-coords dispatch, SCROLL default 500, string stripping.
- Pass order of ``Compiler.compile`` (``:331-340``): parse+includes →
  collect procs → inline top-level calls → apply SETVARs → emit,
  dropping NOP (comment) commands at the end. QUIRKS preserved: nested
  ``PROC`` definitions inside a body are silently dropped
  (``:294`` keeps only Cmd children); ``$var`` substitution applies
  only to top-level ``TYPE``/``EVAL``/``SET`` args (``:382``) — never
  inside ``IF``/``REPEAT`` bodies; calls nested in ``IF``/``REPEAT``
  inline at emission time (``:603-617``), after the SETVAR pass.
- JS emission byte-for-byte with ``_emit_js`` (``:387-588``) including
  the ``textwrap.dedent`` quirk: templates interpolating multi-line
  inner JS (IF/REPEAT) end up NOT dedented because the inner lines
  start at column 0, so the outer template indentation survives.
- The no-exception result API (``C4ACompiler`` / ``CompilationResult``)
  with the reference's error-code mapping laws (E001 missing THEN,
  E002 missing ')', E003 missing ',', E004 missing ENDPROC, E005
  undefined procedure with call-site search, E006 selector missing
  backticks with a wrap-it fix, E999 generic) and the same
  ``to_dict``/``formatted_message`` serialization. Exact lark
  token/column internals can't be reproduced without lark; this parser
  reports the column of the offending token's first character, and the
  divergence is documented here rather than hidden.

``generate_script`` (LLM completion → script, ``c4a_compile.py:322``)
is out of sandbox scope with the other live-LLM surfaces; the pluggable
client plumbing lives in ``functions/llm_extract.py``.
"""

from __future__ import annotations

import json
import pathlib
import re
import textwrap
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional, Union

__all__ = [
    "compile_string", "compile_file", "compile_lines",
    "C4ACompiler", "C4AScriptError",
    "CompilationResult", "ValidationResult", "ErrorDetail",
    "WarningDetail", "ErrorType", "Severity", "Suggestion",
    "c4a_compile", "c4a_validate",
]


# --------------------------------------------------------------------------
# result model (c4a_result.py laws)
# --------------------------------------------------------------------------

class ErrorType(Enum):
    SYNTAX = "syntax"
    SEMANTIC = "semantic"
    RUNTIME = "runtime"


class Severity(Enum):
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"


@dataclass
class Suggestion:
    message: str
    fix: Optional[str] = None

    def to_dict(self) -> dict:
        return {"message": self.message, "fix": self.fix}


@dataclass
class ErrorDetail:
    type: ErrorType
    code: str
    severity: Severity
    message: str
    line: int
    column: int
    source_line: str
    end_line: Optional[int] = None
    end_column: Optional[int] = None
    line_before: Optional[str] = None
    line_after: Optional[str] = None
    suggestions: List[Suggestion] = field(default_factory=list)
    documentation_url: Optional[str] = None

    def to_dict(self) -> dict:
        return {
            "type": self.type.value,
            "code": self.code,
            "severity": self.severity.value,
            "message": self.message,
            "location": {
                "line": self.line,
                "column": self.column,
                "endLine": self.end_line,
                "endColumn": self.end_column,
            },
            "context": {
                "sourceLine": self.source_line,
                "lineBefore": self.line_before,
                "lineAfter": self.line_after,
                "marker": {
                    "start": self.column - 1,
                    "length": (self.end_column - self.column)
                    if self.end_column else 1,
                },
            },
            "suggestions": [s.to_dict() for s in self.suggestions],
            "documentationUrl": self.documentation_url,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def formatted_message(self) -> str:
        lines = [f"\n{'=' * 60}"]
        lines.append(f"{self.type.value.title()} Error [{self.code}]")
        lines.append(f"{'=' * 60}")
        lines.append(f"Location: Line {self.line}, Column {self.column}")
        lines.append(f"Error: {self.message}")
        if self.source_line:
            marker = " " * (self.column - 1) + "^"
            if self.end_column:
                marker += "~" * (self.end_column - self.column - 1)
            lines.append("\nCode:")
            if self.line_before:
                lines.append(f"  {self.line - 1: >3} | {self.line_before}")
            lines.append(f"  {self.line: >3} | {self.source_line}")
            lines.append(f"      | {marker}")
            if self.line_after:
                lines.append(f"  {self.line + 1: >3} | {self.line_after}")
        if self.suggestions:
            lines.append("\nSuggestions:")
            for i, s in enumerate(self.suggestions, 1):
                lines.append(f"  {i}. {s.message}")
                if s.fix:
                    lines.append(f"     Fix: {s.fix}")
        lines.append("=" * 60)
        return "\n".join(lines)

    @property
    def simple_message(self) -> str:
        return f"Line {self.line}: {self.message}"


@dataclass
class WarningDetail:
    code: str
    message: str
    line: int
    column: int

    def to_dict(self) -> dict:
        return {"code": self.code, "message": self.message,
                "line": self.line, "column": self.column}


@dataclass
class CompilationResult:
    success: bool
    js_code: Optional[List[str]] = None
    errors: List[ErrorDetail] = field(default_factory=list)
    warnings: List[WarningDetail] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "success": self.success,
            "jsCode": self.js_code,
            "errors": [e.to_dict() for e in self.errors],
            "warnings": [w.to_dict() for w in self.warnings],
            "metadata": self.metadata,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def has_errors(self) -> bool:
        return len(self.errors) > 0

    @property
    def has_warnings(self) -> bool:
        return len(self.warnings) > 0

    @property
    def first_error(self) -> Optional[ErrorDetail]:
        return self.errors[0] if self.errors else None

    def __str__(self) -> str:
        if self.success:
            msg = "✓ Compilation successful"
            if self.js_code:
                msg += f" - {len(self.js_code)} statements generated"
            if self.warnings:
                msg += f" ({len(self.warnings)} warnings)"
            return msg
        return f"✗ Compilation failed - {len(self.errors)} error(s)"


@dataclass
class ValidationResult:
    valid: bool
    errors: List[ErrorDetail] = field(default_factory=list)
    warnings: List[WarningDetail] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "valid": self.valid,
            "errors": [e.to_dict() for e in self.errors],
            "warnings": [w.to_dict() for w in self.warnings],
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @property
    def first_error(self) -> Optional[ErrorDetail]:
        return self.errors[0] if self.errors else None


# --------------------------------------------------------------------------
# IR
# --------------------------------------------------------------------------

@dataclass
class Cmd:
    op: str
    args: List[Any]


@dataclass
class Proc:
    name: str
    body: List[Any]


# --------------------------------------------------------------------------
# parse errors (the internal shuttle the public API maps to E-codes)
# --------------------------------------------------------------------------

class _ParseError(Exception):
    """kind: one of missing_then / missing_paren / missing_comma /
    missing_endproc / missing_backticks / invalid_char / syntax."""

    def __init__(self, kind: str, message: str, line: int, column: int,
                 token_value: str = "", expected: str = ""):
        super().__init__(message)
        self.kind = kind
        self.message = message
        self.line = line
        self.column = column
        self.token_value = token_value
        self.expected = expected


class C4AScriptError(Exception):
    """Formatted compile error for the exception-style API
    (reference c4ai_script.py:20-47)."""

    def __init__(self, message: str, line: int = None, column: int = None,
                 error_type: str = "Syntax Error", details: str = None):
        self.message = message
        self.line = line
        self.column = column
        self.error_type = error_type
        self.details = details
        super().__init__(self._format_message())

    def _format_message(self) -> str:
        lines = [f"\n{'=' * 60}"]
        lines.append(f"C4A-Script {self.error_type}")
        lines.append(f"{'=' * 60}")
        if self.line:
            lines.append(
                f"Location: Line {self.line}"
                + (f", Column {self.column}" if self.column else ""))
        lines.append(f"Error: {self.message}")
        if self.details:
            lines.append(f"\nDetails: {self.details}")
        lines.append("=" * 60)
        return "\n".join(lines)


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_RES = [
    ("COMMENT", re.compile(r"#[^\n]*")),
    ("URL", re.compile(r"(?:http|https)://[^\s]+")),
    ("ESCAPED_STRING", re.compile(r'"(?:\\.|[^"\\])*"')),
    ("BACKTICK_STRING", re.compile(r"`[^`]*`")),
    ("NUMBER", re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")),
    ("NAME", re.compile(r"\$?[A-Za-z_][A-Za-z0-9_]*")),
    ("LPAR", re.compile(r"\(")),
    ("RPAR", re.compile(r"\)")),
    ("COMMA", re.compile(r",")),
    ("EQ", re.compile(r"=")),
]

# bare words that are commands, not proc calls / selectors
_KEYWORDS = {
    "WAIT", "GO", "RELOAD", "BACK", "FORWARD", "CLICK", "DOUBLE_CLICK",
    "RIGHT_CLICK", "MOVE", "DRAG", "SCROLL", "TYPE", "CLEAR", "SET",
    "PRESS", "KEY_DOWN", "KEY_UP", "EVAL", "SETVAR", "PROC", "ENDPROC",
    "USE", "IF", "THEN", "ELSE", "REPEAT", "NOT", "EXISTS",
}


@dataclass
class _Tok:
    type: str
    value: str
    line: int
    column: int  # 1-based


def _tokenize_line(text: str, lineno: int) -> List[_Tok]:
    toks: List[_Tok] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r":
            i += 1
            continue
        for ttype, rx in _TOKEN_RES:
            m = rx.match(text, i)
            if m:
                val = m.group(0)
                if ttype == "COMMENT":
                    toks.append(_Tok("COMMENT", val, lineno, i + 1))
                    return toks
                if ttype == "NAME" and val in _KEYWORDS:
                    ttype = val
                toks.append(_Tok(ttype, val, lineno, i + 1))
                i = m.end()
                break
        else:
            raise _ParseError(
                "invalid_char",
                f"Invalid character at position {i + 1}",
                lineno, i + 1, token_value=ch)
    return toks


def _strip(s: str) -> str:
    if s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    if s.startswith("`") and s.endswith("`"):
        return s[1:-1]
    return s


# --------------------------------------------------------------------------
# parser — line-oriented recursive descent over the reference grammar
# (c4ai_script.py:131-193). PROC bodies span lines; IF/REPEAT nest on
# one line (the practical shape of every reference demo/doc script; the
# lark grammar's ignored-newline cross-line command quirk is not
# reproduced — documented divergence).
# --------------------------------------------------------------------------

class _Parser:
    def __init__(self, text: str):
        self.lines = text.split("\n")

    def parse(self) -> List[Any]:
        out: List[Any] = []
        i = 0
        while i < len(self.lines):
            node, i = self._parse_line(i, in_proc=False)
            if node is not None:
                out.append(node)
        return out

    # -- line dispatch ----------------------------------------------------
    def _parse_line(self, i: int, in_proc: bool):
        toks = _tokenize_line(self.lines[i], i + 1)
        if not toks:
            return None, i + 1
        t0 = toks[0]
        if t0.type == "COMMENT":
            return Cmd("NOP", []), i + 1
        if t0.type == "PROC":
            return self._parse_proc(i, toks)
        if t0.type == "ENDPROC":
            if in_proc:
                return ("ENDPROC", t0), i + 1
            raise _ParseError("syntax", "Unexpected 'ENDPROC'",
                              t0.line, t0.column, token_value="ENDPROC")
        cmd, pos = self._parse_command(toks, 0)
        if pos < len(toks):
            t = toks[pos]
            raise _ParseError(
                "syntax", f"Unexpected '{t.value}'", t.line, t.column,
                token_value=t.value)
        return cmd, i + 1

    def _parse_proc(self, i: int, toks: List[_Tok]):
        if len(toks) < 2 or toks[1].type != "NAME":
            t = toks[1] if len(toks) > 1 else toks[0]
            raise _ParseError("syntax", "Expected procedure name",
                              t.line, t.column, token_value=t.value)
        name = toks[1].value
        body: List[Any] = []
        j = i + 1
        while True:
            if j >= len(self.lines):
                last = len(self.lines)
                raise _ParseError(
                    "missing_endproc", "Unexpected end of script",
                    last, max(1, len(self.lines[last - 1])),
                    token_value="", expected="ENDPROC")
            node, j = self._parse_line(j, in_proc=True)
            if isinstance(node, tuple) and node[0] == "ENDPROC":
                break
            if node is not None:
                body.append(node)
        # reference quirk (c4ai_script.py:294): only Cmd children
        # survive — a nested PROC is silently dropped, not registered
        return Proc(name, [b for b in body if isinstance(b, Cmd)]), j

    # -- commands ----------------------------------------------------------
    def _tok(self, toks, pos, what=""):
        if pos >= len(toks):
            last = toks[-1]
            raise _ParseError(
                "syntax", "Unexpected end of command",
                last.line, last.column + len(last.value),
                expected=what)
        return toks[pos]

    def _parse_command(self, toks: List[_Tok], pos: int):
        t = self._tok(toks, pos)
        kind = t.type

        if kind == "WAIT":
            a = self._tok(toks, pos + 1, "ESCAPED_STRING|BACKTICK_STRING|"
                                         "NUMBER")
            if a.type not in ("ESCAPED_STRING", "BACKTICK_STRING",
                              "NUMBER"):
                raise _ParseError(
                    "syntax", f"Unexpected '{a.value}'", a.line, a.column,
                    token_value=a.value,
                    expected="ESCAPED_STRING, BACKTICK_STRING, NUMBER")
            timeout = None
            npos = pos + 2
            if npos < len(toks) and toks[npos].type == "NUMBER":
                timeout = int(float(toks[npos].value))
                npos += 1
            rest_str = a.value
            try:
                payload = (float(rest_str), "seconds")
            except ValueError:
                if rest_str.startswith('"') and rest_str.endswith('"'):
                    payload = (_strip(rest_str), "text")
                elif rest_str.startswith("`") and rest_str.endswith("`"):
                    payload = (_strip(rest_str), "selector")
                else:
                    payload = (rest_str, "selector")
            return Cmd("WAIT", [payload, timeout]), npos

        if kind == "GO":
            u = self._tok(toks, pos + 1, "URL")
            if u.type != "URL":
                raise _ParseError("syntax", f"Unexpected '{u.value}'",
                                  u.line, u.column, token_value=u.value,
                                  expected="URL")
            return Cmd("GO", [u.value]), pos + 2
        if kind == "RELOAD":
            return Cmd("RELOAD", []), pos + 1
        if kind == "BACK":
            return Cmd("BACK", []), pos + 1
        if kind == "FORWARD":
            return Cmd("FORWARD", []), pos + 1

        if kind in ("CLICK", "DOUBLE_CLICK", "RIGHT_CLICK"):
            op = {"CLICK": "CLICK", "DOUBLE_CLICK": "DBLCLICK",
                  "RIGHT_CLICK": "RIGHTCLICK"}[kind]
            a = self._tok(toks, pos + 1, "BACKTICK_STRING")
            if a.type == "BACKTICK_STRING":
                return Cmd(op, [("selector", _strip(a.value))]), pos + 2
            if a.type == "NUMBER":
                b = self._tok(toks, pos + 2, "NUMBER")
                if b.type != "NUMBER":
                    raise _ParseError(
                        "syntax", f"Unexpected '{b.value}'", b.line,
                        b.column, token_value=b.value, expected="NUMBER")
                return Cmd(op, [("coords", int(float(a.value)),
                                 int(float(b.value)))]), pos + 3
            # the reference's most common beginner error: bare selector
            raise _ParseError(
                "missing_backticks", "Selector must be wrapped in "
                "backticks", a.line, a.column, token_value=a.value,
                expected="BACKTICK_STRING")

        if kind == "MOVE":
            x = self._tok(toks, pos + 1, "NUMBER")
            y = self._tok(toks, pos + 2, "NUMBER")
            self._expect_num(x)
            self._expect_num(y)
            return Cmd("MOVE", [("coords", int(float(x.value)),
                                 int(float(y.value)))]), pos + 3
        if kind == "DRAG":
            vals = []
            for k in range(4):
                tv = self._tok(toks, pos + 1 + k, "NUMBER")
                self._expect_num(tv)
                vals.append(int(float(tv.value)))
            return Cmd("DRAG", [("coords", vals[0], vals[1]),
                                ("coords", vals[2], vals[3])]), pos + 5
        if kind == "SCROLL":
            d = self._tok(toks, pos + 1, "DIR")
            if d.value.upper() not in ("UP", "DOWN", "LEFT", "RIGHT"):
                raise _ParseError("syntax", f"Unexpected '{d.value}'",
                                  d.line, d.column, token_value=d.value,
                                  expected="DIR")
            amt = None
            npos = pos + 2
            if npos < len(toks) and toks[npos].type == "NUMBER":
                amt = int(float(toks[npos].value))
                npos += 1
            return Cmd("SCROLL", [d.value.upper(),
                                  amt if amt else 500]), npos

        if kind == "TYPE":
            a = self._tok(toks, pos + 1, "ESCAPED_STRING")
            if a.type not in ("ESCAPED_STRING", "NAME"):
                raise _ParseError("syntax", f"Unexpected '{a.value}'",
                                  a.line, a.column, token_value=a.value,
                                  expected="ESCAPED_STRING, NAME")
            return Cmd("TYPE", [_strip(a.value)]), pos + 2
        if kind == "CLEAR":
            a = self._tok(toks, pos + 1, "BACKTICK_STRING")
            if a.type != "BACKTICK_STRING":
                raise _ParseError(
                    "missing_backticks", "Selector must be wrapped in "
                    "backticks", a.line, a.column, token_value=a.value,
                    expected="BACKTICK_STRING")
            return Cmd("CLEAR", [_strip(a.value)]), pos + 2
        if kind == "SET":
            sel = self._tok(toks, pos + 1, "BACKTICK_STRING")
            if sel.type != "BACKTICK_STRING":
                raise _ParseError(
                    "missing_backticks", "Selector must be wrapped in "
                    "backticks", sel.line, sel.column,
                    token_value=sel.value, expected="BACKTICK_STRING")
            val = self._tok(toks, pos + 2, "ESCAPED_STRING")
            if val.type not in ("ESCAPED_STRING", "BACKTICK_STRING",
                                "NAME"):
                raise _ParseError(
                    "syntax", f"Unexpected '{val.value}'", val.line,
                    val.column, token_value=val.value,
                    expected="ESCAPED_STRING, BACKTICK_STRING, NAME")
            return Cmd("SET", [_strip(sel.value),
                               _strip(val.value)]), pos + 3

        if kind in ("PRESS", "KEY_DOWN", "KEY_UP"):
            op = {"PRESS": "PRESS", "KEY_DOWN": "KEYDOWN",
                  "KEY_UP": "KEYUP"}[kind]
            a = self._tok(toks, pos + 1, "WORD")
            if not re.fullmatch(r"[A-Za-z0-9+]+", a.value):
                raise _ParseError("syntax", f"Unexpected '{a.value}'",
                                  a.line, a.column, token_value=a.value,
                                  expected="WORD")
            return Cmd(op, [a.value]), pos + 2

        if kind == "EVAL":
            a = self._tok(toks, pos + 1, "BACKTICK_STRING")
            if a.type != "BACKTICK_STRING":
                raise _ParseError(
                    "missing_backticks", "Selector must be wrapped in "
                    "backticks", a.line, a.column, token_value=a.value,
                    expected="BACKTICK_STRING")
            return Cmd("EVAL", [_strip(a.value)]), pos + 2

        if kind == "SETVAR":
            n = self._tok(toks, pos + 1, "NAME")
            if n.type != "NAME":
                raise _ParseError("syntax", f"Unexpected '{n.value}'",
                                  n.line, n.column, token_value=n.value,
                                  expected="NAME")
            eq = self._tok(toks, pos + 2, "EQ")
            if eq.type != "EQ":
                raise _ParseError("syntax", f"Unexpected '{eq.value}'",
                                  eq.line, eq.column,
                                  token_value=eq.value, expected="EQ")
            v = self._tok(toks, pos + 3, "value")
            if v.type not in ("ESCAPED_STRING", "BACKTICK_STRING",
                              "NUMBER"):
                raise _ParseError(
                    "syntax", f"Unexpected '{v.value}'", v.line, v.column,
                    token_value=v.value,
                    expected="ESCAPED_STRING, BACKTICK_STRING, NUMBER")
            return Cmd("SETVAR", [n.value, _strip(v.value)]), pos + 4

        if kind == "USE":
            p = self._tok(toks, pos + 1, "ESCAPED_STRING")
            if p.type != "ESCAPED_STRING":
                raise _ParseError("syntax", f"Unexpected '{p.value}'",
                                  p.line, p.column, token_value=p.value,
                                  expected="ESCAPED_STRING")
            return Cmd("INCLUDE", [_strip(p.value)]), pos + 2

        if kind == "IF":
            return self._parse_if(toks, pos)
        if kind == "REPEAT":
            return self._parse_repeat(toks, pos)

        if kind == "NAME":
            return Cmd("CALL", [t.value]), pos + 1

        raise _ParseError("syntax", f"Unexpected '{t.value}'",
                          t.line, t.column, token_value=t.value)

    def _expect_num(self, t: _Tok):
        if t.type != "NUMBER":
            raise _ParseError("syntax", f"Unexpected '{t.value}'",
                              t.line, t.column, token_value=t.value,
                              expected="NUMBER")

    # -- IF / REPEAT -------------------------------------------------------
    def _parse_if(self, toks: List[_Tok], pos: int):
        lp = self._tok(toks, pos + 1, "LPAR")
        if lp.type != "LPAR":
            raise _ParseError("syntax", f"Unexpected '{lp.value}'",
                              lp.line, lp.column, token_value=lp.value,
                              expected="LPAR")
        cond, npos = self._parse_condition(toks, pos + 2)
        rp = self._tok(toks, npos, "RPAR")
        if rp.type != "RPAR":
            raise _ParseError("missing_paren",
                              "Missing closing parenthesis ')'",
                              rp.line, rp.column, token_value=rp.value,
                              expected="RPAR")
        th = self._tok(toks, npos + 1, "THEN")
        if th.type != "THEN":
            # the reference's canonical E001 shape: IF (...) CLICK ...
            raise _ParseError(
                "missing_then",
                "Missing 'THEN' keyword after IF condition",
                th.line, th.column, token_value=th.value,
                expected="THEN")
        then_cmd, npos2 = self._parse_command(toks, npos + 2)
        else_cmd = None
        if npos2 < len(toks) and toks[npos2].type == "ELSE":
            else_cmd, npos2 = self._parse_command(toks, npos2 + 1)
        return Cmd("IF", [cond, then_cmd, else_cmd]), npos2

    def _parse_condition(self, toks: List[_Tok], pos: int):
        t = self._tok(toks, pos, "condition")
        if t.type == "NOT":
            inner, npos = self._parse_condition(toks, pos + 1)
            return ("NOT", inner), npos
        if t.type == "EXISTS":
            s = self._tok(toks, pos + 1, "BACKTICK_STRING")
            if s.type != "BACKTICK_STRING":
                raise _ParseError(
                    "missing_backticks", "Selector must be wrapped in "
                    "backticks", s.line, s.column, token_value=s.value,
                    expected="BACKTICK_STRING")
            return ("EXISTS", _strip(s.value)), pos + 2
        if t.type == "BACKTICK_STRING":
            return ("JS", _strip(t.value)), pos + 1
        raise _ParseError("syntax", f"Unexpected '{t.value}'",
                          t.line, t.column, token_value=t.value,
                          expected="NOT, EXISTS, BACKTICK_STRING")

    def _parse_repeat(self, toks: List[_Tok], pos: int):
        lp = self._tok(toks, pos + 1, "LPAR")
        if lp.type != "LPAR":
            raise _ParseError("syntax", f"Unexpected '{lp.value}'",
                              lp.line, lp.column, token_value=lp.value,
                              expected="LPAR")
        cmd, npos = self._parse_command(toks, pos + 2)
        c = self._tok(toks, npos, "COMMA")
        if c.type != "COMMA":
            raise _ParseError("missing_comma",
                              "Missing comma ',' in command",
                              c.line, c.column, token_value=c.value,
                              expected="COMMA")
        cnt = self._tok(toks, npos + 1, "NUMBER|BACKTICK_STRING")
        if cnt.type not in ("NUMBER", "BACKTICK_STRING"):
            raise _ParseError("syntax", f"Unexpected '{cnt.value}'",
                              cnt.line, cnt.column, token_value=cnt.value,
                              expected="NUMBER, BACKTICK_STRING")
        rp = self._tok(toks, npos + 2, "RPAR")
        if rp.type != "RPAR":
            raise _ParseError("missing_paren",
                              "Missing closing parenthesis ')'",
                              rp.line, rp.column, token_value=rp.value,
                              expected="RPAR")
        return Cmd("REPEAT", [cmd, cnt.value]), npos + 3


# --------------------------------------------------------------------------
# compiler passes + JS emission (c4ai_script.py:324-617 laws)
# --------------------------------------------------------------------------

class Compiler:
    def __init__(self, root: pathlib.Path | None = None):
        self.root = pathlib.Path(root or ".").resolve()
        self.vars: Dict[str, Any] = {}
        self.procs: Dict[str, Proc] = {}

    def compile(self, text: Union[str, List[str]]) -> List[str]:
        if isinstance(text, list):
            text = "\n".join(text)
        ir = self._parse_with_includes(text)
        ir = self._collect_procs(ir)
        ir = self._inline_calls(ir)
        ir = self._apply_set_vars(ir)
        return [self._emit_js(c) for c in ir
                if isinstance(c, Cmd) and c.op != "NOP"]

    def _parse_with_includes(self, txt, seen=None):
        seen = seen or set()
        cmds = _Parser(txt).parse()
        out = []
        for c in cmds:
            if isinstance(c, Cmd) and c.op == "INCLUDE":
                p = (self.root / c.args[0]).resolve()
                if p in seen:
                    raise ValueError(f"Circular include {p}")
                seen.add(p)
                out += self._parse_with_includes(p.read_text(), seen)
            else:
                out.append(c)
        return out

    def _collect_procs(self, ir):
        out = []
        for i in ir:
            if isinstance(i, Proc):
                self.procs[i.name] = i
            else:
                out.append(i)
        return out

    def _inline_calls(self, ir):
        out = []
        for c in ir:
            if isinstance(c, Cmd) and c.op == "CALL":
                if c.args[0] not in self.procs:
                    raise ValueError(f"Unknown procedure {c.args[0]!r}")
                out += self._inline_calls(self.procs[c.args[0]].body)
            else:
                out.append(c)
        return out

    def _apply_set_vars(self, ir):
        def sub(s):
            return re.sub(
                r"\$(\w+)",
                lambda m: str(self.vars.get(m.group(1), m.group(0))),
                s) if isinstance(s, str) else s

        out = []
        for c in ir:
            if isinstance(c, Cmd):
                if c.op == "SETVAR":
                    self.vars[c.args[0].lstrip("$")] = c.args[1]
                else:
                    if c.op in ("TYPE", "EVAL", "SET"):
                        c.args = [sub(a) for a in c.args]
                    out.append(c)
        return out

    # JS emitter — byte-for-byte the reference templates
    # (c4ai_script.py:387-588); dedent+strip applied AFTER interpolation
    # exactly as there, preserving the multi-line-interpolation quirk
    def _emit_js(self, cmd: Cmd) -> str:
        op, a = cmd.op, cmd.args
        if op == "GO":
            return f"window.location.href = '{a[0]}';"
        if op == "RELOAD":
            return "window.location.reload();"
        if op == "BACK":
            return "window.history.back();"
        if op == "FORWARD":
            return "window.history.forward();"

        if op == "WAIT":
            arg, kind = a[0]
            timeout = a[1] or 10
            if kind == "seconds":
                return f"await new Promise(r=>setTimeout(r,{arg}*1000));"
            if kind == "selector":
                sel = arg.replace("\\", "\\\\").replace("'", "\\'")
                return textwrap.dedent(f"""
                    await new Promise((res,rej)=>{{
                      const max = {timeout*1000}, t0 = performance.now();
                      const id = setInterval(()=>{{
                        if(document.querySelector('{sel}')){{clearInterval(id);res();}}
                        else if(performance.now()-t0>max){{clearInterval(id);rej('WAIT selector timeout');}}
                      }},100);
                    }});
                """).strip()
            if kind == "text":
                txt = arg.replace('`', '\\`')
                return textwrap.dedent(f"""
                    await new Promise((res,rej)=>{{
                      const max={timeout*1000},t0=performance.now();
                      const id=setInterval(()=>{{
                        if(document.body.innerText.includes(`{txt}`)){{clearInterval(id);res();}}
                        else if(performance.now()-t0>max){{clearInterval(id);rej('WAIT text timeout');}}
                      }},100);
                    }});
                """).strip()

        def _js_click(sel, evt="click", button=0, detail=1):
            sel = sel.replace("'", "\\'")
            return textwrap.dedent(f"""
                (()=>{{
                  const el=document.querySelector('{sel}');
                  if(el){{
                    el.focus&&el.focus();
                    el.dispatchEvent(new MouseEvent('{evt}',{{bubbles:true,button:{button},detail:{detail}}}));
                  }}
                }})();
            """).strip()

        def _js_click_xy(x, y, evt="click", button=0, detail=1):
            return textwrap.dedent(f"""
                (()=>{{
                  const el=document.elementFromPoint({x},{y});
                  if(el){{
                    el.focus&&el.focus();
                    el.dispatchEvent(new MouseEvent('{evt}',{{bubbles:true,button:{button},detail:{detail}}}));
                  }}
                }})();
            """).strip()

        if op in ("CLICK", "DBLCLICK", "RIGHTCLICK"):
            evt = {"CLICK": "click", "DBLCLICK": "dblclick",
                   "RIGHTCLICK": "contextmenu"}[op]
            btn = 2 if op == "RIGHTCLICK" else 0
            det = 2 if op == "DBLCLICK" else 1
            kind, *rest = a[0]
            return _js_click_xy(*rest) if kind == "coords" \
                else _js_click(rest[0], evt, btn, det)

        if op == "MOVE":
            _, x, y = a[0]
            return textwrap.dedent(f"""
                document.dispatchEvent(new MouseEvent('mousemove',{{clientX:{x},clientY:{y},bubbles:true}}));
            """).strip()

        if op == "DRAG":
            (_, x1, y1), (_, x2, y2) = a
            return textwrap.dedent(f"""
                (()=>{{
                  const s=document.elementFromPoint({x1},{y1});
                  if(!s) return;
                  s.dispatchEvent(new MouseEvent('mousedown',{{bubbles:true,clientX:{x1},clientY:{y1}}}));
                  document.dispatchEvent(new MouseEvent('mousemove',{{bubbles:true,clientX:{x2},clientY:{y2}}}));
                  document.dispatchEvent(new MouseEvent('mouseup',  {{bubbles:true,clientX:{x2},clientY:{y2}}}));
                }})();
            """).strip()

        if op == "SCROLL":
            dir_, amt = a
            dx, dy = {"UP": (0, -amt), "DOWN": (0, amt),
                      "LEFT": (-amt, 0), "RIGHT": (amt, 0)}[dir_]
            return f"window.scrollBy({dx},{dy});"

        if op == "TYPE":
            txt = a[0].replace("'", "\\'")
            return textwrap.dedent(f"""
                (()=>{{
                  const el=document.activeElement;
                  if(el){{
                    el.value += '{txt}';
                    el.dispatchEvent(new Event('input',{{bubbles:true}}));
                  }}
                }})();
            """).strip()

        if op == "CLEAR":
            sel = a[0].replace("'", "\\'")
            return textwrap.dedent(f"""
                (()=>{{
                  const el=document.querySelector('{sel}');
                  if(el && 'value' in el){{
                    el.value = '';
                    el.dispatchEvent(new Event('input',{{bubbles:true}}));
                    el.dispatchEvent(new Event('change',{{bubbles:true}}));
                  }}
                }})();
            """).strip()

        if op == "SET" and len(a) == 2:
            sel = a[0].replace("'", "\\'")
            val = a[1].replace("'", "\\'")
            return textwrap.dedent(f"""
                (()=>{{
                  const el=document.querySelector('{sel}');
                  if(el && 'value' in el){{
                    el.value = '';
                    el.focus&&el.focus();
                    el.value = '{val}';
                    el.dispatchEvent(new Event('input',{{bubbles:true}}));
                    el.dispatchEvent(new Event('change',{{bubbles:true}}));
                  }}
                }})();
            """).strip()

        if op in ("PRESS", "KEYDOWN", "KEYUP"):
            key = a[0]
            evs = {"PRESS": ("keydown", "keyup"),
                   "KEYDOWN": ("keydown",), "KEYUP": ("keyup",)}[op]
            return ";".join(
                [f"document.dispatchEvent(new KeyboardEvent('{e}',"
                 f"{{key:'{key}',bubbles:true}}))" for e in evs]) + ";"

        if op == "EVAL":
            return textwrap.dedent(f"""
                (()=>{{
                  try {{
                    {a[0]};
                  }} catch (e) {{
                    console.error('C4A-Script EVAL error:', e);
                  }}
                }})();
            """).strip()

        if op == "IF":
            condition, then_cmd, else_cmd = a
            js_condition = self._emit_condition(condition)
            then_js = self._handle_cmd_or_proc(then_cmd)
            else_js = self._handle_cmd_or_proc(else_cmd) if else_cmd \
                else ""
            # template indentation matches the reference exactly: when
            # then_js is multi-line, dedent is a no-op (column-0
            # continuation lines) and the template's own indentation
            # survives into the output
            if else_cmd:
                return textwrap.dedent(f"""
                    if ({js_condition}) {{
                      {then_js}
                    }} else {{
                      {else_js}
                    }}
                """).strip()
            else:
                return textwrap.dedent(f"""
                    if ({js_condition}) {{
                      {then_js}
                    }}
                """).strip()

        if op == "REPEAT":
            cmd2, count = a
            if count.isdigit():
                repeat_js = self._handle_cmd_or_proc(cmd2)
                return textwrap.dedent(f"""
                    for (let _i = 0; _i < {count}; _i++) {{
                      {repeat_js}
                    }}
                """).strip()
            else:
                count_expr = count[1:-1] if count.startswith('`') \
                    and count.endswith('`') else count
                repeat_js = self._handle_cmd_or_proc(cmd2)
                return textwrap.dedent(f"""
                    (()=>{{
                      const _count = {count_expr};
                      if (typeof _count === 'number') {{
                        for (let _i = 0; _i < _count; _i++) {{
                          {repeat_js}
                        }}
                      }} else if (_count) {{
                        {repeat_js}
                      }}
                    }})();
                """).strip()

        raise ValueError(f"Unhandled op {op}")

    def _emit_condition(self, condition):
        cond_type = condition[0]
        if cond_type == "EXISTS":
            return f"!!document.querySelector('{condition[1]}')"
        if cond_type == "NOT":
            return f"!({self._emit_condition(condition[1])})"
        return condition[1]

    def _handle_cmd_or_proc(self, cmd):
        if not cmd:
            return ""
        if isinstance(cmd, Cmd):
            if cmd.op == "CALL":
                if cmd.args[0] not in self.procs:
                    raise ValueError(
                        f"Unknown procedure {cmd.args[0]!r}")
                proc_body = self.procs[cmd.args[0]].body
                return "\n".join([self._emit_js(c) for c in proc_body
                                  if c.op != "NOP"])
            return self._emit_js(cmd)
        return ""


# --------------------------------------------------------------------------
# exception-style API (c4ai_script.py:623-663)
# --------------------------------------------------------------------------

def _details_for(exc: _ParseError, script_lines: List[str]):
    line, column = exc.line, exc.column
    if 0 < line <= len(script_lines):
        problem_line = script_lines[line - 1]
        marker = " " * (column - 1) + "^"
        return f"\nCode:\n  {problem_line}\n  {marker}\n"
    return None


def compile_string(script: Union[str, List[str]], *,
                   root: Union[pathlib.Path, None] = None) -> List[str]:
    """Compile C4A-Script to a list of JS statements; raises
    C4AScriptError on failure (reference compile_string law)."""
    script_text = script if isinstance(script, str) else "\n".join(script)
    script_lines = script_text.split("\n")
    try:
        return Compiler(root).compile(script)
    except _ParseError as e:
        details = _details_for(e, script_lines)
        if details is not None:
            details += f"Token: ('{e.token_value}')"
        raise C4AScriptError(e.message, e.line, e.column,
                             "Syntax Error", details) from None
    except ValueError as e:
        message = str(e)
        if "Unknown procedure" in message:
            pm = re.search(r"'([^']+)'", message)
            if pm:
                pname = pm.group(1)
                for i, ln in enumerate(script_lines, 1):
                    if pname in ln and not ln.strip().startswith("PROC"):
                        details = (f"\nCode:\n  {ln.strip()}\n\nMake sure "
                                   f"the procedure '{pname}' is defined "
                                   f"with PROC...ENDPROC")
                        raise C4AScriptError(
                            f"Undefined procedure '{pname}'", i, None,
                            "Runtime Error", details) from None
        raise C4AScriptError(message, None, None, "Runtime Error",
                             None) from None


def compile_file(path: pathlib.Path) -> List[str]:
    return compile_string(path.read_text(), root=path.parent)


def compile_lines(lines: List[str], *,
                  root: Union[pathlib.Path, None] = None) -> List[str]:
    return compile_string(lines, root=root)


# --------------------------------------------------------------------------
# result-style API (c4a_compile.py laws)
# --------------------------------------------------------------------------

class C4ACompiler:
    """No-exception compiler facade (reference c4a_compile.py:27-320).
    ``generate_script`` (live LLM) is out of sandbox scope."""

    ERROR_CODES = {
        "missing_then": "E001",
        "missing_paren": "E002",
        "missing_comma": "E003",
        "missing_endproc": "E004",
        "undefined_proc": "E005",
        "missing_backticks": "E006",
        "invalid_command": "E007",
        "syntax_error": "E999",
    }

    @classmethod
    def compile(cls, script: Union[str, List[str]],
                root: Optional[pathlib.Path] = None) -> CompilationResult:
        if isinstance(script, list):
            script_text = "\n".join(script)
            script_lines = script
        else:
            script_text = script
            script_lines = script.split("\n")
        try:
            js_code = Compiler(root).compile(script_text)
            return CompilationResult(
                success=True, js_code=js_code,
                metadata={"lineCount": len(script_lines),
                          "statementCount": len(js_code)})
        except Exception as e:
            error = cls._exception_to_error(e, script_lines)
            return CompilationResult(
                success=False, errors=[error],
                metadata={"lineCount": len(script_lines)})

    @classmethod
    def validate(cls, script: Union[str, List[str]]) -> ValidationResult:
        result = cls.compile(script)
        return ValidationResult(valid=result.success,
                                errors=result.errors,
                                warnings=result.warnings)

    @classmethod
    def compile_file(cls, path: Union[str, pathlib.Path]
                     ) -> CompilationResult:
        path = pathlib.Path(path)
        if not path.exists():
            error = ErrorDetail(
                type=ErrorType.RUNTIME, code="E100",
                severity=Severity.ERROR,
                message=f"File not found: {path}",
                line=0, column=0, source_line="")
            return CompilationResult(success=False, errors=[error])
        try:
            return cls.compile(path.read_text(), root=path.parent)
        except Exception as e:
            error = ErrorDetail(
                type=ErrorType.RUNTIME, code="E101",
                severity=Severity.ERROR,
                message=f"Error reading file: {str(e)}",
                line=0, column=0, source_line="")
            return CompilationResult(success=False, errors=[error])

    @classmethod
    def _exception_to_error(cls, exc: Exception,
                            script_lines: List[str]) -> ErrorDetail:
        if isinstance(exc, _ParseError):
            return cls._handle_parse_error(exc, script_lines)
        if isinstance(exc, ValueError):
            return cls._handle_value_error(exc, script_lines)
        return ErrorDetail(
            type=ErrorType.SYNTAX, code=cls.ERROR_CODES["syntax_error"],
            severity=Severity.ERROR, message=str(exc), line=1, column=1,
            source_line=script_lines[0] if script_lines else "")

    @classmethod
    def _handle_parse_error(cls, exc: _ParseError,
                            script_lines: List[str]) -> ErrorDetail:
        line, column = exc.line, exc.column
        source_line = script_lines[line - 1] \
            if 0 < line <= len(script_lines) else ""
        line_before = script_lines[line - 2] \
            if line > 1 and line <= len(script_lines) + 1 else None
        line_after = script_lines[line] \
            if 0 < line < len(script_lines) else None

        if exc.kind == "missing_then":
            code = cls.ERROR_CODES["missing_then"]
            message = "Missing 'THEN' keyword after IF condition"
            suggestions = [Suggestion(
                "Add 'THEN' after the condition",
                source_line.replace("CLICK", "THEN CLICK")
                if source_line else None)]
        elif exc.kind == "missing_endproc":
            code = cls.ERROR_CODES["missing_endproc"]
            message = "Unexpected end of script"
            suggestions = [
                Suggestion("Check for missing ENDPROC"),
                Suggestion("Ensure all procedures are properly closed")]
        elif exc.kind == "missing_paren":
            code = cls.ERROR_CODES["missing_paren"]
            message = "Missing closing parenthesis ')'"
            suggestions = [Suggestion(
                "Add closing parenthesis at the end of the condition")]
        elif exc.kind == "missing_comma":
            code = cls.ERROR_CODES["missing_comma"]
            message = "Missing comma ',' in command"
            suggestions = [Suggestion("Add comma between arguments")]
        elif exc.kind == "missing_backticks":
            code = cls.ERROR_CODES["missing_backticks"]
            message = "Selector must be wrapped in backticks"
            suggestions = [Suggestion("Wrap the selector in backticks",
                                      f"`{exc.token_value}`")]
        elif exc.kind == "invalid_char":
            # UnexpectedCharacters law (c4a_compile.py:248-279)
            if "CLICK" in source_line and \
                    column > source_line.find("CLICK"):
                code = cls.ERROR_CODES["missing_backticks"]
                message = "Selector must be wrapped in backticks"
                suggestions = [Suggestion(
                    "Wrap the selector in backticks",
                    re.sub(r"CLICK\s+([^\s]+)", r"CLICK `\1`",
                           source_line))]
            else:
                code = cls.ERROR_CODES["syntax_error"]
                message = f"Invalid character at position {column}"
                suggestions = []
        else:
            code = cls.ERROR_CODES["syntax_error"]
            message = f"Unexpected '{exc.token_value}'"
            if exc.expected:
                expected_list = [s.strip() for s in
                                 exc.expected.split(",")][:3]
                if expected_list:
                    message += f". Expected: {', '.join(expected_list)}"
            suggestions = []

        return ErrorDetail(
            type=ErrorType.SYNTAX, code=code, severity=Severity.ERROR,
            message=message, line=line, column=column,
            source_line=source_line, line_before=line_before,
            line_after=line_after, suggestions=suggestions)

    @classmethod
    def _handle_value_error(cls, exc: ValueError,
                            script_lines: List[str]) -> ErrorDetail:
        message = str(exc)
        if "Unknown procedure" in message:
            proc_match = re.search(r"'([^']+)'", message)
            if proc_match:
                proc_name = proc_match.group(1)
                for i, line in enumerate(script_lines):
                    if proc_name in line and \
                            not line.strip().startswith("PROC"):
                        return ErrorDetail(
                            type=ErrorType.RUNTIME,
                            code=cls.ERROR_CODES["undefined_proc"],
                            severity=Severity.ERROR,
                            message=f"Undefined procedure '{proc_name}'",
                            line=i + 1,
                            column=line.find(proc_name) + 1,
                            source_line=line,
                            suggestions=[Suggestion(
                                "Define the procedure before using it",
                                f"PROC {proc_name}\n  # commands here\n"
                                f"ENDPROC")])
        return ErrorDetail(
            type=ErrorType.RUNTIME, code="E999", severity=Severity.ERROR,
            message=message, line=1, column=1,
            source_line=script_lines[0] if script_lines else "")


def c4a_compile(script: Union[str, List[str]],
                root: Optional[pathlib.Path] = None) -> CompilationResult:
    """Module-level convenience (reference c4a_compile.py:386-388;
    named c4a_* here to avoid shadowing builtins.compile)."""
    return C4ACompiler.compile(script, root)


def c4a_validate(script: Union[str, List[str]]) -> ValidationResult:
    return C4ACompiler.validate(script)
