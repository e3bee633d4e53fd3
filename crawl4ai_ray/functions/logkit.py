"""Tag-based engine logger — behavioral port of the reference's
``crawl4ai/async_logger.py:1-374`` + ``utils.py:453-531``
(``create_box_message``) on the stdlib (rich is absent in this env; a
minimal markup renderer replaces ``rich.Console``/``Text.from_markup``).

Laws kept law-for-law:
- LogLevel ordering / aliasing: ``critical``/``exception``/``fatal``/
  ``alert`` log at ERROR level, ``notice`` at INFO
  (async_logger.py:246-260) — the alias methods do NOT use their own
  enum members for filtering;
- tag formatting ``[TAG]`` ljust-dotted to ``tag_width``
  (``_format_tag``), icon lookup falling back to the INFO icon;
- ``_shorten`` middle-truncation with "..." AND right-padding to the
  target length (both branches pad — the column-aligned url law);
- bracket escaping ``[`` → ``[[`` before ``str.format`` (markup
  collision law), per-param color wrapping by substring replacement
  (including the documented reference FIXME: a ``{v:.2f}``-formatted
  param whose str() differs from its formatted form will not be
  wrapped — preserved, not fixed);
- file sink line ``[YYYY-mm-dd HH:MM:SS.mmm] <plain markup-stripped>``;
- ``url_status`` message template ``{url} | {status} | ⏱: {timing:.2f}s``
  with ✓/✗ status and SUCCESS/ERROR level selection; ``error_status``
  with url_length=50 default;
- ``AsyncFileLogger``'s independent format
  ``[ts] [LEVEL] [TAG] msg`` and its ``url[:n]...`` truncation quirk
  (always appends "..." even when nothing was cut);
- ``create_box_message`` box drawing: type→(border, text, prefix)
  styles, single/double line chars, first-line prefix + 2-space
  continuation indent, ``width-4`` wrap, ``width-1`` horizontal rule,
  ``{line:<{width-2}}`` padding — the markup string is byte-equal to
  the reference's (rendering to ANSI/plain happens at print time).
"""

from __future__ import annotations

import os
import re
import textwrap
from abc import ABC, abstractmethod
from datetime import datetime
from enum import Enum
from typing import Any, Dict, List, Optional
from urllib.parse import unquote

__all__ = [
    "LogLevel", "LogColor", "AsyncLoggerBase", "AsyncLogger",
    "AsyncFileLogger", "create_box_message", "markup_to_plain",
    "markup_to_ansi",
]


class LogLevel(Enum):
    DEFAULT = 0
    DEBUG = 1
    INFO = 2
    SUCCESS = 3
    WARNING = 4
    ERROR = 5
    CRITICAL = 6
    ALERT = 7
    NOTICE = 8
    EXCEPTION = 9
    FATAL = 10

    def __str__(self):
        return self.name.lower()


class LogColor(str, Enum):
    DEBUG = "bright_black"
    INFO = "cyan"
    SUCCESS = "green"
    WARNING = "yellow"
    ERROR = "red"
    CYAN = "cyan"
    GREEN = "green"
    YELLOW = "yellow"
    MAGENTA = "magenta"
    DIM_MAGENTA = "dim magenta"
    RED = "red"

    def __str__(self):
        return self.value


# ---------------------------------------------------------------------------
# markup rendering (replaces rich)
# ---------------------------------------------------------------------------

# rich's markup rule: only [tags] starting with a lowercase letter,
# '#', '/' or '@' are style tags — '[INIT]'/'[FETCH]' column tags stay
# literal text (markup.py RE_TAGS law), which is why the reference's
# _format_tag output survives rendering
_TAG_RE = re.compile(r"\[(/?)([a-z#@][a-zA-Z_ ]*)\]")

_ANSI = {
    "bright_black": "\x1b[90m", "cyan": "\x1b[36m", "green": "\x1b[32m",
    "yellow": "\x1b[33m", "red": "\x1b[31m", "magenta": "\x1b[35m",
    "dim magenta": "\x1b[2;35m", "blue": "\x1b[34m",
    "bright_blue": "\x1b[94m", "bright_yellow": "\x1b[93m",
    "bright_green": "\x1b[92m", "bright_red": "\x1b[91m",
    "lightblack": "\x1b[90m",
}
_RESET = "\x1b[0m"


def _render(markup: str, color_fn) -> str:
    """Render rich-style markup: ``[[``/``]]`` are literal brackets,
    ``[name]``/``[/name]`` toggle colors via color_fn (which may drop
    them for plain text)."""
    out: List[str] = []
    i, n = 0, len(markup)
    while i < n:
        ch = markup[i]
        if ch == "[":
            if markup.startswith("[[", i):
                out.append("[")
                i += 2
                continue
            m = _TAG_RE.match(markup, i)
            if m:
                out.append(color_fn(m.group(2), m.group(1) == "/"))
                i = m.end()
                continue
            out.append("[")
            i += 1
        elif ch == "]":
            if markup.startswith("]]", i):
                out.append("]")
                i += 2
                continue
            out.append("]")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def markup_to_plain(markup: str) -> str:
    """Markup → plain text (the file-sink law: rich
    ``Text.from_markup(...).plain``)."""
    return _render(markup, lambda name, closing: "")


def markup_to_ansi(markup: str) -> str:
    """Markup → ANSI escapes for console output."""
    return _render(
        markup,
        lambda name, closing: _RESET if closing
        else _ANSI.get(name, ""))


# ---------------------------------------------------------------------------
# box message (utils.py:453-531)
# ---------------------------------------------------------------------------

def create_box_message(message: str, type: str = "info",
                       width: int = 120, add_newlines: bool = True,
                       double_line: bool = False) -> str:
    styles = {
        "warning": ("yellow", "bright_yellow", "⚠"),
        "info": ("blue", "bright_blue", "ℹ"),
        "debug": ("lightblack", "bright_black", "⋯"),
        "success": ("green", "bright_green", "✓"),
        "error": ("red", "bright_red", "×"),
    }
    border_color, text_color, prefix = styles.get(type.lower(),
                                                  styles["info"])
    box_chars = {
        "single": ("─", "│", "┌", "┐", "└", "┘"),
        "double": ("═", "║", "╔", "╗", "╚", "╝"),
    }
    line_style = "double" if double_line else "single"
    h_line, v_line, tl, tr, bl, br = box_chars[line_style]

    formatted_lines: List[str] = []
    raw_lines = message.split("\n")
    if raw_lines:
        first_line = f"{prefix} {raw_lines[0].strip()}"
        wrapped_first = textwrap.fill(first_line, width=width - 4)
        formatted_lines.extend(wrapped_first.split("\n"))
        for line in raw_lines[1:]:
            if line.strip():
                wrapped = textwrap.fill(f"  {line.strip()}",
                                        width=width - 4)
                formatted_lines.extend(wrapped.split("\n"))
            else:
                formatted_lines.append("")

    horizontal_line = h_line * (width - 1)
    box = [
        f"[{border_color}]{tl}{horizontal_line}{tr}[/{border_color}]",
        *[
            f"[{border_color}]{v_line}[{text_color}] "
            f"{line:<{width-2}}[/{text_color}]"
            f"[{border_color}]{v_line}[/{border_color}]"
            for line in formatted_lines
        ],
        f"[{border_color}]{bl}{horizontal_line}{br}[/{border_color}]",
    ]
    result = "\n".join(box)
    if add_newlines:
        result = f"\n{result}\n"
    return result


# ---------------------------------------------------------------------------
# loggers
# ---------------------------------------------------------------------------

class AsyncLoggerBase(ABC):
    @abstractmethod
    def debug(self, message: str, tag: str = "DEBUG", **kwargs):
        pass

    @abstractmethod
    def info(self, message: str, tag: str = "INFO", **kwargs):
        pass

    @abstractmethod
    def success(self, message: str, tag: str = "SUCCESS", **kwargs):
        pass

    @abstractmethod
    def warning(self, message: str, tag: str = "WARNING", **kwargs):
        pass

    @abstractmethod
    def error(self, message: str, tag: str = "ERROR", **kwargs):
        pass

    @abstractmethod
    def url_status(self, url: str, success: bool, timing: float,
                   tag: str = "FETCH", url_length: int = 100):
        pass

    @abstractmethod
    def error_status(self, url: str, error: str, tag: str = "ERROR",
                     url_length: int = 100):
        pass


class AsyncLogger(AsyncLoggerBase):
    """Console + optional-file logger (reference AsyncLogger laws)."""

    # tag → glyph table (the reference's DEFAULT_ICONS values)
    DEFAULT_ICONS = dict(
        pair.split(":") for pair in (
            "INIT:→ READY:✓ FETCH:↓ SCRAPE:◆ EXTRACT:■ COMPLETE:● "
            "ERROR:× DEBUG:⋯ INFO:ℹ WARNING:⚠ SUCCESS:✔ CRITICAL:‼ "
            "ALERT:⚡ NOTICE:ℹ EXCEPTION:❗ FATAL:☠ DEFAULT:•"
        ).split())

    DEFAULT_COLORS = {
        lv: LogColor[lv.name]
        for lv in (LogLevel.DEBUG, LogLevel.INFO, LogLevel.SUCCESS,
                   LogLevel.WARNING, LogLevel.ERROR)
    }

    def __init__(self, log_file: Optional[str] = None,
                 log_level: LogLevel = LogLevel.DEBUG,
                 tag_width: int = 10,
                 icons: Optional[Dict[str, str]] = None,
                 colors: Optional[Dict[LogLevel, LogColor]] = None,
                 verbose: bool = True, ansi: bool = False,
                 stream=None):
        self.log_file = log_file
        self.log_level = log_level
        self.tag_width = tag_width
        self.icons = icons or self.DEFAULT_ICONS
        self.colors = colors or self.DEFAULT_COLORS
        self.verbose = verbose
        # console substitute: ANSI only when asked (tests capture plain)
        self.ansi = ansi
        self.stream = stream
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)),
                        exist_ok=True)

    def _format_tag(self, tag: str) -> str:
        # "[TAG]" dot-padded into a fixed-width column
        return ("[%s]" % tag).ljust(self.tag_width, ".")

    def _get_icon(self, tag: str) -> str:
        return self.icons.get(tag, self.icons["INFO"])

    def _shorten(self, text, length, placeholder="..."):
        # middle-truncate, then pad EITHER WAY to the target length
        # (the reference's column-alignment law: short inputs pad too)
        if len(text) > length:
            half = (length - len(placeholder)) // 2
            text = text[:half] + placeholder + text[-half:]
        return text.ljust(length)

    def _write_to_file(self, message: str):
        if self.log_file:
            plain_text = markup_to_plain(message)
            timestamp = datetime.now().strftime(
                "%Y-%m-%d %H:%M:%S.%f")[:-3]
            with open(self.log_file, "a", encoding="utf-8") as f:
                f.write(f"[{timestamp}] {plain_text}\n")

    def _print(self, markup: str):
        import sys

        text = markup_to_ansi(markup) if self.ansi \
            else markup_to_plain(markup)
        print(text, file=self.stream or sys.stdout)

    def _log(self, level: LogLevel, message: str, tag: str,
             params: Optional[Dict[str, Any]] = None,
             colors: Optional[Dict[str, LogColor]] = None,
             boxes: Optional[List[str]] = None,
             base_color: Optional[LogColor] = None, **kwargs):
        if level.value < self.log_level.value:
            return

        def esc(t: str) -> str:
            # escape brackets so user text never collides with markup
            return t.replace("[", "[[").replace("]", "]]")

        text = esc(message)
        if params:
            text = text.format(**params)
            for key, value in params.items():
                shown = esc(str(value))
                if colors and key in colors:
                    wrapped = "[%s]%s[/%s]" % (colors[key], shown,
                                               colors[key])
                    # substring replace — inherits the reference FIXME:
                    # a format-spec'd param whose str() differs from
                    # its formatted text is left unwrapped
                    text = text.replace(shown, wrapped)
                    shown = wrapped
                if boxes and key in boxes:
                    text = text.replace(
                        shown, create_box_message(shown,
                                                  type=str(level)))

        color = base_color or self.colors[level]
        log_line = "[%s]%s %s %s [/%s]" % (
            color, self._format_tag(tag), self._get_icon(tag), text,
            color)
        if self.verbose or kwargs.get("force_verbose", False):
            self._print(log_line)
        self._write_to_file(log_line)

    # level-method table. Reference aliasing QUIRK kept: critical /
    # exception / fatal / alert all log at ERROR level and notice at
    # INFO — their dedicated enum members never drive filtering
    _METHOD_LEVELS = {
        "debug": LogLevel.DEBUG, "info": LogLevel.INFO,
        "success": LogLevel.SUCCESS, "warning": LogLevel.WARNING,
        "error": LogLevel.ERROR, "critical": LogLevel.ERROR,
        "exception": LogLevel.ERROR, "fatal": LogLevel.ERROR,
        "alert": LogLevel.ERROR, "notice": LogLevel.INFO,
    }


    def url_status(self, url: str, success: bool, timing: float,
                   tag: str = "FETCH", url_length: int = 100):
        shown = self._shorten(unquote(url), url_length)
        ok_color = LogColor.SUCCESS if success else LogColor.ERROR
        self._log(
            level=LogLevel.SUCCESS if success else LogLevel.ERROR,
            message="{url} | {status} | ⏱: {timing:.2f}s",
            tag=tag,
            params={"url": shown, "status": "✓" if success else "✗",
                    "timing": timing},
            colors={"status": ok_color, "timing": LogColor.WARNING},
        )

    def error_status(self, url: str, error: str, tag: str = "ERROR",
                     url_length: int = 50):
        shown = self._shorten(unquote(url), url_length)
        self._log(level=LogLevel.ERROR,
                  message="{url} | Error: {error}", tag=tag,
                  params={"url": shown, "error": error})


def _install_level_methods(cls):
    """Generate the per-level convenience methods from the table (the
    body is identical for all ten — only level and default tag vary)."""
    for name, lvl in cls._METHOD_LEVELS.items():
        def method(self, message, tag=name.upper(), *, _lvl=lvl,
                   **kwargs):
            self._log(_lvl, message, tag, **kwargs)
        method.__name__ = name
        setattr(cls, name, method)
    # setattr after class creation does not refresh ABC bookkeeping
    cls.__abstractmethods__ = frozenset(
        n for n in getattr(cls, "__abstractmethods__", ())
        if getattr(getattr(cls, n, None), "__isabstractmethod__", False))
    return cls


AsyncLogger = _install_level_methods(AsyncLogger)


class AsyncFileLogger(AsyncLoggerBase):
    """File-only logger (reference AsyncFileLogger laws, including the
    unconditional '...' suffix on truncated urls)."""

    def __init__(self, log_file: str):
        self.log_file = log_file
        os.makedirs(os.path.dirname(os.path.abspath(log_file)),
                    exist_ok=True)

    def _write_to_file(self, level: str, message: str, tag: str):
        timestamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
        with open(self.log_file, "a", encoding="utf-8") as f:
            f.write(f"[{timestamp}] [{level}] [{tag}] {message}\n")

    def url_status(self, url: str, success: bool, timing: float,
                   tag: str = "FETCH", url_length: int = 100):
        # reference quirk kept: '...' is appended unconditionally
        line = (f"{url[:url_length]}... | "
                f"Status: {'SUCCESS' if success else 'FAILED'} | "
                f"Time: {timing:.2f}s")
        self._write_to_file("URL_STATUS", line, tag)

    def error_status(self, url: str, error: str, tag: str = "ERROR",
                     url_length: int = 100):
        self._write_to_file("ERROR",
                            f"{url[:url_length]}... | Error: {error}",
                            tag)


def _install_file_level_methods(cls):
    for name in ("debug", "info", "success", "warning", "error"):
        def method(self, message, tag=name.upper(), *, _lv=name.upper(),
                   **kwargs):
            self._write_to_file(_lv, message, tag)
        method.__name__ = name
        setattr(cls, name, method)
    # setattr after class creation does not refresh ABC bookkeeping
    cls.__abstractmethods__ = frozenset(
        n for n in getattr(cls, "__abstractmethods__", ())
        if getattr(getattr(cls, n, None), "__isabstractmethod__", False))
    return cls


AsyncFileLogger = _install_file_level_methods(AsyncFileLogger)
