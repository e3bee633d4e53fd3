"""Logger laws (functions/logkit.py vs reference async_logger.py)."""

import io

from crawl4ai_ray.functions.logkit import (
    AsyncFileLogger,
    AsyncLogger,
    LogLevel,
    create_box_message,
    markup_to_ansi,
    markup_to_plain,
)


def _capture(**kw):
    buf = io.StringIO()
    return AsyncLogger(verbose=True, stream=buf, **kw), buf


def test_tag_format_icon_and_level_filter():
    log, buf = _capture(log_level=LogLevel.INFO)
    log.debug("hidden")                     # below INFO
    log.info("shown", tag="INIT")
    out = buf.getvalue()
    assert "hidden" not in out
    # [INIT] ljust-dotted to width 10, INIT icon
    assert out.startswith("[INIT]....") and "→ shown" in out


def test_level_alias_quirk():
    # critical/exception/fatal/alert log at ERROR level: with the
    # threshold ABOVE ERROR they are all suppressed (reference quirk —
    # the CRITICAL/FATAL enum members are never used for filtering)
    log, buf = _capture(log_level=LogLevel.CRITICAL)
    log.critical("c")
    log.fatal("f")
    log.alert("a")
    log.error("e")
    assert buf.getvalue() == ""
    log2, buf2 = _capture(log_level=LogLevel.ERROR)
    log2.critical("c")
    assert "‼ c" in buf2.getvalue()


def test_shorten_middle_truncation_and_padding():
    log, _ = _capture()
    s = log._shorten("x" * 120, 20)
    assert len(s) == 20 and "..." in s
    assert s.startswith("xxxxxxxx...")
    # short input is PADDED to the length (column alignment law)
    assert log._shorten("ab", 10) == "ab" + " " * 8


def test_url_status_format_and_file_sink(tmp_path):
    f = tmp_path / "log.txt"
    log = AsyncLogger(log_file=str(f), verbose=False)
    log.url_status("http://h/x%20y", True, 1.2345)
    line = f.read_text().strip()
    # [ts] [FETCH]... icon url | ✓ | ⏱: 1.23s (markup stripped)
    assert "[FETCH]..." in line and "| ✓ |" in line
    assert "⏱: 1.23s" in line
    assert "http://h/x y" in line            # unquoted url
    assert "[green]" not in line             # markup stripped in file


def test_bracket_escape_law():
    log, buf = _capture()
    log.info("keep [these] brackets")
    assert "keep [these] brackets" in buf.getvalue()


def test_param_color_wrapping_console_ansi():
    log = AsyncLogger(verbose=True, ansi=True, stream=io.StringIO())
    buf = log.stream
    log.url_status("http://h/a", False, 0.5)
    out = buf.getvalue()
    assert "\x1b[31m" in out      # red base (ERROR)
    assert "✗" in out


def test_markup_renderers():
    m = "[red]a [[b]] c[/red]"
    assert markup_to_plain(m) == "a [b] c"
    assert markup_to_ansi(m) == "\x1b[31ma [b] c\x1b[0m"


def test_create_box_message_shape():
    box = create_box_message("hello\nworld", type="warning", width=40)
    lines = box.strip("\n").split("\n")
    assert lines[0].startswith("[yellow]┌") and lines[0].endswith(
        "┐[/yellow]")
    assert "⚠ hello" in lines[1]
    assert "  world" in lines[2]
    assert lines[-1].startswith("[yellow]└")
    # double-line variant
    box2 = create_box_message("x", double_line=True, add_newlines=False)
    assert box2.split("\n")[0].startswith("[blue]╔")


def test_file_logger_formats(tmp_path):
    f = tmp_path / "file.log"
    log = AsyncFileLogger(str(f))
    log.info("msg", tag="T")
    log.url_status("http://h/" + "a" * 200, True, 2.0)
    log.error_status("http://h/e", "boom")
    lines = f.read_text().strip().split("\n")
    assert "[INFO] [T] msg" in lines[0]
    # truncation quirk: '...' always appended, url cut at url_length
    assert "..." in lines[1] and "Status: SUCCESS" in lines[1]
    assert "Time: 2.00s" in lines[1]
    # error_status appends '...' even for short urls (reference quirk)
    assert lines[2].endswith("| Error: boom")
    assert "http://h/e..." in lines[2]
