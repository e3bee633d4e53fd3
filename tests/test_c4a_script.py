"""C4A-Script compiler laws (functions/c4a_script.py) — JS emission
byte-pins per the reference's _emit_js templates (c4ai_script.py:387-588),
pass-order quirks, and the E-code error mapping of c4a_compile.py."""

import pathlib

import pytest

from crawl4ai_ray.functions.c4a_script import (
    C4ACompiler,
    C4AScriptError,
    c4a_compile,
    c4a_validate,
    compile_string,
)


def test_simple_commands_byte_pins():
    js = compile_string("\n".join([
        "GO https://example.com/a",
        "RELOAD", "BACK", "FORWARD",
        "WAIT 3",
        "SCROLL DOWN",
        "SCROLL up 250",
        "PRESS Tab",
        "KEY_DOWN Shift",
        'TYPE "hi there"',
    ]))
    assert js[0] == "window.location.href = 'https://example.com/a';"
    assert js[1] == "window.location.reload();"
    assert js[2] == "window.history.back();"
    assert js[3] == "window.history.forward();"
    # WAIT number goes through float() — "3" emits 3.0 (reference
    # wait_cmd law, c4ai_script.py:225-238)
    assert js[4] == "await new Promise(r=>setTimeout(r,3.0*1000));"
    assert js[5] == "window.scrollBy(0,500);"     # default amount 500
    assert js[6] == "window.scrollBy(0,-250);"    # DIR is case-insensitive
    assert js[7] == ("document.dispatchEvent(new KeyboardEvent('keydown',"
                     "{key:'Tab',bubbles:true}));document.dispatchEvent("
                     "new KeyboardEvent('keyup',{key:'Tab',bubbles:true})"
                     ");")
    assert js[8] == ("document.dispatchEvent(new KeyboardEvent('keydown',"
                     "{key:'Shift',bubbles:true}));")
    assert "el.value += 'hi there';" in js[9]


def test_click_selector_and_coords():
    js = compile_string(["CLICK `#btn`", "CLICK 10 20",
                         "DOUBLE_CLICK `#d`", "RIGHT_CLICK 5 6"])
    assert "document.querySelector('#btn')" in js[0]
    assert "new MouseEvent('click',{bubbles:true,button:0,detail:1})" \
        in js[0]
    assert "document.elementFromPoint(10,20)" in js[1]
    assert "new MouseEvent('dblclick',{bubbles:true,button:0,detail:2})" \
        in js[2]
    # reference QUIRK (c4ai_script.py:451): coordinate clicks always
    # emit a plain 'click' (btn 0, detail 1) — _js_click_xy is called
    # without evt/btn/det even for DOUBLE_CLICK/RIGHT_CLICK
    assert "document.elementFromPoint(5,6)" in js[3]
    assert "new MouseEvent('click',{bubbles:true,button:0,detail:1})" \
        in js[3]


def test_wait_selector_text_and_timeout():
    js = compile_string(['WAIT `#x` 5', 'WAIT "Done" 2', "WAIT `#y`"])
    assert "const max = 5000" in js[0]
    assert "document.querySelector('#x')" in js[0]
    assert "rej('WAIT selector timeout')" in js[0]
    assert "document.body.innerText.includes(`Done`)" in js[1]
    assert "const max=2000" in js[1]
    assert "const max = 10000" in js[2]     # default timeout 10


def test_proc_inline_and_setvar_substitution():
    js = compile_string("""
PROC fill
  SET `input#u` $user
  CLICK `button`
ENDPROC
SETVAR user = "alice"
fill
""")
    # CALL inlined in place, then SETVAR applied to the inlined SET
    assert len(js) == 2
    assert "el.value = 'alice';" in js[0]
    # unknown var stays as "$name" (sub law keeps the original text)
    js2 = compile_string(['TYPE "$nope"'])
    assert "el.value += '$nope';" in js2[0]


def test_comment_nop_and_nested_proc_dropped():
    js = compile_string(["# a comment", "RELOAD"])
    assert js == ["window.location.reload();"]
    # a PROC nested in a PROC body is silently dropped (reference
    # proc_def keeps only Cmd children, c4ai_script.py:294)
    res = c4a_compile("""
PROC outer
  PROC inner
    RELOAD
  ENDPROC
  BACK
ENDPROC
outer
inner
""")
    assert not res.success
    assert res.first_error.code == "E005"
    assert "inner" in res.first_error.message


def test_if_exists_else_and_not():
    js = compile_string(
        ["IF (EXISTS `#a`) THEN RELOAD ELSE BACK",
         "IF (NOT EXISTS `#b`) THEN FORWARD",
         "IF (`window.ok`) THEN RELOAD"])
    assert js[0].startswith(
        "if (!!document.querySelector('#a')) {")
    assert "} else {" in js[0]
    assert "window.history.back();" in js[0]
    assert js[1].startswith(
        "if (!(!!document.querySelector('#b'))) {")
    assert js[2].startswith("if (window.ok) {")


def test_repeat_number_and_js_count():
    js = compile_string(["REPEAT (RELOAD, 3)",
                         "REPEAT (BACK, `document.n`)"])
    assert js[0].startswith("for (let _i = 0; _i < 3; _i++) {")
    assert "window.location.reload();" in js[0]
    assert "const _count = document.n;" in js[1]
    assert "typeof _count === 'number'" in js[1]


def test_if_multiline_interpolation_quirk():
    # multi-line then-JS defeats textwrap.dedent (column-0 continuation
    # lines), so the template indentation survives — the reference's
    # observable output shape, preserved here
    js = compile_string(["IF (EXISTS `#a`) THEN CLICK `#a`"])
    lines = js[0].split("\n")
    assert lines[0] == "if (!!document.querySelector('#a')) {"
    assert lines[1].startswith(" " * 20)     # template indent survives
    assert lines[-1] == "                    }"


def test_include_and_circular(tmp_path: pathlib.Path):
    (tmp_path / "sub.c4a").write_text("RELOAD\n")
    js = compile_string('USE "sub.c4a"\nBACK', root=tmp_path)
    assert js == ["window.location.reload();", "window.history.back();"]
    (tmp_path / "loop.c4a").write_text('USE "loop.c4a"\n')
    with pytest.raises(C4AScriptError) as ei:
        compile_string('USE "loop.c4a"', root=tmp_path)
    assert "Circular include" in str(ei.value)


def test_error_codes_mapping():
    # E001 missing THEN
    r = c4a_compile("IF (EXISTS `#a`) CLICK `#a`")
    assert not r.success and r.first_error.code == "E001"
    assert r.first_error.message == \
        "Missing 'THEN' keyword after IF condition"
    assert r.first_error.suggestions[0].fix == \
        "IF (EXISTS `#a`) THEN CLICK `#a`"
    # E002 missing paren
    r = c4a_compile("REPEAT (RELOAD, 3")
    assert r.first_error.code in ("E002", "E999")
    # E003 missing comma
    r = c4a_compile("REPEAT (RELOAD 3)")
    assert r.first_error.code == "E003"
    # E004 missing ENDPROC
    r = c4a_compile("PROC a\nRELOAD")
    assert r.first_error.code == "E004"
    assert r.first_error.message == "Unexpected end of script"
    assert len(r.first_error.suggestions) == 2
    # E005 undefined proc, with call-site line/column search
    r = c4a_compile("RELOAD\nnope")
    assert r.first_error.code == "E005"
    assert r.first_error.line == 2
    assert r.first_error.column == 1
    # E006 selector missing backticks, with wrap fix
    r = c4a_compile("CLICK #btn")
    assert r.first_error.code in ("E006", "E999")
    if r.first_error.code == "E006":
        assert r.first_error.suggestions[0].fix == "`#btn`"
    # success metadata law
    r = c4a_compile("RELOAD\nBACK")
    assert r.success and r.metadata == {"lineCount": 2,
                                        "statementCount": 2}
    assert str(r).startswith("✓ Compilation successful - 2 statements")


def test_validate_and_result_serialization():
    v = c4a_validate("RELOAD")
    assert v.valid and v.errors == []
    v = c4a_validate("IF (EXISTS `#a`) CLICK `#a`")
    assert not v.valid
    d = v.first_error.to_dict()
    assert d["type"] == "syntax" and d["severity"] == "error"
    assert d["location"]["line"] == 1
    assert d["context"]["marker"]["start"] == d["location"]["column"] - 1
    assert "formatted" not in d     # formatted_message is a property
    fm = v.first_error.formatted_message
    assert "Syntax Error [E001]" in fm and "^" in fm


def test_compile_file_missing(tmp_path: pathlib.Path):
    r = C4ACompiler.compile_file(tmp_path / "nope.c4a")
    assert not r.success and r.first_error.code == "E100"
    p = tmp_path / "ok.c4a"
    p.write_text("RELOAD\n")
    r = C4ACompiler.compile_file(p)
    assert r.success and r.js_code == ["window.location.reload();"]


def test_set_and_clear_and_eval_pins():
    js = compile_string(['SET `#f` "v"', "CLEAR `#f`",
                         "EVAL `console.log('hi')`"])
    assert "el.value = 'v';" in js[0]
    assert "el.dispatchEvent(new Event('change',{bubbles:true}));" \
        in js[0]
    assert js[1].startswith("(()=>{")
    assert "el.value = '';" in js[1]
    assert "console.log('hi');" in js[2]
    assert "C4A-Script EVAL error:" in js[2]


def test_move_drag_pins():
    js = compile_string(["MOVE 10 20", "DRAG 1 2 3 4"])
    assert js[0] == ("document.dispatchEvent(new MouseEvent('mousemove',"
                     "{clientX:10,clientY:20,bubbles:true}));")
    assert "document.elementFromPoint(1,2)" in js[1]
    assert "clientX:3,clientY:4" in js[1]
