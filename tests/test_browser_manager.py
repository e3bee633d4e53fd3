"""Builtin-browser lifecycle manager + CLI ops surface
(state/browser_manager.py; reference browser_profiler.py:1012-1215,
cli.py:640-1003 laws)."""

import json
import os

from crawl4ai_ray.state.browser_manager import (BuiltinBrowserManager,
                                                ProfileManager)


def _mgr(tmp_path, **kw):
    return BuiltinBrowserManager(home=str(tmp_path), sleep_fn=lambda s: None,
                                 **kw)


def test_launch_status_kill_roundtrip(tmp_path):
    m = _mgr(tmp_path)
    assert m.status() == {"running": False, "cdp_url": None, "info": None}
    cdp = m.launch(debugging_port=9377)
    assert cdp == "http://localhost:9377"
    st = m.status()
    assert st["running"] and st["cdp_url"] == cdp
    info = st["info"]
    assert info["browser_type"] == "chromium" and info["headless"] is True
    assert os.path.exists(m.config_file)
    assert BuiltinBrowserManager._is_running(info["pid"])
    assert m.kill() is True
    assert not os.path.exists(m.config_file)
    assert m.status()["running"] is False
    assert m.kill() is False                    # nothing to stop


def test_launch_is_idempotent(tmp_path):
    calls = []
    from crawl4ai_ray.state.browser_manager import default_launcher

    def launcher(*a):
        calls.append(a)
        return default_launcher(*a)

    m = _mgr(tmp_path, launcher=launcher)
    first = m.launch(debugging_port=9378)
    again = m.launch(debugging_port=9999)       # ignored: already running
    assert first == again == "http://localhost:9378"
    assert len(calls) == 1                      # no second process
    m.kill()


def test_stale_registry_reports_not_running(tmp_path):
    m = _mgr(tmp_path)
    with open(m.config_file, "w") as fp:
        json.dump({"pid": 2**22 + 12345, "cdp_url": "http://localhost:1"},
                  fp)
    assert m.get_info() is None
    assert m.status()["running"] is False
    assert os.path.exists(m.config_file)        # stale file kept (ref law)


def test_restart_inherits_previous_parameters(tmp_path):
    m = _mgr(tmp_path)
    m.launch("firefox", 9379, headless=False)
    old_pid = m.get_info()["pid"]
    cdp = m.restart()
    info = m.get_info()
    assert cdp == "http://localhost:9379"
    assert info["browser_type"] == "firefox"
    assert info["headless"] is False
    assert info["pid"] != old_pid
    assert not BuiltinBrowserManager._is_running(old_pid)
    # explicit override wins
    m.restart(debugging_port=9380)
    assert m.get_info()["debugging_port"] == 9380
    m.kill()


def test_launch_cdp_is_unregistered(tmp_path):
    m = _mgr(tmp_path)
    cdp, pid = m.launch_cdp(debugging_port=9381)
    try:
        assert cdp == "http://localhost:9381"
        assert BuiltinBrowserManager._is_running(pid)
        assert m.status()["running"] is False    # not in the registry
    finally:
        os.kill(pid, 15)


def test_profile_manager(tmp_path):
    pm = ProfileManager(home=str(tmp_path))
    assert pm.list() == []
    path = pm.create("work")
    assert os.path.isdir(path)
    pm.create("play")
    names = [p["name"] for p in pm.list()]
    assert names == ["play", "work"]
    assert all(p["created"] for p in pm.list())
    assert pm.delete("play") is True
    assert pm.delete("play") is False
    assert [p["name"] for p in pm.list()] == ["work"]


def test_cli_browser_and_profiles(tmp_path, capsys):
    from crawl4ai_ray.cli import main

    home = str(tmp_path)
    assert main(["browser", "status", "--home", home]) == 0
    assert json.loads(capsys.readouterr().out)["running"] is False
    assert main(["browser", "start", "--home", home,
                 "--port", "9382"]) == 0
    assert json.loads(capsys.readouterr().out)["cdp_url"] == \
        "http://localhost:9382"
    # second start refuses (reference: use restart)
    assert main(["browser", "start", "--home", home]) == 1
    assert "already running" in capsys.readouterr().out
    assert main(["browser", "restart", "--home", home]) == 0
    assert json.loads(capsys.readouterr().out)["cdp_url"] == \
        "http://localhost:9382"                 # port inherited
    assert main(["browser", "stop", "--home", home]) == 0
    assert json.loads(capsys.readouterr().out)["stopped"] is True
    assert main(["profiles", "create", "alpha", "--home", home]) == 0
    capsys.readouterr()
    assert main(["profiles", "list", "--home", home]) == 0
    assert json.loads(capsys.readouterr().out)[0]["name"] == "alpha"
    assert main(["profiles", "delete", "alpha", "--home", home]) == 0
