"""Builtin-browser lifecycle manager (the reference CLI's ops surface).

Ports the management-plane laws of the reference's builtin browser
(/root/reference/crawl4ai/browser_profiler.py:1012-1215 launch/info/kill/
status, cli.py:640-927 status/start/stop/restart/cdp):

- registry file ``<home>/builtin-browser/browser_config.json`` holding
  ``{pid, cdp_url, user_data_dir, browser_type, debugging_port,
  start_time, config}``;
- ``get_info`` returns None when the file is absent OR the recorded pid
  is dead (the stale file is kept, like the reference);
- ``launch`` is idempotent: an already-running browser returns its
  existing CDP URL instead of starting a second one;
- ``kill``: SIGTERM, poll 5x0.5s, SIGKILL if still alive, then the
  registry file is removed; returns False when nothing was running;
- ``restart``: stop + start, each unset parameter defaulting to the
  previous browser's value (cli.py:851-886);
- ``profiles``: named user-data directories under ``<home>/profiles``
  (create/list/delete — the reference's interactive manager reduced to
  flags; this sandbox has no TTY).

The browser PROCESS itself is pluggable: the default launcher starts a
real Playwright-managed browser when the package imports (the same
activation rule as ``stages/render.PlaywrightRenderer``); otherwise it
starts a CLEARLY-LABELED placeholder process so the lifecycle laws
(registry, liveness, signals, restart parameter inheritance) stay real
and testable in environments without a browser.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time


def default_home() -> str:
    return os.environ.get(
        "C4R_HOME", os.path.join(os.path.expanduser("~"), ".crawl4ai_ray"))


def _playwright_available() -> bool:
    try:
        import playwright  # noqa: F401

        return True
    except ImportError:
        return False


def default_launcher(browser_type: str, user_data_dir: str,
                     debugging_port: int, headless: bool) -> subprocess.Popen:
    """Start the browser process. Real Playwright browser when the
    package exists; else a labeled placeholder (a sleeping python
    process) so the manager's lifecycle laws still run end to end."""
    if _playwright_available():
        code = (
            "from playwright.sync_api import sync_playwright\n"
            "import time\n"
            "p = sync_playwright().start()\n"
            f"b = getattr(p, {browser_type!r}).launch_persistent_context(\n"
            f"    {user_data_dir!r}, headless={headless!r},\n"
            f"    args=['--remote-debugging-port={debugging_port}'])\n"
            "while True:\n"
            "    time.sleep(3600)\n"
        )
    else:
        code = (
            "# crawl4ai_ray PLACEHOLDER builtin-browser process: playwright\n"
            "# is not installed; only the lifecycle is being exercised.\n"
            "import time\n"
            "while True:\n"
            "    time.sleep(3600)\n"
        )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )


class BuiltinBrowserManager:
    """See module docstring. ``launcher``/``sleep_fn`` are injectable for
    tests (scripted processes, no wall-sleeps)."""

    def __init__(self, home: str | None = None, *, launcher=None,
                 sleep_fn=None):
        self.home = home or default_home()
        self.browser_dir = os.path.join(self.home, "builtin-browser")
        self.config_file = os.path.join(self.browser_dir,
                                        "browser_config.json")
        os.makedirs(self.browser_dir, exist_ok=True)
        self.launcher = launcher or default_launcher
        self.sleep = sleep_fn or time.sleep

    # -- liveness / registry (browser_profiler.py:1106-1147) ----------------

    @staticmethod
    def _is_running(pid: int | None) -> bool:
        if not pid:
            return False
        try:
            os.kill(pid, 0)
            return True
        except (ProcessLookupError, PermissionError, OSError):
            return False

    def get_info(self) -> dict | None:
        if not os.path.exists(self.config_file):
            return None
        try:
            with open(self.config_file) as fp:
                info = json.load(fp)
        except Exception:
            return None
        if not self._is_running(info.get("pid")):
            return None          # stale registry: not running (file kept)
        return info

    def status(self) -> dict:
        info = self.get_info()
        if info is None:
            return {"running": False, "cdp_url": None, "info": None}
        return {"running": True, "cdp_url": info.get("cdp_url"),
                "info": info}

    # -- launch (browser_profiler.py:1012-1104) ------------------------------

    def launch(self, browser_type: str = "chromium",
               debugging_port: int = 9222,
               headless: bool = True) -> str | None:
        info = self.get_info()
        if info is not None:
            return info.get("cdp_url")     # idempotent-start law
        user_data_dir = os.path.join(self.browser_dir, "user_data")
        os.makedirs(user_data_dir, exist_ok=True)
        try:
            proc = self.launcher(browser_type, user_data_dir,
                                 debugging_port, headless)
        except Exception:
            return None
        if proc is None:
            return None
        cdp_url = f"http://localhost:{debugging_port}"
        info = {
            "pid": proc.pid,
            "cdp_url": cdp_url,
            "user_data_dir": user_data_dir,
            "browser_type": browser_type,
            "debugging_port": debugging_port,
            "headless": headless,
            "start_time": time.time(),
            "config": None,
        }
        with open(self.config_file, "w") as fp:
            json.dump(info, fp, indent=2)
        return cdp_url

    # -- kill (browser_profiler.py:1148-1185) --------------------------------

    def kill(self) -> bool:
        info = self.get_info()
        if not info:
            return False
        pid = info.get("pid")
        if not pid:
            return False
        try:
            os.kill(pid, signal.SIGTERM)
            for _ in range(5):
                if not self._is_running(pid):
                    break
                self.sleep(0.5)
            else:
                os.kill(pid, signal.SIGKILL)
            if os.path.exists(self.config_file):
                os.unlink(self.config_file)
            return True
        except Exception:
            return False

    # -- restart (cli.py:846-927) --------------------------------------------

    def restart(self, browser_type: str | None = None,
                debugging_port: int | None = None,
                headless: bool | None = None) -> str | None:
        """Stop + start; unset parameters inherit the previous browser's
        values (defaults apply when nothing was running)."""
        prev = self.get_info() or {}
        if prev:
            self.kill()
        return self.launch(
            browser_type or prev.get("browser_type", "chromium"),
            debugging_port or prev.get("debugging_port", 9222),
            prev.get("headless", True) if headless is None else headless,
        )

    # -- unregistered CDP browser (cli.py:929-1003) ---------------------------

    def launch_cdp(self, user_data_dir: str | None = None,
                   debugging_port: int = 9222,
                   browser_type: str = "chromium",
                   headless: bool = False) -> tuple[str, int]:
        """Standalone CDP browser: not recorded in the builtin registry
        (the reference's ``crwl cdp``); returns (cdp_url, pid)."""
        udd = user_data_dir or os.path.join(self.browser_dir, "cdp_data")
        os.makedirs(udd, exist_ok=True)
        proc = self.launcher(browser_type, udd, debugging_port, headless)
        return f"http://localhost:{debugging_port}", proc.pid


class ProfileManager:
    """Named persistent user-data directories (<home>/profiles/<name>) —
    the reference's profile store (browser_profiler.py:64-66, profiles
    live under the home folder) with flag-driven create/list/delete."""

    def __init__(self, home: str | None = None):
        self.profiles_dir = os.path.join(home or default_home(), "profiles")
        os.makedirs(self.profiles_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        safe = name.replace("/", "_")
        return os.path.join(self.profiles_dir, safe)

    def create(self, name: str) -> str:
        path = self._path(name)
        os.makedirs(path, exist_ok=True)
        meta = os.path.join(path, "profile.json")
        if not os.path.exists(meta):
            with open(meta, "w") as fp:
                json.dump({"name": name, "created": time.time()}, fp)
        return path

    def list(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.profiles_dir)):
            path = os.path.join(self.profiles_dir, name)
            if not os.path.isdir(path):
                continue
            meta = os.path.join(path, "profile.json")
            created = None
            if os.path.exists(meta):
                try:
                    with open(meta) as fp:
                        created = json.load(fp).get("created")
                except Exception:
                    pass
            out.append({"name": name, "path": path, "created": created})
        return out

    def delete(self, name: str) -> bool:
        import shutil

        path = self._path(name)
        if not os.path.isdir(path):
            return False
        shutil.rmtree(path)
        return True
