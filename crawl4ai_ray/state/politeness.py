"""Per-host politeness + robots.txt scheduling — partition-owning actors.

Replaces the reference's in-process RateLimiter / DomainState
(/root/reference/crawl4ai/async_dispatcher.py:28-85, models.py:15-19) and
RobotsParser (utils.py:251-375) with scheduler actors that each own a
host-hash partition (``host_hash % n_partitions``). All politeness state
for a host lives on exactly one actor: token-bucket delay, fail count,
robots rules.

Host-partitioned politeness with per-host queues follows the Mercator
crawler design (Heydon & Najork, WWW 1999); budgeted token buckets per
host echo IRLbot's politeness-at-scale treatment (Lee et al., WWW 2008).

BSP adaptation of the reference law: wall-clock sleeps become a virtual
clock — each superstep represents ``superstep_seconds`` of crawl time and a
host with current delay ``d`` may fetch ``floor(superstep_seconds / d)``
URLs that round (at least 1 when d <= superstep_seconds); when
d > superstep_seconds the host accrues fractional credit per superstep and
is admitted once every ``ceil(d / superstep_seconds)`` supersteps (see
``admit``). Backoff is the
reference's: 429/503 → delay ×2 (jitter U(0.75,1.25) — deterministic
per-host seeded RNG here so runs reproduce), capped at ``max_delay`` 60s,
fail_count > max_retries(3) → host dropped; success → delay = max(base_lo,
delay × 0.75) (async_dispatcher.py:65-85). Robots rules are fetched once
per host (2s-timeout semantics collapse to a synthetic fetch), cached in
actor state, Disallow-prefix matched like urllib.robotparser.

Deferral is ordering-stable: rows that exceed a host's budget stay in the
frontier with their ``seq`` unchanged (SURVEY.md §7.5).
"""

from __future__ import annotations

import fnmatch
import random

import numpy as np
import ray


class _HostState:
    __slots__ = ("last_time", "current_delay", "fail_count", "robots", "rng",
                 "dead", "credit")

    def __init__(self, seed: int):
        self.last_time = 0.0
        self.current_delay = 0.0
        self.fail_count = 0
        self.robots = None       # list[str] disallow prefixes | None = unknown
        self.rng = random.Random(seed)
        self.dead = False
        self.credit = 0.0        # fractional fetch budget (see admit())


def parse_robots(text: str) -> list[str]:
    """Extract Disallow prefixes for User-agent: * (minimal, like the
    reference's RobotFileParser usage)."""
    disallow: list[str] = []
    active = False
    for line in (text or "").splitlines():
        line = line.split("#")[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active:
            if val:
                disallow.append(val)
    return disallow


def robots_allows(disallow: list[str], path: str) -> bool:
    for p in disallow:
        if "*" in p or "$" in p:
            if fnmatch.fnmatch(path, p.rstrip("$") + ("" if p.endswith("$") else "*")):
                return False
        elif path.startswith(p):
            return False
    return True


@ray.remote(num_cpus=0.25)
class HostScheduler:
    """One partition of politeness/robots state."""

    def __init__(self, partition_id: int, *, base_delay=(1.0, 3.0),
                 max_delay: float = 60.0, max_retries: int = 3,
                 superstep_seconds: float = 4.0, jitter: bool = False,
                 seed: int = 42):
        self.pid = partition_id
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.max_retries = max_retries
        self.superstep_seconds = superstep_seconds
        self.jitter = jitter
        self.seed = seed
        self.hosts: dict[str, _HostState] = {}

    def _state(self, host: str) -> _HostState:
        st = self.hosts.get(host)
        if st is None:
            from ..functions.urlkit import hash32

            # stable per-host RNG seed (builtin hash() is randomized per
            # process and would make jitter non-reproducible)
            st = _HostState(self.seed ^ hash32(host))
            self.hosts[host] = st
        return st

    def set_robots(self, robots_by_host: dict) -> None:
        """Install robots.txt text per host (fetched by the engine's robots
        stage; in tests, straight from the synthetic site)."""
        for host, text in robots_by_host.items():
            self._state(host).robots = parse_robots(text)

    def hosts_missing_robots(self, hosts: list[str]) -> list[str]:
        return [h for h in set(hosts) if self._state(h).robots is None]

    def admit(self, hosts: list[str], counts: list[int]) -> list[int]:
        """For each host (with ``counts[i]`` queued URLs), how many may
        fetch this superstep.

        Credit accounting (ADVICE r1): each admit() call — one per host per
        superstep — accrues ``superstep_seconds / current_delay`` fetch
        credit, capped at one superstep's worth (no burst after idling), and
        each admitted fetch spends 1.0. A host backed off to delay d >
        superstep_seconds is therefore admitted only once every
        ceil(d / superstep_seconds) supersteps — the virtual-clock rate the
        module docstring promises — instead of the old floor of 1 per
        superstep (~15x too fast at the 60s cap)."""
        out = []
        for host, cnt in zip(hosts, counts):
            st = self._state(host)
            if st.dead:
                out.append(0)
                continue
            if st.current_delay == 0:
                st.current_delay = (
                    st.rng.uniform(*self.base_delay) if self.jitter
                    else self.base_delay[0]
                )
            rate = self.superstep_seconds / st.current_delay
            st.credit = min(st.credit + rate, max(1.0, rate))
            take = min(cnt, int(st.credit))
            st.credit -= take
            out.append(take)
        return out

    def robots_mask(self, hosts: list[str], paths: list[str]) -> np.ndarray:
        """True = allowed. Hosts with unknown robots allow everything
        (set_robots first for strict behavior)."""
        out = np.ones(len(hosts), dtype=bool)
        for i, (host, path) in enumerate(zip(hosts, paths)):
            st = self._state(host)
            if st.robots:
                out[i] = robots_allows(st.robots, path)
        return out

    def dead_mask(self, hosts: list[str]) -> np.ndarray:
        """True = host exceeded max_retries on 429/503 (dropped, like the
        reference returning failure after retries)."""
        return np.array([self._state(h).dead for h in hosts], dtype=bool)

    def report(self, hosts: list[str], statuses: list[list[int]]) -> None:
        """Post-fetch backoff updates (reference update_delay law)."""
        for host, sts in zip(hosts, statuses):
            st = self._state(host)
            for code in sts:
                if code in (429, 503):
                    st.fail_count += 1
                    if st.fail_count > self.max_retries:
                        st.dead = True
                        break
                    mult = 2 * (st.rng.uniform(0.75, 1.25) if self.jitter
                                else 1.0)
                    st.current_delay = min(st.current_delay * mult,
                                           self.max_delay)
                else:
                    st.current_delay = max(self.base_delay[0],
                                           st.current_delay * 0.75)
                    st.fail_count = 0

    def snapshot(self) -> dict:
        return {
            h: (st.last_time, st.current_delay, st.fail_count, st.robots,
                st.dead, st.credit)
            for h, st in self.hosts.items()
        }

    def restore(self, snap: dict) -> None:
        for h, entry in snap.items():
            # tolerate pre-credit checkpoints (5-tuple; credit added r2)
            lt, d, fc, robots, dead = entry[:5]
            credit = entry[5] if len(entry) > 5 else 0.0
            st = self._state(h)
            st.last_time, st.current_delay, st.fail_count = lt, d, fc
            st.robots, st.dead = robots, dead
            st.credit = credit


class PolitenessGate:
    """Driver-side handle over the scheduler partition actors."""

    def __init__(self, n_partitions: int = 4, **scheduler_kwargs):
        self.n = n_partitions
        self.parts = [
            HostScheduler.remote(i, **scheduler_kwargs)
            for i in range(n_partitions)
        ]

    def _pid(self, host: str) -> int:
        from ..functions.urlkit import hash32

        return hash32(host) % self.n

    def _by_partition(self, hosts: list[str]):
        groups: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            groups.setdefault(self._pid(h), []).append(i)
        return groups

    def set_robots(self, robots_by_host: dict) -> None:
        groups: dict[int, dict] = {}
        for h, t in robots_by_host.items():
            groups.setdefault(self._pid(h), {})[h] = t
        ray.get([self.parts[p].set_robots.remote(d)
                 for p, d in groups.items()])

    def hosts_missing_robots(self, hosts: list[str]) -> list[str]:
        groups = self._by_partition(list(set(hosts)))
        futs = []
        uniq = list(set(hosts))
        for p, idxs in groups.items():
            futs.append(self.parts[p].hosts_missing_robots.remote(
                [uniq[i] for i in idxs]))
        out: list[str] = []
        for r in ray.get(futs):
            out.extend(r)
        return out

    def admit(self, hosts: list[str], counts: list[int]) -> list[int]:
        groups = self._by_partition(hosts)
        out = [0] * len(hosts)
        futs, idx_lists = [], []
        for p, idxs in groups.items():
            futs.append(self.parts[p].admit.remote(
                [hosts[i] for i in idxs], [counts[i] for i in idxs]))
            idx_lists.append(idxs)
        for idxs, res in zip(idx_lists, ray.get(futs)):
            for i, v in zip(idxs, res):
                out[i] = v
        return out

    def robots_mask(self, hosts: list[str], paths: list[str]) -> np.ndarray:
        groups = self._by_partition(hosts)
        out = np.ones(len(hosts), dtype=bool)
        futs, idx_lists = [], []
        for p, idxs in groups.items():
            futs.append(self.parts[p].robots_mask.remote(
                [hosts[i] for i in idxs], [paths[i] for i in idxs]))
            idx_lists.append(idxs)
        for idxs, res in zip(idx_lists, ray.get(futs)):
            for i, v in zip(idxs, res):
                out[i] = bool(v)
        return out

    def dead_mask(self, hosts: list[str]) -> np.ndarray:
        groups = self._by_partition(hosts)
        out = np.zeros(len(hosts), dtype=bool)
        futs, idx_lists = [], []
        for p, idxs in groups.items():
            futs.append(self.parts[p].dead_mask.remote(
                [hosts[i] for i in idxs]))
            idx_lists.append(idxs)
        for idxs, res in zip(idx_lists, ray.get(futs)):
            for i, v in zip(idxs, res):
                out[i] = bool(v)
        return out

    def report(self, host_statuses: dict) -> None:
        groups: dict[int, tuple[list, list]] = {}
        for h, sts in host_statuses.items():
            g = groups.setdefault(self._pid(h), ([], []))
            g[0].append(h)
            g[1].append(sts)
        ray.get([self.parts[p].report.remote(hs, ss)
                 for p, (hs, ss) in groups.items()])

    def snapshot(self) -> list[dict]:
        return ray.get([p.snapshot.remote() for p in self.parts])

    def restore(self, snaps: list[dict]) -> None:
        ray.get([p.restore.remote(s)
                 for p, s in zip(self.parts, snaps)])

    def kill(self) -> None:
        for p in self.parts:
            ray.kill(p)
        self.parts = []
