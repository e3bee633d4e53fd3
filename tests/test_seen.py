"""Cuckoo filter + sharded seen-set tests."""

import numpy as np

from crawl4ai_ray.state.cuckoo import CuckooFilter


def test_cuckoo_insert_contains():
    f = CuckooFilter(capacity=1 << 12)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2 ** 63, size=2000, dtype=np.uint64)
    f.insert_batch(keys)
    assert f.contains_batch(keys).all()          # no false negatives
    other = rng.integers(0, 2 ** 63, size=5000, dtype=np.uint64)
    fresh = np.setdiff1d(other, keys)
    fp_rate = f.contains_batch(fresh).mean()
    assert fp_rate < 0.05                        # 16-bit fingerprints → ~1e-3


def test_cuckoo_decorrelated_from_shard_bits():
    """ADVICE r1 (high): SeenSet routes by h % n_shards, so within a shard
    the low hash bits are constant. The primary bucket index must not reuse
    those bits or only 1/n_shards of the table is reachable as i1 and
    inserts start failing around 0.62 load. With splitmix64 mixing, a
    shard-resident key set must fill to 0.75 load with zero failures."""
    f = CuckooFilter(capacity=1 << 12)
    cap = f.n_buckets * f.bucket_size
    n = int(0.75 * cap)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2 ** 63, size=2 * n, dtype=np.uint64)
    keys = (keys & ~np.uint64(7)) | np.uint64(5)  # all ≡ 5 (mod 8)
    keys = np.unique(keys)[:n]
    failed = f.insert_batch(keys)
    assert failed == 0, f"{failed} inserts failed at 0.75 load"
    assert f.contains_batch(keys).all()


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(capacity=1 << 10)
    keys = np.arange(100, dtype=np.uint64) * 7919
    f.insert_batch(keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.contains_batch(keys).all()
    assert g.count == f.count


def test_shard_grows_past_filter_capacity(ray_session):
    """Inserting far beyond the initial cuckoo capacity must keep the
    no-false-negative guarantee (the filter rebuilds at 2x)."""
    from crawl4ai_ray.state.seen import SeenShard
    import ray

    shard = SeenShard.remote(0, 1 << 8)   # tiny: 256 slots
    keys = (np.arange(5000, dtype=np.uint64) * 2654435761) % (1 << 60)
    keys = np.unique(keys)
    out1 = ray.get(shard.check_and_add.remote(keys))
    assert not out1.any()                  # all new
    out2 = ray.get(shard.check_and_add.remote(keys))
    assert out2.all(), "false negatives after filter overflow"
    ray.kill(shard)


def test_politeness_jitter_deterministic(ray_session):
    from crawl4ai_ray.state.politeness import PolitenessGate

    def run():
        g = PolitenessGate(2, jitter=True, seed=9)
        admits = g.admit(["a.test", "b.test", "a.test"], [10, 10, 10])
        g.report({"a.test": [503], "b.test": [200]})
        admits2 = g.admit(["a.test", "b.test"], [10, 10])
        g.kill()
        return admits, admits2

    assert run() == run()


def test_politeness_backed_off_host_throttled(ray_session):
    """ADVICE r1: a host backed off to delay d > superstep_seconds must be
    admitted only once every ceil(d / superstep_seconds) supersteps, not
    once per superstep."""
    from crawl4ai_ray.state.politeness import PolitenessGate

    g = PolitenessGate(1, base_delay=(1.0, 1.0), superstep_seconds=4.0)
    g.admit(["h.test"], [10])
    # drive the delay to 16s: 1 -> 2 -> 4 -> 8 -> 16 needs fail_count <= 3,
    # so interleave successes that reset fail_count (delay floor keeps it)
    for _ in range(2):
        g.report({"h.test": [429, 429]})   # x4
        g.report({"h.test": [200]})        # x0.75, fail_count reset
    # delay now 1*4*0.75*4*0.75 = 9.0s -> one more 429 pair: 36 -> capped? no
    g.report({"h.test": [429]})            # 18.0s
    admits = [g.admit(["h.test"], [10])[0] for _ in range(10)]
    g.kill()
    # rate = 4/18 per superstep -> one admit every ceil(18/4)=5 supersteps
    assert sum(admits) == 2, admits
    assert admits[4] == 1 and admits[9] == 1, admits


def test_seen_shards_check_and_add(ray_session):
    from crawl4ai_ray.state.seen import SeenSet

    s = SeenSet(n_shards=3, capacity_per_shard=1 << 10)
    h = np.array([1, 2, 3, 2, 1, 4], dtype=np.uint64)
    out = s.check_and_add(h)
    # first occurrence new, duplicates (even within batch) seen
    assert list(out) == [False, False, False, True, True, False]
    out2 = s.check_and_add(np.array([3, 4, 5], dtype=np.uint64))
    assert list(out2) == [True, True, False]
    assert s.size() == 5
    # snapshot/restore
    blobs = s.snapshot()
    s2 = SeenSet(n_shards=3, capacity_per_shard=1 << 10)
    s2.restore(blobs)
    assert list(s2.contains(np.array([1, 5, 99], dtype=np.uint64))) == \
        [True, True, False]
    s.kill()
    s2.kill()


def test_politeness_restore_tolerates_pre_credit_snapshot(ray_session):
    """Code-review r2: 5-tuple gate snapshots (pre-credit checkpoints)
    must restore with credit defaulting to 0."""
    from crawl4ai_ray.state.politeness import PolitenessGate

    g = PolitenessGate(1, base_delay=(1.0, 1.0))
    g.restore([{"h.test": [0.0, 2.0, 1, ["/private"], False]}])
    snap = g.snapshot()[0]["h.test"]
    assert snap[1] == 2.0 and snap[5] == 0.0
    g.kill()


def test_seen_restore_rebuilds_filter_from_exact(ray_session):
    """Code-review r2: restore must rebuild the cuckoo table from the
    exact array (the truth) — a blob written under a different bucket
    scheme would silently yield false negatives."""
    import ray

    from crawl4ai_ray.state.cuckoo import CuckooFilter
    from crawl4ai_ray.state.seen import SeenShard

    keys = (np.arange(2000, dtype=np.uint64) * np.uint64(0x9E3779B1)
            + np.uint64(3))
    # craft a blob whose table bytes are garbage relative to the keys
    wrong = CuckooFilter(capacity=1 << 12)
    shard = SeenShard.remote(0, 1 << 12)
    ray.get(shard.restore.remote(wrong.to_bytes(), keys.tobytes()))
    out = ray.get(shard.check_and_add.remote(keys))
    assert out.all(), "restored shard lost seen hashes"
    ray.kill(shard)
