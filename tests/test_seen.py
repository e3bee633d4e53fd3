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
