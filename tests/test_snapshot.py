"""Laws for the crawl snapshot diff (pipelines/snapshot.py)."""


def test_snapshot_diff_laws(ray_session):
    """Classes are exhaustive and consistent with the two site
    configs: config B adds a category (added pages exist) and drops a
    product per subcategory (removed pages exist); listing pages
    change; leaf product pages shared by both configs are byte-stable
    (same class non-empty). Deterministic across runs."""
    from crawl4ai_ray.pipelines.snapshot import crawl_snapshot_diff

    t = crawl_snapshot_diff("/root/testdata/sf0.001").to_pandas()
    assert set(t["change"]) == {"added", "removed", "changed", "same"}
    assert t["url"].is_unique
    t2 = crawl_snapshot_diff("/root/testdata/sf0.001").to_pandas()
    assert t.equals(t2)
    # the new hot-host category is in the added set; the dropped
    # 5th product (p4) of surviving subcategories is in the removed set
    added = t[t["change"] == "added"]["url"]
    removed = t[t["change"] == "removed"]["url"]
    assert added.str.contains("/cat3").any()
    assert removed.str.contains("/p4.html").any()
