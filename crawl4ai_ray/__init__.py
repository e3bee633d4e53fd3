"""crawl4ai_ray — a Ray-Data-native crawl/data-processing engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference crawler (cbwinslow/crawl4ai): a URL-frontier
+ fetch scheduler over tables of interleaved text+media span documents,
expressed as ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, with actor pools for stateful stages
(fetch sessions, sharded URL-seen set, per-host politeness).

Layout
------
- ``schemas``    : pyarrow schemas for every logical table (tables are
                   parquet directories with atomic ``_COMMIT``-marked
                   superstep partitions — Lance-style semantics; the
                   ``lance`` package is not available in this environment,
                   and ``sources/lancekit.py`` activates real Lance
                   datasets through the same read/write seam iff it is)
- ``functions``  : pure, vectorizable kernels (URL canonicalization,
                   filters, scorers, chunkers, text stats, regex extraction)
- ``stages``     : map_batches stages (HTML parse→spans, fetch actor pool)
- ``state``      : stateful actors (cuckoo-filter seen-set shards,
                   politeness/robots scheduler)
- ``sources``    : deterministic synthetic-web + interleaved-doc generators
- ``pipelines``  : superstep crawl driver, dedup, similarity, analysis,
                   relational demo queries
- ``oracle``     : single-process reference-semantics crawler producing
                   golden outputs for pytest
"""

import os as _os

# Polars defaults its thread pool to ALL cores in EVERY process. Inside Ray
# worker processes (one per CPU) that is n_cpus² threads and measurably
# NEGATIVE scaling at 32 CPUs. Must be set before polars is first imported;
# driver-side polars work is small post-combiner, so 2 threads suffice
# everywhere. Users can override by exporting POLARS_MAX_THREADS first.
_os.environ.setdefault("POLARS_MAX_THREADS", "2")

__version__ = "0.1.0"
