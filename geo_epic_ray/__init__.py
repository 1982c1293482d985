"""geo_epic_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
reference (smarsGroup/geo-epic), re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches; actor pools for stateful stages (polygon shard indexes, kNN
  lattices); explicit hash partitioning + salting for the wide steps.
- Primary corpus: an interleaved text+media document table
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
  stored as partitioned Parquet ("lance-style" layout: one directory per
  partition + a lineage manifest; the ``lance`` package is not available in
  this environment, so Parquet is the physical format — the logical layout,
  resumability and per-partition lineage are identical).
- Geometry kernels (quadkey cells, haversine, point-in-polygon, affine
  tiling) are pure numpy — no GEOS/GDAL dependency.

Reference semantics are cited per-module as ``/root/reference/<file>:<lines>``.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API — keeps `import geo_epic_ray` light (no Ray import
    until a pipeline is actually used)."""
    surface = {
        "flagship_enrich": "geo_epic_ray.pipelines.flagship",
        "run_flagship": "geo_epic_ray.pipelines.flagship",
        "run_flagship_fragments": "geo_epic_ray.pipelines.flagship",
        "read_flagship_output": "geo_epic_ray.pipelines.flagship",
        "compact_partitions": "geo_epic_ray.pipelines.flagship",
        "synthetic_documents": "geo_epic_ray.pipelines.flagship",
        "run_simulation_fleet": "geo_epic_ray.pipelines.simulate",
        "QUERIES": "geo_epic_ray.pipelines.queries",
        "ORACLES": "geo_epic_ray.pipelines.queries",
        "select": "geo_epic_ray.stages.select_dsl",
        "KnnIndex": "geo_epic_ray.geo.knn",
        "PolygonIndex": "geo_epic_ray.geo.pip",
        "Manifest": "geo_epic_ray.state.manifest",
        "RoutineRegistry": "geo_epic_ray.pipelines.registry",
        "composite_extract": "geo_epic_ray.pipelines.gee",
        "minhash_dedup_pairs": "geo_epic_ray.stages.dedup",
        "simhash_dup_pairs": "geo_epic_ray.stages.dedup",
        "embedding_dup_pairs": "geo_epic_ray.stages.dedup",
        "ann_topk": "geo_epic_ray.stages.similarity",
        "TDigest": "geo_epic_ray.stages.sketches",
        "HLL": "geo_epic_ray.stages.sketches",
        "CountMinSketch": "geo_epic_ray.stages.sketches",
        "connected_components": "geo_epic_ray.stages.components",
        "range_join": "geo_epic_ray.stages.joins",
        "tfidf_top_terms": "geo_epic_ray.stages.text",
        "blocked_components": "geo_epic_ray.stages.components",
        "kmeans_fit": "geo_epic_ray.stages.cluster",
        "explode_spans": "geo_epic_ray.stages.spans",
        "reassemble_spans": "geo_epic_ray.stages.spans",
        "filter_spans": "geo_epic_ray.stages.spans",
        "span_stats": "geo_epic_ray.stages.spans",
    }
    if name in surface:
        import importlib

        return getattr(importlib.import_module(surface[name]), name)
    raise AttributeError(f"module 'geo_epic_ray' has no attribute {name!r}")
