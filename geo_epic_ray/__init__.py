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
