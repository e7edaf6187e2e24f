"""ariadne_cartograph_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference GIS
ingestion/enrichment pipeline (`ariadnes-thread/ariadne-cartograph`,
read-only at /root/reference), re-expressed Spark-first:

- ``sources``   — parquet/OSM-XML/tile readers (SURVEY.md §2.1)
- ``functions`` — native Column-expression function library: geo
  projection math, text analysis, vector math (SURVEY.md §2.3)
- ``operators`` — composed operators: enrichment dataflow, merge/upsert,
  dedup family, similarity search, as-of join, sessionization, spatial
  join, topology (SURVEY.md §2.2, §2.4-2.7)
- ``plans``     — the query catalog backing the driver contract
- ``streaming`` — Structured Streaming surface over `events`
  (SURVEY.md §2.6)

Everything is built on the public PySpark 4.x DataFrame/SQL API; no
third-party extensions are assumed.
"""

__version__ = "0.1.0"
