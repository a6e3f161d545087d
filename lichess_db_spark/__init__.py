"""lichess_db_spark — a PySpark-native analytics engine.

A from-scratch Spark DataFrame/SQL engine with the query and
data-processing capabilities of the reference single-machine
polars pipeline (sodascience/lichess_db), re-expressed Spark-first:

- ``sources/``    PGN parsing + staging (reference ingester.py:89-235)
- ``plans/``      the domain pipeline (clean -> unpivot -> window
                  features) and the relational query catalog
- ``operators/``  aggregations, windows, dedup, similarity, top-k
- ``functions/``  scalar/text/vector column helpers
- ``streaming/``  Structured Streaming variants of the stateful ingest
- ``multimodal/`` binary-column plumbing with stubbed decoders

Everything is built on the public PySpark DataFrame API and designed
for multi-executor scale (partitioning, broadcast, AQE) even though
tests run on local[*].
"""

__version__ = "0.1.0"
