"""join_example_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering the query surface of the
reference (`the4thamigo-uk/join-example`, a Kafka Streams join demo;
snapshot unavailable — see SURVEY.md §0) re-expressed as idiomatic
PySpark DataFrame / SQL / Structured Streaming, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required for 100 TB-scale training-data work.

Layout:
- ``sources``   — parquet readers with explicit post-read normalization
                  (notably the nanosecond-timestamp recipe for ``events``).
- ``operators`` — reusable distributed operators (as-of join, range join,
                  latest-per-key, dedup family, similarity, sessionization).
- ``functions`` — scalar-expression helpers shared between the Spark and
                  oracle sides (determinism bridges for float aggregation).
- ``queries``   — the declared query registry: every operator from
                  SURVEY.md §2 as a (spark, sf_dir) -> DataFrame callable
                  plus, where expressible, a DuckDB oracle SQL string.
- ``streaming`` — Structured Streaming demos (file-source micro-batch,
                  watermarks, stateful ops) mirroring Kafka Streams DSL.
- ``plans``     — physical-plan audit helpers (broadcast/pushdown checks).
"""

__version__ = "0.1.0"
