"""maxscale_cdc_spark — a PySpark-native CDC analytics engine.

A from-scratch Spark engine with the capabilities of the reference
`connectfit-team/maxscale-cdc` (a MaxScale CDC protocol client): the CDC
event data model (DDL schema events + DML change events), stream
lifecycle semantics (resume-from-GTID, schema versioning, ordered
delivery), a materialization/query surface over the reconstructed
tables, plus large-scale LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the stream surface, Pandas UDFs only
where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
