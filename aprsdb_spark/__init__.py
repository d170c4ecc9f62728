"""aprsdb_spark — a PySpark-native analytics engine with the capability
surface of ``wsmitchell3/aprsdb`` (streaming APRS packet ingest + DB-style
queries) plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis), designed for 100 TB scale.

Blueprint: SURVEY.md (the reference checkout was empty — see SURVEY.md §0;
all semantics derive from the public APRS101 spec, APRS-IS docs, the
aprslib parse-dict shape, and the public PySpark API).

Layout
------
- ``session``    : SparkSession builder (AQE, Arrow, UTC, shuffle sizing)
- ``tables``     : loaders for the driver's ten parquet tables
- ``registry``   : qid -> (query callable, oracle SQL) registration
- ``queries/``   : SURVEY.md §2 operator inventory, one module per group
- ``operators/`` : composite algorithms (as-of join, MinHash-LSH, ANN)
- ``functions/`` : reusable column expressions (geo, text, vectors)
- ``aprs/``      : TNC2 / APRS packet parsing layer (expression-first)
- ``streaming/`` : Structured Streaming ingest, dedup, windows, sinks
"""

__version__ = "0.1.0"
