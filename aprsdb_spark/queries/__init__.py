"""SURVEY.md §2 operator inventory — importing this package registers
every qid into aprsdb_spark.registry.QUERIES / ORACLE."""

from . import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sort_limit,
    setops,
    scalars,
    llm,
    curation,
    quality,
    corpus,
    infostats,
    layout,
    analytics,
    aprs_queries,
    udfs,
)

ALL_MODULES = [
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sort_limit,
    setops,
    scalars,
    llm,
    curation,
    quality,
    corpus,
    infostats,
    layout,
    analytics,
    aprs_queries,
    udfs,
]
