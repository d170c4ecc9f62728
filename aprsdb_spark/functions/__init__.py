from .exprs import rnd, scalarize, sql_rnd  # noqa: F401
