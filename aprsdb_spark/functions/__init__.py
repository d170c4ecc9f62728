from .exprs import rnd, sql_rnd  # noqa: F401
