from .exprs import floordiv, rnd, scalarize, sql_floordiv, sql_rnd  # noqa: F401
