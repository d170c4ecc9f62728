"""§2.H — scalar function families (string/date/math/cond/array/map/json/
hash). Filled in step by step; see aprs_queries.py for the TNC2 parse
rows which are also scalar-expression work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
