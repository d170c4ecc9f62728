"""APRS parsing qids (h_str_parse_tnc2 / h_str_parse_pos) + rows-only
pipeline checks over committed packet fixtures. Implementations arrive
with aprs/parse.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
