"""§2.J — LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal). Implementations arrive with operators/{dedup,similarity}.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
