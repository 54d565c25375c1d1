"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over chainalytic_framework_spark.contract (query catalog with
paired DuckDB oracles) and the engine's flagship tier pipeline.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chainalytic_framework_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tumbling 1m rollup of the
    events stream cascaded to the 1h tier (continuous-aggregate core of
    the engine)."""
    return contract.rollup_1h_cascade_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
