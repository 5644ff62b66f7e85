"""Run metrics reporter (SURVEY §2.4 A7).

The reference accumulates named counters during the run and dumps them as
one JSON object at exit (/root/reference/reporter/reporter.go:10-53). Here
the counters are Spark accumulators — safe to increment from executors —
plus driver-side gauges; ``dump()`` renders the same one-object JSON report.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession


class Reporter:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._acc: dict[str, Any] = {}
        self._gauges: dict[str, Any] = {}

    def counter(self, name: str):
        """Executor-incrementable counter (LongAccumulator)."""
        if name not in self._acc:
            self._acc[name] = self._spark.sparkContext.accumulator(0)
        return self._acc[name]

    def increment(self, name: str, amount: int = 1) -> None:
        self.counter(name).add(amount)

    def commit(self, name: str, value) -> None:
        """Driver-side gauge (reporter.go Commit)."""
        self._gauges[name] = value

    def report(self) -> dict:
        out = {k: v.value for k, v in self._acc.items()}
        out.update(self._gauges)
        return out

    def dump(self) -> str:
        return json.dumps(self.report(), sort_keys=True, default=str)
