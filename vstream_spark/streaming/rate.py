"""Rate control / admission (SURVEY §2.2 R1-R5) + monotonic query guard.

The reference throttles its sources with pluggable rate controllers sharing
one convention (``PartitionFunction.java:220-228``):

    rate > 0   -> records per second
    rate == 0  -> unlimited
    rate < 0   -> one record every ``-rate`` seconds

In Structured Streaming the same knobs are per-trigger options, not
per-record sleeps: ``rowsPerSecond`` for the rate source and
``maxFilesPerTrigger`` for file replay. Controllers here are small
deterministic policy objects the driver evaluates between micro-batches —
the orchestration-level concern the reference wires into its sources.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rows_per_second(rate: float) -> float:
    """Reference rate convention -> rows/s (0 = unlimited -> inf)."""
    if rate > 0:
        return float(rate)
    if rate == 0:
        return float("inf")
    return 1.0 / -rate  # -interval seconds per record


@dataclass(frozen=True)
class StagedRateController:
    """R1 (StagedRateControllerBuilder.java:6-59): rate ``rates[i]`` applies
    once the emitted count reaches ``thresholds[i]`` (piecewise constant)."""

    rates: tuple[float, ...]
    thresholds: tuple[int, ...]

    def __post_init__(self):
        if len(self.rates) != len(self.thresholds):
            raise ValueError("rates and thresholds must have equal length")
        if list(self.thresholds) != sorted(self.thresholds):
            raise ValueError("thresholds must be non-decreasing")
        if not self.thresholds or self.thresholds[0] != 0:
            raise ValueError("first threshold must be 0")

    def rate_at(self, count: int) -> float:
        r = self.rates[0]
        for rate, thr in zip(self.rates, self.thresholds):
            if count >= thr:
                r = rate
        return r


@dataclass(frozen=True)
class PollingRateController:
    """R2 (PollingRateControllerBuilder.java): re-read the target rate from a
    control file between micro-batches (live re-tuning). The file holds a
    JSON number; missing/invalid -> ``default_rate``."""

    path: str
    default_rate: float

    def current_rate(self) -> float:
        try:
            with open(self.path) as f:
                return float(json.load(f))
        except (OSError, ValueError):
            return self.default_rate


@dataclass(frozen=True)
class BindingRateController:
    """R3 (BindingRateControllerBuilder.java:6-88): the query rate switches
    from ``initial_rate`` to ``new_rate`` once insert progress (polled from
    the ingest side) passes ``insert_threshold``."""

    initial_rate: float
    new_rate: float
    insert_threshold: int

    def rate_at(self, insert_progress: int) -> float:
        return self.new_rate if insert_progress >= self.insert_threshold else self.initial_rate


def throttled_rate_source(spark, controller, progress: int = 0) -> DataFrame:
    """A rate-source stream whose rowsPerSecond is the controller's current
    rate for ``progress`` (re-evaluated by the driver when restarting the
    query between stages — R5's per-record sleep becomes a source option)."""
    if isinstance(controller, StagedRateController):
        rate = controller.rate_at(progress)
    elif isinstance(controller, BindingRateController):
        rate = controller.rate_at(progress)
    elif isinstance(controller, PollingRateController):
        rate = controller.current_rate()
    else:
        raise TypeError(f"unknown controller {type(controller).__name__}")
    rps = rows_per_second(rate)
    if rps == float("inf"):
        rps = 10_000_000  # "unlimited" still needs a finite source option
    return spark.readStream.format("rate").option("rowsPerSecond", int(max(1, rps))).load()


def monotonic_guard(queries: DataFrame, seq_col: str = "qid") -> DataFrame:
    """Drop out-of-order queries (RocksDBKeyedProcessFunction.search:90-93:
    a query older than the last processed one is discarded).

    Batch analog of the single reduce-side guard: order by arrival sequence,
    keep rows whose event_time >= running max of all earlier arrivals. The
    window is unpartitioned by design — the reference runs this guard on a
    parallelism-1 operator; the QUERY stream is low-rate (100 q/s baseline),
    so a single-partition window over it is not a scale hazard.
    """
    w = Window.orderBy(seq_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        queries.withColumn("_prev_max", F.max("event_time").over(w))
        .filter(F.col("_prev_max").isNull() | (F.col("event_time") >= F.col("_prev_max")))
        .drop("_prev_max")
    )
