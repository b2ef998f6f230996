"""Pipeline / stage configuration.

Mirrors the reference config surface (configs/pipeline.go:31-38,
configs/stage.go:26-31) with documented divergences:

- ``max_parallelism`` / ``max_parallelism_per_stage`` map the reference's
  goroutine caps (MaxGoroutinesTotal / MaxGoroutinesPerStage,
  ratelimiter/ratelimiter.go:9-12) onto Spark partition counts: a stage
  with a cap N is repartitioned to N before a Python-UDF stage (the
  reference's stated motivation is capping concurrent outbound calls,
  README.md:252). Spark owns CPU scheduling; the cap bounds concurrent
  *tasks* for that stage, which is the same contract.
- per-stage ``timeout`` applies to the Spark job that materializes the
  terminal action of the stage's plan (a fused Spark plan has no
  per-stage execution to bound — SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from pippin_spark.logging_utils import PippinLogger


@dataclasses.dataclass
class PipelineConfig:
    """Reference: configs/pipeline.go:31-38."""

    # delayed manual start: pipeline stays PENDING until .start()
    manual_start: bool = False
    # pipeline-wide timeout in seconds (reference: time.Duration Timeout)
    timeout: Optional[float] = None
    # reference MaxGoroutinesTotal — upper bound on concurrent tasks
    max_parallelism: Optional[int] = None
    # reference MaxGoroutinesPerStage — default per-stage bound
    max_parallelism_per_stage: Optional[int] = None
    # pipeline-level logger (reference: configs/pipeline.go Logger)
    logger: Optional[PippinLogger] = None
    # strict reference semantics for aggregation zero-value seeding
    # (aggregate/aggregate.go:543 seeds `var result Aggr` — Go zero value):
    # sum/count of empty input → 0, max of all-negative → 0, min of
    # all-positive → 0. Default False = SQL/NULL semantics (SURVEY §7.3#2).
    strict_zero_seed: bool = False
    # cap on error rows collected for *_with_error callbacks at action time
    error_collect_limit: int = 10_000


@dataclasses.dataclass
class StageConfig:
    """Reference: configs/stage.go:26-31. Stage overrides pipeline
    (transform/transform.go:455-480)."""

    timeout: Optional[float] = None
    max_parallelism: Optional[int] = None  # reference MaxGoroutines
    logger: Optional[PippinLogger] = None
