"""Engine exceptions.

Error-message parity notes:
- interruption surfaces as "context canceled" in the reference
  (pippin_test.go:342-347); we raise PipelineInterruptedError with that
  phrase in the message so goldens can assert on it.
- sync aggregation on a manual-start pipeline panics in the reference
  (stages/aggregate/aggregate.go:574-579); we raise ManualStartError.
"""

from __future__ import annotations


class PippinError(Exception):
    """Base class for all pippin_spark errors."""


class PipelineInterruptedError(PippinError):
    """Pipeline was interrupted (reference: 'context canceled')."""

    def __init__(self, message: str = "context canceled") -> None:
        super().__init__(message)


class PipelineTimeoutError(PippinError):
    """Pipeline or future timed out (reference: status TimedOut / 'timeout')."""

    def __init__(self, message: str = "timeout") -> None:
        super().__init__(message)


class ManualStartError(PippinError):
    """Sync aggregation requested on a pipeline with delayed manual start.

    Reference panics: aggregate/aggregate.go:574-579. Use the async
    aggregation variants instead, then Pipeline.start().
    """

    def __init__(self) -> None:
        super().__init__(
            "sync aggregation is not allowed for pipelines with delayed "
            "manual start: use the *_async aggregation and Pipeline.start()"
        )


class StageTypeError(PippinError):
    """A transform could not be expressed natively and no return_type was
    given for the UDF fallback, or the stage schema does not fit the op."""
