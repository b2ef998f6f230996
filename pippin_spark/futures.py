"""Async result handle.

Reference Future[T] (types/future.go:27-105): Get blocks forever,
GetWithTimeout blocks up to d and returns a "timeout" error, IsDone
polls; Complete/Fail are internal. Built on a weighted semaphore there;
here it wraps ``concurrent.futures.Future`` produced by submitting the
Spark action on a background thread inside the pipeline's job group
(SURVEY.md §3.2).
"""

from __future__ import annotations

import concurrent.futures
from typing import Any, Optional

from pippin_spark.errors import PipelineTimeoutError


class PippinFuture:
    """Mirror of types/future.go:27-105 on concurrent.futures."""

    def __init__(self) -> None:
        self._inner: concurrent.futures.Future = concurrent.futures.Future()

    # --- reference public surface -------------------------------------
    def get(self) -> Any:
        """Block until the result is available (types/future.go:56-66)."""
        return self._inner.result()

    def get_with_timeout(self, timeout: float) -> Any:
        """Block up to ``timeout`` seconds (types/future.go:73-84);
        raises PipelineTimeoutError('timeout') like the reference's
        "timeout" error (future.go:82)."""
        try:
            return self._inner.result(timeout=timeout)
        except concurrent.futures.TimeoutError:
            raise PipelineTimeoutError() from None

    def is_done(self) -> bool:
        """Non-blocking completion check (types/future.go:89-91)."""
        return self._inner.done()

    # --- internal completion (reference Complete/Fail, future.go:94-105)
    def _complete(self, value: Any) -> None:
        if not self._inner.done():
            self._inner.set_result(value)

    def _fail(self, exc: BaseException) -> None:
        if not self._inner.done():
            self._inner.set_exception(exc)

    def exception(self, timeout: Optional[float] = None):
        return self._inner.exception(timeout=timeout)
