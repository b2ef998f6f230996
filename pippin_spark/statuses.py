"""Pipeline lifecycle statuses.

Mirrors the reference enum (``types/statuses/status.go:3-19``):
``Pending → Running → Done | Interrupted | TimedOut``.

The reference updates status eventually-consistently via an async status
channel (pipeline/pipeline.go:85-97); here the driver-side state machine
is updated synchronously under a lock by action callbacks / timers, which
is strictly stronger.
"""

from __future__ import annotations

import enum


class Status(enum.Enum):
    PENDING = "pending"        # created with manual_start, not started yet
    RUNNING = "running"        # data may flow (Spark: actions may be submitted)
    DONE = "done"              # terminal aggregation completed
    INTERRUPTED = "interrupted"  # Pipeline.interrupt() called
    TIMED_OUT = "timed_out"    # pipeline timeout fired

    def is_terminal(self) -> bool:
        return self in (Status.DONE, Status.INTERRUPTED, Status.TIMED_OUT)
