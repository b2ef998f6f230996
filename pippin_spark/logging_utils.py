"""Logging adapter.

Reference defines a Logger interface with Trace/Debug/Info/Warn/Error and
Close (logging/logging.go:3-10) plus three impls: Console
(logging/console.go:19-61), Channel — async via goroutine+chan
(logging/channel.go:19-68) and NoOps (logging/noops.go:5-23). Pipeline-
and stage-level loggers override (transform/transform.go:469-480).

Python mapping: thin wrappers over stdlib ``logging``; the Channel logger
maps to QueueHandler/QueueListener (async hand-off thread).
"""

from __future__ import annotations

import logging
import queue
from logging.handlers import QueueHandler, QueueListener

TRACE = 5
logging.addLevelName(TRACE, "TRACE")


class PippinLogger:
    """Logger facade matching the reference interface shape."""

    def __init__(self, logger: logging.Logger) -> None:
        self._logger = logger

    def trace(self, msg: str, *args) -> None:
        self._logger.log(TRACE, msg, *args)

    def debug(self, msg: str, *args) -> None:
        self._logger.debug(msg, *args)

    def info(self, msg: str, *args) -> None:
        self._logger.info(msg, *args)

    def warn(self, msg: str, *args) -> None:
        self._logger.warning(msg, *args)

    def error(self, msg: str, *args) -> None:
        self._logger.error(msg, *args)

    def close(self) -> None:  # reference Logger.Close
        pass


def console_logger(name: str = "pippin", level: int = logging.INFO) -> PippinLogger:
    """Console logger (reference logging/console.go:19-61)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s [%(name)s] %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return PippinLogger(logger)


class ChannelLogger(PippinLogger):
    """Async logger: records pass through a queue to a listener thread
    (reference logging/channel.go:19-68)."""

    def __init__(self, name: str = "pippin.channel", level: int = logging.INFO) -> None:
        self._queue: queue.Queue = queue.Queue()
        logger = logging.getLogger(name)
        logger.setLevel(level)
        logger.addHandler(QueueHandler(self._queue))
        stream = logging.StreamHandler()
        stream.setFormatter(logging.Formatter("%(levelname)s [%(name)s] %(message)s"))
        self._listener = QueueListener(self._queue, stream)
        self._listener.start()
        super().__init__(logger)

    def close(self) -> None:
        self._listener.stop()


def noop_logger() -> PippinLogger:
    """No-op logger (reference logging/noops.go:5-23)."""
    logger = logging.getLogger("pippin.noop")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    return PippinLogger(logger)
