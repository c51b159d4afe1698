"""Logging — TPU-native equivalent of the reference LoggerSystem
(reference: source/utils/log.h — spdlog sinks, optional file sink behind the
"r.log.file" cvar, push/pop callback taps for UI consoles)."""

from __future__ import annotations

import logging
import sys
from typing import Callable, List

_FORMAT = "%(asctime)s [%(levelname).1s] %(name)s: %(message)s"
_configured = False
_taps: List[Callable[[str], None]] = []


class _TapHandler(logging.Handler):
    def emit(self, record: logging.LogRecord) -> None:
        msg = self.format(record)
        for tap in list(_taps):
            tap(msg)


def _configure() -> None:
    global _configured
    if _configured:
        return
    root = logging.getLogger("chord_tpu")
    root.setLevel(logging.INFO)
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root.addHandler(h)
    th = _TapHandler()
    th.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
    root.addHandler(th)
    root.propagate = False
    _configured = True


def get_logger(name: str = "chord_tpu") -> logging.Logger:
    _configure()
    if not name.startswith("chord_tpu"):
        name = f"chord_tpu.{name}"
    return logging.getLogger(name)


def push_tap(cb: Callable[[str], None]) -> None:
    """Register a log tap (reference: utils/log.h:42-49 pushCallback)."""
    _configure()
    _taps.append(cb)


def pop_tap(cb: Callable[[str], None]) -> None:
    if cb in _taps:
        _taps.remove(cb)


def enable_file_log(path: str) -> None:
    _configure()
    h = logging.FileHandler(path)
    h.setFormatter(logging.Formatter(_FORMAT))
    logging.getLogger("chord_tpu").addHandler(h)
