"""Compat ``zavod.logs`` (``zavod/zavod/logs.py`` subset): structlog-
shaped loggers. Inside a crawl, prefer ``context.log`` — it records to
the issues channel (A7); this module covers module-level loggers."""

from __future__ import annotations

import logging
from typing import Any


class _KwargLogger:
    """Wrap stdlib logging with the structlog call shape
    (``log.info("msg", key=value)``)."""

    def __init__(self, name: str) -> None:
        self._log = logging.getLogger(name)

    def _fmt(self, message: str, data: dict[str, Any]) -> str:
        if not data:
            return message
        kv = " ".join(f"{k}={v!r}" for k, v in data.items())
        return f"{message} [{kv}]"

    def debug(self, message: str, **data: Any) -> None:
        self._log.debug(self._fmt(message, data))

    def info(self, message: str, **data: Any) -> None:
        self._log.info(self._fmt(message, data))

    def warning(self, message: str, **data: Any) -> None:
        self._log.warning(self._fmt(message, data))

    warn = warning

    def error(self, message: str, **data: Any) -> None:
        self._log.error(self._fmt(message, data))


def get_logger(name: str) -> _KwargLogger:
    return _KwargLogger(name)
