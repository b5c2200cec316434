"""Serving helpers: rotating file logger + error message constants
(reference serve/serve_utils.py:14-84)."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from pathlib import Path

server_error_msg = ("**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE "
                    "REGENERATE OR REFRESH THIS PAGE.**")

handler = None


def build_logger(logger_name: str, logger_filename: str,
                 log_dir: str = "logs") -> logging.Logger:
    global handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    logging.basicConfig(level=logging.INFO, encoding="utf-8")
    for h in logging.getLogger().handlers:
        h.setFormatter(formatter)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    if handler is None:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        filename = os.path.join(log_dir, logger_filename)
        handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True, encoding="utf-8")
        handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(handler)
    return logger


def pretty_print_semaphore(semaphore) -> str:
    if semaphore is None:
        return "None"
    # _value is CPython's internal counter (no public accessor on
    # asyncio.Semaphore); fall back gracefully if it ever disappears
    value = getattr(semaphore, "_value", "?")
    return f"Semaphore(value={value}, locked={semaphore.locked()})"
