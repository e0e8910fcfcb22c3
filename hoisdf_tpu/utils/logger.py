"""Colored console + file logger (parity: common/logger.py:23-56)."""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {"WARNING": 33, "INFO": 32, "DEBUG": 35, "CRITICAL": 31, "ERROR": 31}


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelname)
        if color and sys.stderr.isatty():
            return f"\x1b[{color}m{msg}\x1b[0m"
        return msg


def colorlogger(log_dir: str = ".", log_name: str = "logs.txt") -> logging.Logger:
    logger = logging.getLogger(f"hoisdf.{log_name}")
    os.makedirs(log_dir, exist_ok=True)
    target = os.path.abspath(os.path.join(log_dir, log_name))
    if logger.handlers:
        # Same-named logger from an earlier run in this process: keep it if
        # it already writes to this run's file, else rebind the handlers
        # (a cached handler would silently log into the OLD run's dir).
        for h in logger.handlers:
            if isinstance(h, logging.FileHandler) and h.baseFilename == target:
                return logger
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = "%(asctime)s %(levelname)s %(message)s"
    fh = logging.FileHandler(target)
    fh.setFormatter(logging.Formatter(fmt))
    ch = logging.StreamHandler()
    ch.setFormatter(_ColorFormatter(fmt))
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger
