"""Structured logging (replacement for ``common.py_utils.log.logger``,
used at reference acinoset_models.py:14)."""
from __future__ import annotations

import logging
import sys


def logger(name: str, level: int = logging.INFO) -> logging.Logger:
    log = logging.getLogger(name)
    if not log.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        log.addHandler(handler)
        log.setLevel(level)
        log.propagate = False
    return log
