"""Structured tracing for scan/pushdown paths.

The reference threads ``tracing`` spans through its scan paths and enables
them via the ``EXON_LOG`` env var in the CLI (exon-cli/src/main.rs:112-115);
here the same env var configures the ``exon_tpu`` logger hierarchy, so
``EXON_LOG=debug python -m exon_tpu.cli ...`` prints region pruning and
scan decisions.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("exon_tpu")

_LEVELS = {"trace": logging.DEBUG, "debug": logging.DEBUG,
           "info": logging.INFO, "warn": logging.WARNING,
           "error": logging.ERROR}


def configure_from_env() -> None:
    level = os.environ.get("EXON_LOG") or os.environ.get("EXON_TPU_LOG")
    if not level:
        return
    lv = _LEVELS.get(level.strip().lower(), logging.INFO)
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(lv)


@contextmanager
def span(name: str, **fields):
    """Timed span logged at DEBUG: entry fields + elapsed on exit."""
    if not logger.isEnabledFor(logging.DEBUG):
        yield
        return
    kv = " ".join(f"{k}={v}" for k, v in fields.items())
    logger.debug("%s begin %s", name, kv)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.debug("%s end elapsed_ms=%.2f", name,
                     (time.perf_counter() - t0) * 1e3)


configure_from_env()
