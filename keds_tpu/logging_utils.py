"""Structured logging for single- and multi-host runs.

The reference uses a multiprocess queue logger with a per-rank prefix filter
(``src/logger.py:26-71``) because it spawns one process per GPU.  A JAX
program is one process per host, so a queue is unnecessary: we install
file+stream handlers once and prefix records with the jax process index when
running multi-host.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


class _ProcessPrefixFilter(logging.Filter):
    """Rank prefix for multi-process logs.  The filter MUTATES record.msg
    and one record passes through every handler's filter chain, so the
    mutation must be idempotent — otherwise a stream+file handler pair
    writes 'Rank 1 | Rank 1 | msg' to the file (round-3 review finding)."""

    _FLAG = "_keds_rank_prefixed"

    def __init__(self, rank: int):
        super().__init__()
        self._rank = rank

    def filter(self, record: logging.LogRecord) -> bool:
        if self._rank > 0 and not getattr(record, self._FLAG, False):
            record.msg = f"Rank {self._rank} | {record.msg}"
            setattr(record, self._FLAG, True)
        return True


def setup_logging(
    log_file: Optional[str] = None,
    level: int = logging.INFO,
    rank: int = 0,
) -> None:
    root = logging.getLogger()
    # Idempotent: a second CLI main() in the same process (tests, library
    # embedding) must replace our handlers, not stack a duplicate pair —
    # stacked handlers write every line twice and leak file descriptors.
    for h in [h for h in root.handlers if getattr(h, "_keds_handler", False)]:
        root.removeHandler(h)
        h.close()
    root.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", datefmt="%Y-%m-%d,%H:%M:%S"
    )
    handlers = [logging.StreamHandler(sys.stderr)]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    prefix = _ProcessPrefixFilter(rank)
    for h in handlers:
        h.setFormatter(fmt)
        h.setLevel(level)
        h.addFilter(prefix)
        h._keds_handler = True  # type: ignore[attr-defined]
        root.addHandler(h)


def dump_params(cfg, path: str) -> None:
    """Write all config fields to params.txt (reference src/main.py:104-111)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for name in sorted(vars(cfg)):
            val = getattr(cfg, name)
            logging.info(f"{name}: {val}")
            f.write(f"{name}: {val}\n")
