"""Rank-aware logging (port of /root/reference/utilities/Logger.py).

``create_logger`` gives per-module loggers that log below ERROR only on the
main process (Logger.py:51-52, jax.process_index replaces dist rank);
``set_logger`` tees stdout/stderr to a timestamped file under ``./log/``
(Logger.py:66-72).
"""
from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional


def _is_main() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


def create_logger(name: str, terminal_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(terminal_level if _is_main() else logging.ERROR)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


class _Tee:
    def __init__(self, stream, f):
        self.stream = stream
        self.f = f

    def write(self, data):
        self.stream.write(data)
        self.f.write(data)

    def flush(self):
        self.stream.flush()
        self.f.flush()


def set_logger(info: str, log_dir: str = "./log") -> Optional[str]:
    """Tee stdout/stderr to ``log/<info>-<timestamp>.log`` (main process)."""
    if not _is_main():
        return None
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(
        log_dir, f"{info}-{time.strftime('%Y%m%d-%H%M%S')}.log"
    )
    f = open(path, "a")
    sys.stdout = _Tee(sys.__stdout__, f)
    sys.stderr = _Tee(sys.__stderr__, f)
    return path
