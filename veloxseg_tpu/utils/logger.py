"""File + stdout logger (reference ``utils/get_logger.py`` parity)."""

from __future__ import annotations

import logging
import os


def get_logger(log_path: str, name: str = "veloxseg",
               print_log: bool = True, rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers.clear()
    if rank != 0:
        logger.propagate = False
        logger.addHandler(logging.NullHandler())
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(message)s")
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    fh = logging.FileHandler(log_path)
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    if print_log:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    logger.propagate = False
    return logger
