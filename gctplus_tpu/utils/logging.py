"""Console+file logger (reference Utils/log.py:26-44, minus its
duplicate-handler bug: handlers are added once per (name, path))."""

from __future__ import annotations

import logging
import os
from typing import Optional


def get_logger(name: str = "gctplus", log_path: Optional[str] = None
               ) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    have = {getattr(h, "_gct_tag", None) for h in logger.handlers}
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if "console" not in have:
        h = logging.StreamHandler()
        h.setFormatter(fmt)
        h._gct_tag = "console"
        logger.addHandler(h)
    if log_path and ("file:" + log_path) not in have:
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        h = logging.FileHandler(log_path)
        h.setFormatter(fmt)
        h._gct_tag = "file:" + log_path
        logger.addHandler(h)
    logger.propagate = False
    return logger
