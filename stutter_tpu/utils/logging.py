"""Structured logging shared by all CLIs.

Capability parity: the reference sets up a per-script file+stream logger with a
timestamped logfile under ``logs/`` (reference ``WavLM_embeddings.py:15-25``,
same pattern in all four scripts). Here one helper serves every entry point.
"""

from __future__ import annotations

import logging
import os
import sys
from datetime import datetime

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_configured = False


def setup_logging(tag: str, log_dir: str = "logs", level: int = logging.INFO) -> logging.Logger:
    """Configure root logging with a stream handler and a timestamped logfile.

    Idempotent: repeated calls add no duplicate handlers.
    """
    global _configured
    logger = logging.getLogger("stutter_tpu")
    if not _configured:
        logger.setLevel(level)
        stream = logging.StreamHandler(sys.stderr)
        stream.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(stream)
        try:
            os.makedirs(log_dir, exist_ok=True)
            stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
            fileh = logging.FileHandler(os.path.join(log_dir, f"{tag}_{stamp}.log"))
            fileh.setFormatter(logging.Formatter(_FORMAT))
            logger.addHandler(fileh)
        except OSError:
            logger.warning("could not create log dir %s; logging to stderr only", log_dir)
        _configured = True
    return logger


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"stutter_tpu.{name}")
