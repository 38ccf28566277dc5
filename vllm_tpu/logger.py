"""Stdout logging for vllm_tpu.

Capability parity: /root/reference/vllm/logger.py (stdout logger with a
newline-aligning formatter). Re-designed: plain stdlib logging with an
ISO-timestamped single-line format.
"""

import logging
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_root_handler: logging.Handler | None = None


def _get_handler() -> logging.Handler:
    global _root_handler
    if _root_handler is None:
        _root_handler = logging.StreamHandler(sys.stdout)
        _root_handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    return _root_handler


def init_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        logger.addHandler(_get_handler())
    logger.propagate = False
    return logger
