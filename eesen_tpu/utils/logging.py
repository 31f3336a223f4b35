"""Logging for eesen_tpu.

The reference toolkit uses KALDI_LOG/WARN/ERR/VLOG macros writing to stderr
with function/file/line context (reference: src/base/kaldi-error.h:135-137,
verbose level at :50-63).  Here we ride Python's logging with a module-level
verbosity knob for the VLOG-style levels.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(levelname)s %(name)s %(asctime)s: %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"

_configured = False
_verbose_level = int(os.environ.get("EESEN_VERBOSE", "0"))


def _configure() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, _DATEFMT))
    root = logging.getLogger("eesen_tpu")
    root.addHandler(handler)
    root.setLevel(logging.INFO if _verbose_level <= 0 else logging.DEBUG)
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    """Return a logger under the eesen_tpu namespace."""
    _configure()
    if not name.startswith("eesen_tpu"):
        name = f"eesen_tpu.{name}"
    return logging.getLogger(name)


def set_verbose_level(level: int) -> None:
    """VLOG-style verbosity: 0 = INFO, >=1 = DEBUG."""
    global _verbose_level
    _verbose_level = level
    _configure()
    logging.getLogger("eesen_tpu").setLevel(
        logging.INFO if level <= 0 else logging.DEBUG
    )


def get_verbose_level() -> int:
    return _verbose_level
