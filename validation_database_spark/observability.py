"""Run logging: the reference's de-facto observability surface.

The reference writes a timestamped ``logs/data_validation_<ts>.log``
per run (reference running_validation.py:14-28) and narrates every
stage through it — config/credential loading, per-source connection
parameters and the generated SQL, batch progress, each validation
phase, and the report writes (see the committed logs under the
reference's ``logs/``). That file IS its UX for unattended runs, so
the engine reproduces the shape: same filename convention, same
``%(asctime)s - %(levelname)s - %(message)s`` line format, same stage
narration keyed off ``run_validation``.

One deliberate divergence: the reference logs credentials in clear
text (``logging.info(f"password: {password}")``,
running_validation.py:37). We redact secret-bearing keys instead —
byte-parity with a credential leak is not a compat goal.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime
from typing import Any

#: config/source keys whose values must never reach a log line.
SECRET_KEYS = frozenset(
    {
        "password",
        "passwd",
        "secret",
        "token",
        "aws_secret_access_key",
        "access_key",
        "credentials",
    }
)


def redact(mapping: dict[str, Any]) -> dict[str, Any]:
    """Copy ``mapping`` with secret-bearing values masked."""
    return {
        k: "***" if k.lower() in SECRET_KEYS else v for k, v in mapping.items()
    }


def make_run_logger(log_dir: str) -> logging.Logger:
    """A per-run file logger matching the reference's convention:
    ``<log_dir>/data_validation_<YYYYMMDD_HHMMSS>.log`` with
    ``%(asctime)s - %(levelname)s - %(message)s`` lines."""
    os.makedirs(log_dir, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = os.path.join(log_dir, f"data_validation_{ts}.log")
    logger = logging.getLogger(f"validation_database_spark.run.{ts}.{id(path)}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    handler = logging.FileHandler(path)
    handler.setFormatter(
        logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(handler)
    # expose the path for tests/callers (reference prints it nowhere,
    # but discoverability beats parity here).
    logger.log_path = path  # type: ignore[attr-defined]
    return logger


class NullLogger:
    """No-op stand-in when no ``log_directory`` is configured, so the
    engine path stays branch-free."""

    log_path = None

    def info(self, *a: Any, **k: Any) -> None:
        pass

    def error(self, *a: Any, **k: Any) -> None:
        pass
