"""Logging helpers (rebuild of `finetuning/llava/utils.py:73-160`).

`setup_logging` = build_logger: console + rotating file handler, one file per
process; `process_zero_log` = rank0_print under jax.process_index().
"""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Optional


def setup_logging(
    name: str = "radvlm_tpu",
    *,
    level: int = logging.INFO,
    log_dir: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(name)s | %(message)s"
        )
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                import jax

                suffix = f"_p{jax.process_index()}"
            except Exception:
                suffix = ""
            fh = logging.handlers.RotatingFileHandler(
                os.path.join(log_dir, f"{name}{suffix}.log"),
                maxBytes=50 * 1024 * 1024,
                backupCount=3,
            )
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def process_zero_log(logger: logging.Logger, msg: str, *args) -> None:
    """Log only on process 0 (the reference's rank0_print)."""
    try:
        import jax

        if jax.process_index() != 0:
            return
    except Exception:
        pass
    logger.info(msg, *args)
