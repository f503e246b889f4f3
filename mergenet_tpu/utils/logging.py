"""Minimal TensorBoard-compatible scalar logging.

Drop-in for the reference's `tensorboard_logger.log_value` usage
(`utils/train_utils.py:37-39,100-106`): writes TensorBoard event files when
the `tensorboard` package (or flax.metrics writer) is importable, otherwise
falls back to an append-only JSONL file that the same API contract covers.
"""

import json
import os
import time

_writer = None
_logdir = None


def configure(logdir):
    """Set the logging directory (API parity with tensorboard_logger)."""
    global _writer, _logdir
    _logdir = logdir
    os.makedirs(logdir, exist_ok=True)
    _writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        _writer = SummaryWriter(logdir)
    except Exception:
        _writer = None


def log_value(name, value, step=0):
    """Log a scalar; no-op unless configure() was called."""
    if _logdir is None:
        return
    if _writer is not None:
        _writer.add_scalar(name, float(value), int(step))
        return
    path = os.path.join(_logdir, "scalars.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({"name": name, "value": float(value),
                            "step": int(step), "time": time.time()}) + "\n")
