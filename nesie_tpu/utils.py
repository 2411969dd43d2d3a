"""Runtime utilities: logging, metrics, profiling, env fingerprint
(reference mmdet3d/utils/logger.py, collect_env.py + the runner's
log_buffer / TensorboardLoggerHook).
"""
from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path


def get_root_logger(log_file=None, level=logging.INFO):
    logger = logging.getLogger("nesie_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def enable_compile_cache(path: str = "/tmp/jax_cache"):
    """Opt in to JAX's persistent compilation cache (safe no-op if the
    backend can't serialize executables). On the remote-compile TPU
    tunnel a fresh program shape costs 10-40 min; the on-disk cache makes
    that a one-time cost shared across tool invocations in a session."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # unknown flag on older jax — keep going
        logging.getLogger("nesie_tpu").debug("compile cache unavailable: %s", e)


def collect_env():
    """Environment fingerprint (reference utils/collect_env.py)."""
    import platform

    import jax

    info = dict(
        python=platform.python_version(),
        platform=platform.platform(),
        jax=jax.__version__,
        backend=jax.default_backend(),
        devices=[str(d) for d in jax.devices()],
    )
    try:
        import flax, optax  # noqa

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info


class MetricsLogger:
    """JSONL metrics stream (+ TensorBoard when available) — the runner's
    log_buffer / TextLoggerHook / TensorboardLoggerHook equivalent."""

    def __init__(self, work_dir, use_tensorboard: bool = True):
        import jax

        # process-0-only writes, like the reference's @master_only loggers
        self.enabled = jax.process_index() == 0
        self.path = Path(work_dir)
        self.tb = None
        self.jsonl = None
        if not self.enabled:
            return
        self.path.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.path / "metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard

                self.tb = tensorboard.SummaryWriter(str(self.path / "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: dict):
        if not self.enabled:
            return
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.scalar(k, float(v), step)

    def close(self):
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.flush()


@contextmanager
def trace(name: str, log_dir=None):
    """jax.profiler trace context (reference: none — the TPU-native
    observability upgrade). Usage:

        with trace("train", "/tmp/prof"):
            step(...)
    """
    import jax

    if log_dir is not None:
        jax.profiler.start_trace(str(log_dir))
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if log_dir is not None:
            jax.profiler.stop_trace()
        logging.getLogger("nesie_tpu").info("%s took %.3fs", name, dt)
