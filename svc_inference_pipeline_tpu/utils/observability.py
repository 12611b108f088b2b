"""Tracing, profiling, metrics, and intermediates capture.

The reference's only instrumentation is a wall-clock print, tqdm bars, and
a hand-rolled ``stats`` side-channel that threads ``(output, stats_dict)``
tuples through every model forward and then discards them
(/root/reference/modules/diffsvc.py:74-94,211-232,300-321;
diffsvcrepo_inference.py:66-88; SURVEY §5). Equivalents here:

* :func:`trace` — wall-clock spans that also annotate ``jax.profiler``
  traces (visible in TensorBoard/Perfetto),
* :func:`profile` — capture a device trace for a code region,
* :func:`capture_intermediates` — functional replacement for the stats
  tuples: any flax model in this package exposes its sown intermediates
  without polluting forward signatures,
* :class:`Metrics` — counters/gauges with one-line JSON export,
* :func:`get_logger` — structured logging instead of bare prints.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

import jax

_LOG_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "svc_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_LOG_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


@contextlib.contextmanager
def trace(name: str, logger: Optional[logging.Logger] = None) -> Iterator[None]:
    """Wall-clock span + jax profiler annotation."""
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    elapsed = time.perf_counter() - start
    (logger or get_logger()).debug("%s: %.3fs", name, elapsed)
    Metrics.default().observe(f"span/{name}", elapsed)


@contextlib.contextmanager
def profile(log_dir: str) -> Iterator[None]:
    """Capture a device profile (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def capture_intermediates(model, variables: Dict[str, Any], *args, **kwargs):
    """Run ``model`` capturing every sown intermediate.

    Returns (output, intermediates-dict). This supersedes the reference's
    stats tuples: the same activations (step embeddings, per-layer gated
    outputs, …) are recorded by ``nn.Module.sow`` inside the models and
    materialise only when asked for.
    """
    out, mods = model.apply(
        variables, *args, capture_intermediates=True, mutable=["intermediates"], **kwargs
    )
    return out, mods.get("intermediates", {})


class Metrics:
    """Minimal counters/gauges/observations with JSON export."""

    _default: Optional["Metrics"] = None

    def __init__(self) -> None:
        self.counters: Dict[str, float] = defaultdict(float)
        self.observations: Dict[str, list] = defaultdict(list)

    @classmethod
    def default(cls) -> "Metrics":
        if cls._default is None:
            cls._default = cls()
        return cls._default

    def incr(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def observe(self, name: str, value: float) -> None:
        self.observations[name].append(float(value))

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = dict(self.counters)
        for name, values in self.observations.items():
            if values:
                out[name] = {
                    "count": len(values),
                    "mean": sum(values) / len(values),
                    "max": max(values),
                    "last": values[-1],
                }
        return out

    def to_json(self) -> str:
        return json.dumps(self.summary(), sort_keys=True)

    def reset(self) -> None:
        self.counters.clear()
        self.observations.clear()
