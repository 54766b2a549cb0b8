"""Tracing, metrics, and numerics guards.

The reference's observability is ad-hoc (SURVEY.md §5): wall-clock prints
around cuda.synchronize (infer/omgsr_s_infer_model.py:170-183), a dormant
perfcount decorator (infer/vaehook.py:432-454), tqdm loss postfixes, NaN
checks (infer/devices.py:107-122). TPU-native equivalents here:

  * StepTimer — wall-clock with block_until_ready fencing (the TPU analogue
    of cuda.synchronize timing);
  * trace() — jax.profiler trace context producing TensorBoard-loadable
    profiles;
  * MetricLogger / SmoothedValue — windowed metric smoothing (the vendored
    dinov3/logging/helpers.py:19,136 capability);
  * check_finite / guard_nans — NaN/Inf detection on pytrees (devices.py
    test_for_nans parity) and a jax.debug_nans toggle.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque

import jax
import jax.numpy as jnp
import numpy as np


class StepTimer:
    """Wall-clock timing with device fencing.

    with StepTimer() as t: out = step(...)
    t.seconds  # blocks on `out` if you pass it to .stop(out)
    """

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.seconds = None
        return self

    def __exit__(self, *a):
        if self.seconds is None:
            self.seconds = time.perf_counter() - self.t0

    def stop(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.seconds = time.perf_counter() - self.t0
        return self.seconds


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: writes a TensorBoard profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.values = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, v: float, n: int = 1):
        self.values.append(v)
        self.total += v * n
        self.count += n

    @property
    def median(self):
        return float(np.median(self.values)) if self.values else 0.0

    @property
    def avg(self):
        return float(np.mean(self.values)) if self.values else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, window: int = 20, delimiter: str = " | "):
        self.meters = defaultdict(lambda: SmoothedValue(window))
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{k}={m.median:.4f} ({m.global_avg:.4f})" for k, m in self.meters.items()
        )


def check_finite(tree, name: str = "tree") -> list[str]:
    """Return the paths of non-finite leaves (host-side; blocks)."""
    from omgsr_tpu.utils.tree import flatten_dict, tree_path_str

    bad = []
    if isinstance(tree, dict):
        items = flatten_dict(tree).items()
    else:
        items = enumerate(jax.tree.leaves(tree))
    for path, leaf in items:
        if not bool(jnp.isfinite(leaf).all()):
            p = tree_path_str(path) if isinstance(path, tuple) else str(path)
            bad.append(f"{name}.{p}")
    return bad


def guard_nans(enable: bool = True):
    """Toggle jax's trap-on-NaN mode (jax.debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def all_nan(x) -> bool:
    """devices.py test_for_nans parity: True when the tensor is entirely NaN
    (the reference treats all-NaN as the failure signal, :107-122)."""
    return bool(jnp.isnan(x).all())
