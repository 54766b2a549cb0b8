import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.utils.observability import (
    MetricLogger,
    SmoothedValue,
    StepTimer,
    all_nan,
    check_finite,
)


def test_step_timer():
    with StepTimer() as t:
        x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        t.stop(x)
    assert t.seconds > 0


def test_smoothed_value_and_logger():
    sv = SmoothedValue(window=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.median == 3.0
    assert sv.global_avg == 2.5
    ml = MetricLogger()
    ml.update(loss=1.0, lr=0.1)
    ml.update(loss=2.0, lr=0.1)
    s = str(ml)
    assert "loss=" in s and "lr=" in s


def test_check_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert check_finite(good) == []
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    assert check_finite(bad, "params") == ["params.b.c"]


def test_all_nan():
    assert all_nan(jnp.full((4,), np.nan))
    assert not all_nan(jnp.asarray([1.0, np.nan]))
