"""bench.py's whole-run budget scheduler: when the summed cost estimate of
the remaining sections exceeds the remaining budget, the lowest-priority
sections are dropped up front (never priority-0 fallback primaries) so the
run finishes rc=0 inside the driver window instead of dying mid-section
(round-3 lesson: rc=124 erased half the extras from the durable record)."""

import importlib


def _fresh_bench():
    import bench

    bench = importlib.reload(bench)
    bench._PLAN.clear()
    return bench


def test_drops_lowest_priority_first():
    bench = _fresh_bench()
    bench._plan_add("primary_fallback", 0, 100)
    bench._plan_add("nice_to_have", 4, 10_000_000)
    bench._plan_add("must_record", 2, 100)
    assert bench._budget_gate("primary_fallback")  # triggers the drop
    names = [e[0] for e in bench._PLAN]
    assert "nice_to_have" not in names
    assert "must_record" in names and "primary_fallback" in names


def test_gate_false_when_self_dropped():
    bench = _fresh_bench()
    bench._plan_add("keep", 1, 10)
    bench._plan_add("huge_optin", 5, 10_000_000)
    assert not bench._budget_gate("huge_optin")
    assert bench._budget_gate("keep")


def test_priority_zero_never_dropped():
    bench = _fresh_bench()
    bench._plan_add("fallback", 0, 10_000_000)  # over budget on its own
    assert bench._budget_gate("fallback")  # run it anyway, accept the risk


def test_disabled_sections_not_planned():
    bench = _fresh_bench()
    bench._plan_add("off", 2, 10, enabled=False)
    assert not bench._budget_gate("off")


def test_ties_drop_latest_scheduled():
    bench = _fresh_bench()
    bench._plan_add("early", 3, 10_000_000)
    bench._plan_add("late", 3, 10_000_000)
    bench._budget_gate("early")
    names = [e[0] for e in bench._PLAN]
    assert names == ["early"] or names == []  # "late" goes first


def test_done_removes_from_plan():
    bench = _fresh_bench()
    bench._plan_add("x", 2, 10)
    bench._plan_done("x")
    assert not bench._budget_gate("x")
