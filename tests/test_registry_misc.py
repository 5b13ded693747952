"""Registry invariants: the graded window's structural guards."""

from __future__ import annotations

def test_graded_window_requires_oracles():
    """The r11 guard: a graded-window name WITHOUT an oracle must trip
    the _ordered() assert (negative control — r9's defect was exactly
    a rows-only query slipping into the graded slots)."""
    import pytest as _pytest

    from data_lakehouse_project_spark import registry as R_

    name = R_.GRADED_WINDOW[0]
    fn, sql = R_.REGISTRY[name]
    try:
        R_.REGISTRY[name] = (fn, None)
        with _pytest.raises(AssertionError, match="without an oracle"):
            R_._ordered()
    finally:
        R_.REGISTRY[name] = (fn, sql)
    assert len(R_._ordered()) == len(R_.REGISTRY)
