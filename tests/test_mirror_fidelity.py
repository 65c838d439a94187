"""Mirror-fidelity regression tests (VERDICT r05 item 2).

Three rounds in a row (r03 HUGEINT casts, r04 Arrow-off inference,
r05 list columns) shipped driver-red rows because the local mirror's
canonicalizer was MORE tolerant than the driver gate's pandas
``sort_values``-based ``_canon``. These tests pin the mirror to the
driver's behavior: any output shape the driver cannot hash must fail
locally, and every driver-facing query must produce a hashable shape.
"""

from __future__ import annotations

import importlib.util
import sys

import pandas as pd
import pytest


def _mirror():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", "/root/repo/tools/check_correctness.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["check_correctness"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_driver_sort_rejects_list_columns():
    """The exact r05 failure class: array-typed result columns throw
    ``TypeError: unhashable type: 'list'`` inside pandas sort_values
    on the driver. The mirror's canon must raise the same way."""
    m = _mirror()
    pdf = pd.DataFrame({"region": ["a", "b"],
                        "nations": [["x", "y"], ["z"]]})
    with pytest.raises(TypeError):
        m.driver_sort(pdf)


def test_driver_sort_rejects_dict_columns():
    m = _mirror()
    pdf = pd.DataFrame({"k": ["a"], "props": [{"x": 1}]})
    with pytest.raises(TypeError):
        m.driver_sort(pdf)


def test_driver_sort_orders_columns_and_rows():
    m = _mirror()
    pdf = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    cols, rows = m.driver_sort(pdf)
    assert cols == ["a", "b"]
    assert rows == [("x", 1), ("y", 2)]


def test_driver_sort_accepts_nan_floats():
    """NULL floats arrive as NaN through both pandas fetch paths; the
    driver sorts them fine (NaN last) — must not be a mirror FAIL."""
    m = _mirror()
    pdf = pd.DataFrame({"v": [1.5, float("nan"), 0.5]})
    cols, rows = m.driver_sort(pdf)
    assert cols == ["v"]
    assert rows[0] == (0.5,)


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_all_driver_queries_canonicalizable(spark):
    """Every queries() entry the driver will ever window must produce
    an output pandas can sort_values — i.e. no list/map/struct cells
    survive to the driver contract surface. Runs at sf0.001 for
    speed; shape (not values) is what's under test."""
    import __spark_entry__ as entrymod

    m = _mirror()
    sf = "/root/testdata/sf0.001"
    bad = []
    for name, fn in entrymod.queries().items():
        try:
            pdf = fn(spark, sf).limit(5).toPandas()
        except Exception as e:  # runtime failures are other tests' job
            bad.append(f"{name}: run error {type(e).__name__}: {e}")
            continue
        try:
            m.driver_sort(pdf)
        except Exception as e:
            bad.append(f"{name}: driver canon would ERR: "
                       f"{type(e).__name__}: {e}")
    assert not bad, "\n".join(bad)
