"""Property-based tests (hypothesis) for the pure-Python kernels that
oracle parity leans on — no SparkSession needed, so these run in
milliseconds and catch constant-regression bugs early."""

from __future__ import annotations

from hypothesis import given, strategies as st

from incubator_hugegraph_spark.data.dedup import _COEFFS, _P, _det_coeffs
from incubator_hugegraph_spark.data.similarity import plane_component
from incubator_hugegraph_spark.functions.ids import splice_id


@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=4096))
def test_plane_component_bounds_and_determinism(p, j):
    x = plane_component(p, j)
    assert -1.0 <= x < 1.0
    assert x == plane_component(p, j)  # pure function of (p, j)


def test_minhash_coeffs_in_field():
    assert len(_COEFFS) == 64
    for a, b in _COEFFS:
        assert 1 <= a < _P
        assert 0 <= b < _P
    # deterministic: regeneration yields the identical constants the
    # DuckDB oracles embed as literals
    assert _det_coeffs(64) == _COEFFS


@given(st.text(min_size=0, max_size=50),
       st.text(min_size=0, max_size=50))
def test_splice_id_injective_on_values(v1, v2):
    """Escaping must keep splicing injective: different value tuples
    never collide into the same id."""
    if v1 != v2:
        assert splice_id("l", v1) != splice_id("l", v2)
    assert splice_id("l", v1, v2) != splice_id("l", v1 + "!" + v2)
