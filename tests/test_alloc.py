"""Memory-residency tuning (_alloc.py, optimization r11): the knobs
must apply without error and the warm must touch exactly the asked-for
pages — on this host class a page given back to the guest kernel is
discarded host-side and refaults at 7-11 MB/s under pressure, so the
library's posture is acquire-once-retain-forever (see _alloc.py)."""

import os

from incubator_hugegraph_spark import _alloc


def test_tune_allocator_is_idempotent_and_safe():
    _alloc.tune_allocator()
    _alloc.tune_allocator()  # second call must not raise


def test_warm_allocator_touches_requested_bytes():
    got = _alloc.warm_allocator(8 * 1024 * 1024)
    assert got == 8 * 1024 * 1024


def test_warm_allocator_env_disable(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WARM_ALLOC", "0")
    assert _alloc.warm_allocator() == 0


def test_env_bytes_caps_at_int_max(monkeypatch):
    # mallopt takes a C int: larger env values must clamp, not wrap
    monkeypatch.setenv("X_TEST_BYTES", str(1 << 40))
    assert _alloc._env_bytes("X_TEST_BYTES", 0) == (1 << 31) - 1
    monkeypatch.setenv("X_TEST_BYTES", "not-a-number")
    assert _alloc._env_bytes("X_TEST_BYTES", 7) == 7


def test_warm_jvm_heap_touches_and_disables(spark, monkeypatch):
    assert _alloc.warm_jvm_heap(spark, 32 * 1024 * 1024) \
        == 32 * 1024 * 1024
    monkeypatch.setenv("SPARK_GRAFT_WARM_JVM", "0")
    assert _alloc.warm_jvm_heap(spark) == 0


def test_session_defaults_keep_committed_heap():
    from incubator_hugegraph_spark import session
    assert "MaxHeapFreeRatio=100" in session.DEFAULT_DRIVER_JAVA_OPTS
    # the Arrow pool routing is set at import time unless overridden
    assert os.environ.get("ARROW_DEFAULT_MEMORY_POOL")
