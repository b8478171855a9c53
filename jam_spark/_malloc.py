"""glibc malloc tuning for numpy-heavy Arrow UDF workers.

Large numpy temporaries (> M_MMAP_THRESHOLD, 128 KiB default) are
allocated with mmap and returned with munmap on free. With 32 worker
processes doing vectorized passes over multi-MB arrays, the mmap/munmap
churn serializes on kernel memory-management locks and wrecks scaling.
Raising the threshold keeps temporaries in the (reused) heap arena.

Called at import from the modules whose UDFs run in workers; idempotent
and a no-op on non-glibc platforms.
"""

from __future__ import annotations

_done = False


def tune_malloc() -> None:
    global _done
    if _done:
        return
    _done = True
    import os

    if os.environ.get("JAM_NO_MALLOPT"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        # 64 MiB: large enough that per-batch numpy temporaries (a few MB)
        # stay in the reusable heap arena, small enough that the arena
        # cannot grow/fragment without bound across a long worker life.
        libc.mallopt(ctypes.c_int(M_MMAP_THRESHOLD), ctypes.c_int(64 << 20))
    except Exception:
        pass
