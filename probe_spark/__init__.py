"""probe_spark — PySpark-native inverted-index + BM25 engine."""

import os as _os

# glibc malloc tunables for the Python UDF workers (numpy uses glibc, not
# the Arrow jemalloc pool that _single_threaded_arrow already tames).  The
# pack phase allocates/frees multi-MB numpy scratch per flush unit; above
# glibc's default 128 KB dynamic mmap threshold every one is a fresh
# mmap + munmap, and munmap broadcasts TLB-shootdown IPIs to every core —
# measured here as 85-90% SYSTEM time across 32 workers during pass B
# (the kernel, not the job, consumed the added cores; 8->32 scaling was
# flat).  Raising the threshold keeps big buffers on the worker's heap
# where freed memory is retained and reused; trim is raised so the heap is
# not returned to the OS between flushes.  Set BEFORE the JVM launches:
# the pyspark daemon execs with this environment, so every forked worker
# inherits a glibc configured this way.  On a real cluster ship the same
# pair via spark.executorEnv.* (bench.py does both).
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

# Two more allocator knobs, same propagation path (worker processes start
# AFTER this module is imported on the driver, so they read these at
# process startup — the driver's own glibc cannot be retuned in-process):
#
# * glibc.malloc.hugetlb=1 → glibc madvise(MADV_HUGEPAGE)s its arenas.
#   THP on this kernel is in `madvise` mode; opting the worker heap in
#   collapses warm-up minor faults ~5x (one 2 MB fault covers 512 pages).
#   On a memory-overcommitted host each guest minor fault costs ~0.4 ms
#   of kernel time under 32-way concurrency, so fault COUNT is the lever.
# * ARROW_DEFAULT_MEMORY_POOL=system → Arrow allocates through glibc
#   malloc instead of its bundled jemalloc, so parquet read/write buffers
#   ride the same retained, hugepage-madvised heap.  Measured together on
#   the 3.3M-turn build at local[32]: pass-B pack-phase minor faults
#   338k → 6.7k, worker system-time 417 s → 176 s, build 57 s → 20 s.
_os.environ.setdefault("GLIBC_TUNABLES", "glibc.malloc.hugetlb=1")
_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
