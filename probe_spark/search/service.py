"""Micro-batching query service: the throughput-serving layer over
SearchEngine.

A query SERVICE at cluster scale does what every high-throughput serving
system does (Elasticsearch ``_msearch``, inference-server continuous
batching): coalesce the requests in flight into one shared job instead
of paying per-request driver/scheduler cost N times.  This engine
already has the batched execution primitive — ``SearchEngine.
search_batch`` runs MANY queries over ONE postings fetch + ONE doc-range
exchange, per-query rank/score-identical to ``search()`` — so the
service is a thin dispatcher:

  * callers submit ``(query, k)`` and get a Future;
  * a dispatcher thread drains everything currently queued (up to
    ``max_batch``) and executes it as one ``search_batch`` job;
  * results come back as plain dict lists, split per caller.

Per-request latency gains the dispatch wait (bounded by the current
job's wall time — there is no timer; a new batch launches as soon as
the previous one finishes, so an idle service dispatches immediately);
aggregate throughput gains the amortization: the per-query serial floor
(plan construction, py4j round trips, scheduler) is paid once per BATCH.
That serial floor is exactly what caps per-request-mode scaling at high
concurrency (measured: 2->8 cores raw 0.63 per-request vs 0.92 for the
batched primitive at 26.4M turns).

Correctness: ``search_batch`` itself falls back to ``search()`` for
shapes the shared job can't take (zero-included, repair-affecting
specials) and unions them in, so the service never narrows semantics;
parity with individual ``search()`` calls is pinned by
tests/test_service.py.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor

from probe_spark.search.engine import SearchEngine


class QueryService:
    """Thread-safe micro-batching front end over one SearchEngine.

    Usage::

        svc = QueryService(engine)
        fut = svc.submit("error AND handling", k=10)
        rows = fut.result()          # list[dict], search()-shaped
        svc.close()

    ``submit`` never blocks; ``result()`` blocks until the request's
    batch completes.  Each request resolves to a list of plain dicts with
    the same columns as ``engine.search(q, k)`` rows, ordered (score
    desc, doc_id asc) — value-identical to a direct ``search()`` call.
    """

    def __init__(
        self,
        engine: SearchEngine,
        max_batch: int = 64,
        with_metadata: bool = True,
        local_route: bool = True,
        local_workers: "int | None" = None,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.with_metadata = with_metadata
        # driver-local replica tier (round 5, VERDICT r4 #3): when the
        # index is POSIX-visible and reference-scale
        # (replicas.LOCAL_ROUTE_NDOCS_CAP), requests are served by a pool
        # of forked LocalSearcher replicas — zero Spark jobs, so the
        # scheduler-queueing wall that capped per-request scaling (flat
        # per-query core-seconds, 2.7->5.0s wall under concurrency)
        # disappears and throughput scales with replica count.  Past the
        # cap (the 10^12-turn deployment) every request keeps the
        # micro-batched Spark path below.  Replicas snapshot index state
        # at first use: after maintenance ops, recreate the service (the
        # Spark path picks changes up via engine.refresh()).
        self._replicas = None
        if local_route:
            from probe_spark.search import replicas  # noqa: PLC0415

            base = engine.index_path.removeprefix("file://")
            import os  # noqa: PLC0415

            if (
                os.path.isdir(os.path.join(base, "docs"))
                and engine.n_docs <= replicas.LOCAL_ROUTE_NDOCS_CAP
            ):
                try:
                    self._replicas = replicas.LocalReplicaPool(
                        base,
                        local_workers
                        or engine.spark.sparkContext.defaultParallelism,
                    )
                except OSError:  # pragma: no cover - no fork
                    self._replicas = None
        self._lock = threading.Condition()
        self._queue: list[tuple[str, int, Future]] = []
        self._closed = False
        # non-batchable shapes (zero-included, repair specials — engine.
        # batchable()) would SERIALIZE inside search_batch's per-query
        # fallback loop; they run here as concurrent individual jobs
        # instead, alongside the batched job
        self._pool = ThreadPoolExecutor(
            max_workers=16, thread_name_prefix="query-service-single"
        )
        self._worker = threading.Thread(
            target=self._run, name="query-service-dispatch", daemon=True
        )
        self._worker.start()

    def submit(self, query: str, k: int = 10) -> "Future":
        """Enqueue a query; returns a Future resolving to its row list."""
        if self._replicas is not None:
            if self._closed:
                raise RuntimeError("QueryService is closed")
            return self._replicas.submit(
                query, int(k), with_metadata=self.with_metadata
            )
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("QueryService is closed")
            self._queue.append((query, int(k), fut))
            self._lock.notify()
        return fut

    def search(self, query: str, k: int = 10):
        """Blocking convenience: submit + wait."""
        return self.submit(query, k).result()

    def close(self) -> None:
        if self._replicas is not None:
            self._replicas.close()
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._worker.join(timeout=60)
        with self._lock:
            pending = self._queue
            self._queue = []
        for _q, _k, fut in pending:
            fut.cancel()
        self._pool.shutdown(wait=True)

    # -- dispatcher --------------------------------------------------------
    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._queue and not self._closed:
                    self._lock.wait()
                if self._closed and not self._queue:
                    return
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
            self._execute(batch)

    def _run_single(self, q: str, k: int, fut: "Future") -> None:
        try:
            rows = [
                r.asDict()
                for r in self.engine.search(
                    q, k=k, with_metadata=self.with_metadata
                ).collect()
            ]
        except Exception as e:
            if not fut.cancelled():
                fut.set_exception(e)
            return
        if not fut.cancelled():
            fut.set_result(rows)

    def _execute(self, batch: "list[tuple[str, int, Future]]") -> None:
        # split: shapes search_batch would fall back on run as concurrent
        # individual jobs (Spark schedules their stages alongside the
        # batched job); the rest share ONE search_batch job
        shared: list[tuple[str, int, Future]] = []
        for q, k, fut in batch:
            if self.engine.batchable(q):
                shared.append((q, k, fut))
            else:
                self._pool.submit(self._run_single, q, k, fut)
        if not shared:
            return
        if len(shared) == 1:
            # no co-batched work: the point query path has the better
            # latency (no per-(query,range) window merge)
            q, k, fut = shared[0]
            self._run_single(q, k, fut)
            return
        queries = [q for q, _k, _f in shared]
        ks = [k for _q, k, _f in shared]
        try:
            res = self.engine.search_batch(
                queries,
                k=ks,
                with_metadata=self.with_metadata,
            ).collect()
        except Exception as e:  # resolve every waiter, never hang
            for _q, _k, fut in shared:
                if not fut.cancelled():
                    fut.set_exception(e)
            return
        by_idx: dict[int, list] = {i: [] for i in range(len(shared))}
        for r in res:
            d = r.asDict()
            i = int(d.pop("query_idx"))
            d.pop("query", None)
            by_idx[i].append(d)
        for i, (_q, _k, fut) in enumerate(shared):
            if not fut.cancelled():
                fut.set_result(by_idx[i])
