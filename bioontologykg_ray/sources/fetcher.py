"""Rate-limited enrichment fetch stages (SURVEY S9-S11) — the Ray-Data
shape of the reference's REST readers, with the live network behind an
injectable transport.

Reference precedent:
* per-id fetch+parse loop with rate-limit sleeps and log-and-continue
  failure handling —
  ``src/BioOntologyKG/importers/pubmed/neo4j_pubmed_batch_processor.py:36-94,492-499``
  (0.34 s/request NCBI ceiling);
* failed fetches recorded to a dead-letter log, never raised —
  ``src/CancerPublicationsKG/import/neo4j_cancerkg_builder.py:299-321``;
* cursorMark paging capped at ``max_results`` —
  ``neo4j_cancerkg_builder.py:563-609``.

The sandbox is sealed (no network), so the TRANSPORT is a constructor
argument: production would pass an HTTP client factory; tests pass a
deterministic fake. Everything else — the actor-pool stage, per-actor
token-bucket rate limiting, bounded retries with backoff, dead-letter
routing, the capped cursor loop — is the real engine surface.

100-TB shape: ``map_batches(FetchStage, concurrency=N)`` gives N
concurrent clients; the per-actor rate is ``rate_per_s / N`` so the
POOL honors the service ceiling (the reference's single process never
had to share its budget). I/O-bound stages want high ``concurrency``
with ``num_cpus`` well below 1.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np
import pandas as pd


class TransientFetchError(Exception):
    """Retryable failure (HTTP 5xx / timeout analogue)."""


class PermanentFetchError(Exception):
    """Non-retryable failure (HTTP 4xx / malformed-record analogue)."""


class _TokenBucket:
    """Minimal token bucket: ``acquire`` blocks until a slot is free.
    Monotonic clock; one bucket per actor (pool budget = rate/actor)."""

    def __init__(self, rate_per_s: float,
                 clock: Callable[[], float] = time.monotonic):
        self.min_interval = 1.0 / rate_per_s if rate_per_s > 0 else 0.0
        self.clock = clock
        self._next = 0.0

    def acquire(self, sleep: Callable[[float], None] = time.sleep) -> None:
        if self.min_interval <= 0:
            return
        now = self.clock()
        if now < self._next:
            sleep(self._next - now)
            now = self._next
        self._next = now + self.min_interval


class FetchStage:
    """Callable class for ``map_batches(FetchStage(...), concurrency=N)``:
    per-id fetch with rate limiting, bounded retries and dead-letter
    routing. The transport is built ONCE per actor (``__init__``), like
    every stateful stage in this engine.

    Output schema: the input id column + ``payload`` (string, null on
    failure) + ``ok`` (bool) + ``reason`` (string, '' on success) —
    callers split the dead letters with one filter (K5 semantics: a
    failed record is data, not a task failure)."""

    def __init__(
        self,
        transport_factory: Callable[[], Any],
        *,
        id_col: str = "id",
        rate_per_s: float = 3.0,
        pool_size: int = 1,  # MUST equal the map_batches concurrency:
        # rate_per_s is the SERVICE ceiling; each actor paces at
        # rate_per_s/pool_size, so pool_size=1 with concurrency=N would
        # hit the service at N x the ceiling
        max_retries: int = 2,
        backoff_s: float = 0.05,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.transport = transport_factory()
        self.id_col = id_col
        self.bucket = _TokenBucket(rate_per_s / max(pool_size, 1))
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.sleep = sleep

    def _fetch_one(self, key: Any) -> tuple[str | None, str]:
        delay = self.backoff_s
        for attempt in range(self.max_retries + 1):
            self.bucket.acquire(self.sleep)
            try:
                return str(self.transport.fetch(key)), ""
            except PermanentFetchError as e:
                return None, f"permanent: {e}"
            except Exception as e:  # noqa: BLE001 — contract: a failed
                # record is DATA (dead-letter row), never a task failure;
                # unknown transport exceptions (socket timeouts, client
                # bugs) get the transient retry policy, then dead-letter
                if attempt == self.max_retries:
                    kind = (
                        "transient_exhausted"
                        if isinstance(e, TransientFetchError)
                        else f"error({type(e).__name__})"
                    )
                    return None, f"{kind}: {e}"
                self.sleep(delay)
                delay *= 2
        return None, "unreachable"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        payloads, oks, reasons = [], [], []
        for key in df[self.id_col]:
            payload, reason = self._fetch_one(key)
            payloads.append(payload)
            oks.append(payload is not None)
            reasons.append(reason)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col].to_numpy(),
                "payload": pd.array(payloads, dtype="string"),
                "ok": np.asarray(oks, dtype=bool),
                "reason": pd.array(reasons, dtype="string"),
            }
        )


def cursor_paged_ids(
    transport: Any,
    query: str,
    *,
    max_results: int = 2000,
    max_pages: int = 1000,
) -> list[Any]:
    """S10 cursor paging: accumulate ids from ``transport.page(query,
    cursor) -> (ids, next_cursor)`` until the cursor stops advancing or
    ``max_results`` is reached (the reference caps citing-paper fan-out
    at 200-2000). Driver-side by design — the page stream is sequential
    by contract (each cursor comes from the previous response); the
    RESULT list then fans out to the distributed fetch/enrich stages."""
    out: list[Any] = []
    seen = set()
    cursor = None
    for _ in range(max_pages):
        ids, nxt = transport.page(query, cursor)
        for i in ids:
            if i not in seen:
                seen.add(i)
                out.append(i)
                if len(out) >= max_results:
                    return out
        if nxt is None or nxt == cursor:
            break
        cursor = nxt
    return out


class FakeTransport:
    """Deterministic stand-in for the sealed sandbox: payload is derived
    from the id; ids ≡ 0 (mod transient_mod) fail transiently on their
    first attempt (then succeed); ids ≡ 0 (mod permanent_mod) always
    fail. Paging yields fixed-size pages of sequential ids."""

    def __init__(self, transient_mod: int = 7, permanent_mod: int = 101,
                 page_size: int = 50, total: int = 220):
        self.transient_mod = transient_mod
        self.permanent_mod = permanent_mod
        self.page_size = page_size
        self.total = total
        self.attempts: dict[Any, int] = {}
        self.calls = 0

    def fetch(self, key):
        self.calls += 1
        k = int(key)
        self.attempts[k] = self.attempts.get(k, 0) + 1
        if k % self.permanent_mod == 0:
            raise PermanentFetchError(f"gone: {k}")
        if k % self.transient_mod == 0 and self.attempts[k] == 1:
            raise TransientFetchError(f"flaky: {k}")
        return f"payload-{k}"

    def page(self, query, cursor):
        start = 0 if cursor is None else int(cursor)
        if start >= self.total:
            return [], None
        end = min(start + self.page_size, self.total)
        return list(range(start, end)), str(end)


def fetch_stage(
    ds: "ray.data.Dataset",
    transport_factory: Callable[[], Any],
    *,
    rate_per_s: float = 3.0,
    concurrency: int = 4,
    batch_size: int = 256,
    **kwargs,
) -> "ray.data.Dataset":
    """The safe constructor: ties ``pool_size`` to the ACTUAL actor-pool
    concurrency so the pool's aggregate request rate equals
    ``rate_per_s`` (constructing FetchStage manually with the default
    pool_size=1 under concurrency=N would hit the service at N x the
    ceiling)."""
    import ray.data  # noqa: F401

    return ds.map_batches(
        FetchStage,
        fn_constructor_kwargs={
            "transport_factory": transport_factory,
            "rate_per_s": rate_per_s,
            "pool_size": concurrency,
            **kwargs,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
