"""S9-S11 fetch plumbing: rate-limited actor-pool fetch stage with
retries, dead letters, and capped cursor paging (fake transport —
sandbox is sealed; the engine surface is real)."""

import pandas as pd
import ray.data

from bioontologykg_ray.sources.fetcher import (
    FakeTransport,
    FetchStage,
    _TokenBucket,
    cursor_paged_ids,
)


def _no_sleep(_):  # driver-local tests never wall-clock-sleep
    pass


def test_fetch_stage_retries_and_dead_letters():
    # NOTE: constructor kwargs must be importable from workers — no
    # test-module function refs (cloudpickle serializes those by
    # reference and Ray workers cannot import the test module).
    ds = ray.data.from_items([{"id": i} for i in range(1, 250)])
    out = ds.map_batches(
        FetchStage,
        fn_constructor_kwargs=dict(
            transport_factory=FakeTransport,
            rate_per_s=0.0,      # no throttling
            backoff_s=0.001,     # real sleeps, microscopic
        ),
        batch_format="pandas",
        concurrency=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)

    assert len(out) == 249
    dead = out[~out["ok"]]
    # permanent failures (101, 202) dead-letter with reason
    assert set(dead["id"]) == {101, 202}
    assert all(r.startswith("permanent") for r in dead["reason"])
    # transient failures (multiples of 7) recovered via retry
    ok = out[out["ok"]]
    assert {i for i in ok["id"] if i % 7 == 0}
    assert (ok["payload"] == "payload-" + ok["id"].astype(str)).all()
    assert (ok["reason"] == "").all()


def test_fetch_stage_transient_exhaustion():
    class AlwaysFlaky(FakeTransport):
        def fetch(self, key):
            self.calls += 1
            from bioontologykg_ray.sources.fetcher import TransientFetchError
            raise TransientFetchError("down")

    t = {}

    def factory():
        t["x"] = AlwaysFlaky()
        return t["x"]

    stage = FetchStage(
        factory, rate_per_s=0.0, max_retries=3, sleep=_no_sleep)
    out = stage(pd.DataFrame({"id": [5]}))
    assert not out["ok"].iloc[0]
    assert out["reason"].iloc[0].startswith("transient_exhausted")
    assert t["x"].calls == 4  # 1 + 3 retries


def test_token_bucket_spacing():
    t = [100.0]
    waits = []

    def fake_sleep(d):
        waits.append(d)
        t[0] += d

    bucket = _TokenBucket(rate_per_s=100.0, clock=lambda: t[0])  # 10 ms
    for _ in range(3):
        bucket.acquire(sleep=fake_sleep)
    # first acquire free; later ones wait exactly the 10 ms interval
    assert len(waits) == 2
    assert all(abs(w - 0.01) < 1e-9 for w in waits)


def test_cursor_paging_caps_and_terminates():
    t = FakeTransport(page_size=50, total=220)
    ids = cursor_paged_ids(t, "q", max_results=2000)
    assert ids == list(range(220))  # exhausts, stops on short page
    t2 = FakeTransport(page_size=50, total=220)
    capped = cursor_paged_ids(t2, "q", max_results=120)
    assert len(capped) == 120 and capped == list(range(120))


def test_pool_size_divides_rate_budget():
    s = FetchStage(
        FakeTransport, rate_per_s=4.0, pool_size=4, sleep=_no_sleep)
    assert abs(s.bucket.min_interval - 1.0) < 1e-9  # 1 req/s per actor


def test_fetch_stage_ties_pool_rate_to_concurrency():
    """The stage helper must divide the service ceiling across the
    ACTUAL actor pool, and unknown transport exceptions must dead-letter
    (never kill the task)."""
    import ray.data as rd

    from bioontologykg_ray.sources.fetcher import FetchStage, fetch_stage

    class WeirdTransport:
        def fetch(self, key):
            if str(key) == "boom":
                raise RuntimeError("unexpected client bug")
            return f"payload-{key}"

    ds = rd.from_items([{"id": "a"}, {"id": "boom"}, {"id": "b"}])
    out = (
        fetch_stage(ds, WeirdTransport, rate_per_s=1000.0, concurrency=2,
                    max_retries=1, backoff_s=0.0)
        .to_pandas().set_index("id")
    )
    assert bool(out.loc["a", "ok"]) and bool(out.loc["b", "ok"])
    assert not bool(out.loc["boom", "ok"])
    assert "error(RuntimeError)" in out.loc["boom", "reason"]

    # per-actor pacing = ceiling / pool
    s = FetchStage(WeirdTransport, rate_per_s=8.0, pool_size=4)
    assert s.bucket.min_interval == 0.5
