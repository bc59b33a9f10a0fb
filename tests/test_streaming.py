"""Streaming monitor tests: file-source stream drained with
trigger(availableNow) into a memory sink."""

from __future__ import annotations

import json

from searchgov_spider_spark.streaming.monitor import (
    domain_rate_monitor,
    no_item_monitor,
    read_fetch_log_stream,
    run_to_memory,
    status_code_monitor,
)


def _write_fetch_log(tmp_path, rows):
    p = tmp_path / "fetchlog"
    p.mkdir()
    with (p / "part-0.json").open("w") as f:
        for ts, url, domain, status, emitted in rows:
            f.write(
                json.dumps(
                    {"ts": ts, "url": url, "domain": domain, "http_status": status,
                     "emitted": emitted, "wave": 0}
                )
                + "\n"
            )
    return str(p)


def test_status_and_rate_monitors(spark, tmp_path):
    rows = (
        [(f"2024-01-01T00:00:{i:02d}", f"https://a.gov/{i}", "a.gov", 200, True) for i in range(30)]
        + [(f"2024-01-01T00:01:{i:02d}", f"https://b.gov/{i}", "b.gov", 429, False) for i in range(55)]
    )
    path = _write_fetch_log(tmp_path, rows)
    stream = read_fetch_log_stream(spark, path)

    run_to_memory(status_code_monitor(stream, window="10 minutes"), "codes")
    codes = {r["http_status"]: r for r in spark.sql("SELECT * FROM codes").collect()}
    assert codes[200]["n"] == 30 and not codes[200]["breach"]
    assert codes[429]["n"] == 55 and codes[429]["breach"]  # > 50 unwanted

    run_to_memory(domain_rate_monitor(stream, max_per_minute=40), "rates")
    rates = {(r["domain"], str(r["window_start"])): r for r in spark.sql("SELECT * FROM rates").collect()}
    assert any(r["over_budget"] for r in rates.values()) is True
    a_rows = [r for r in rates.values() if r["domain"] == "a.gov"]
    assert all(not r["over_budget"] for r in a_rows)  # 30/min <= 40


def test_streaming_seen_dedup(spark, tmp_path):
    """Stateful D1: first-ever occurrence wins across micro-batches;
    within a batch the (ts, url_hash) minimum wins."""
    import os

    from searchgov_spider_spark.streaming.dedup import (
        DISCOVERED_SCHEMA,
        streaming_seen_dedup,
    )

    p = tmp_path / "disc"
    p.mkdir()

    def row(ts, h):
        return {"ts": ts, "url_hash": h, "url": f"https://a.gov/{h}", "domain": "a.gov", "wave": 0}

    batches = [
        # batch 1: in-batch dup of hash 1 (earliest ts must win), plus hash 2
        [row("2024-01-01T00:00:05", 1), row("2024-01-01T00:00:01", 1), row("2024-01-01T00:00:09", 2)],
        # batch 2: hash 2 again with an EARLIER ts (batch-1 winner must
        # stand — arrival order is the streaming contract), plus hash 3
        [row("2024-01-01T00:00:00", 2), row("2024-01-01T00:00:30", 3)],
    ]
    for i, rows in enumerate(batches):
        f = p / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(DISCOVERED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(p))
    )
    run_to_memory(streaming_seen_dedup(stream, n_buckets=4), "stream_dedup_t")
    out = {r["url_hash"]: r for r in spark.sql("SELECT * FROM stream_dedup_t").collect()}
    assert sorted(out) == [1, 2, 3]
    assert str(out[1]["ts"]) == "2024-01-01 00:00:01"  # in-batch min ts
    assert str(out[2]["ts"]) == "2024-01-01 00:00:09"  # batch-1 arrival won
    assert str(out[3]["ts"]) == "2024-01-01 00:00:30"


def test_no_item_monitor(spark, tmp_path):
    rows = [
        ("2024-01-01T00:00:05", "https://a.gov/1", "a.gov", 200, False),
        ("2024-01-01T00:10:05", "https://a.gov/2", "a.gov", 500, False),
        ("2024-01-01T01:00:05", "https://a.gov/3", "a.gov", 200, True),
    ]
    path = _write_fetch_log(tmp_path, rows)
    stream = read_fetch_log_stream(spark, path)
    run_to_memory(no_item_monitor(stream, window="30 minutes"), "noitem")
    wins = {str(r["window_start"]): r for r in spark.sql("SELECT * FROM noitem").collect()}
    alarm = [r for r in wins.values() if r["no_item_alarm"]]
    ok = [r for r in wins.values() if not r["no_item_alarm"]]
    assert len(alarm) == 1 and alarm[0]["fetches"] == 2
    assert len(ok) == 1 and ok[0]["emitted"] == 1


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """The same sessionize() aggregation, streamed with availableNow +
    complete mode, must reproduce the batch result exactly."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F  # noqa: F401

    from searchgov_spider_spark.pipelines.events import sessionize
    from searchgov_spider_spark.streaming.monitor import run_to_memory

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for uid in range(5):
        for burst in range(3):
            t0 = base + timedelta(hours=burst * 2, minutes=uid)
            for k in range(4):
                rows.append((eid, t0 + timedelta(minutes=5 * k), uid, "view", 1.0, "{}"))
                eid += 1
    sch = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, sch)
    path = str(tmp_path / "ev")
    df.write.parquet(path)

    batch = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize(df).collect()
    }
    stream = spark.readStream.schema(sch).parquet(path)
    run_to_memory(sessionize(stream.withWatermark("ts", "0 seconds")), "t_sess")
    got = {
        (r["user_id"], r["session_start"]): r
        for r in spark.table("t_sess").collect()
    }
    assert len(batch) == 15  # 5 users x 3 well-separated bursts
    assert got.keys() == batch.keys()
    for k in batch:
        assert got[k]["n_events"] == batch[k]["n_events"]
        assert got[k]["session_end"] == batch[k]["session_end"]
        assert got[k]["total_value"] == batch[k]["total_value"]


def test_windowed_circuit_breaker_trips_on_5xx_rate(spark, tmp_path):
    from searchgov_spider_spark.streaming.monitor import windowed_circuit_breaker

    rows = (
        # bad.gov: 12 fetches, 6 of them 503 -> 50% >= 30% and >= 10 fetches
        [(f"2024-01-01T00:00:{i:02d}", f"https://bad.gov/{i}", "bad.gov",
          503 if i % 2 == 0 else 200, True) for i in range(12)]
        # ok.gov: 12 fetches, one 500 -> 8.3% < 30%
        + [(f"2024-01-01T00:00:{i:02d}", f"https://ok.gov/{i}", "ok.gov",
            500 if i == 0 else 200, True) for i in range(12)]
        # thin.gov: 2 fetches 100% 5xx but < min_fetches -> not suspended
        + [(f"2024-01-01T00:00:{i:02d}", f"https://thin.gov/{i}", "thin.gov", 502, False)
           for i in range(2)]
    )
    path = _write_fetch_log(tmp_path, rows)
    stream = read_fetch_log_stream(spark, path)
    run_to_memory(windowed_circuit_breaker(stream, window="10 minutes"), "breaker")
    got = {r["domain"]: r for r in spark.sql("SELECT * FROM breaker").collect()}
    assert got["bad.gov"].suspended and got["bad.gov"].err_ppm == 500_000
    assert not got["ok.gov"].suspended
    assert not got["thin.gov"].suspended and got["thin.gov"].err_ppm == 1_000_000


def test_streaming_budget_gate(spark, tmp_path):
    """Stateful P2: the per-domain budget counter persists across
    micro-batches — a domain that used k slots in batch 1 gets only
    budget-k in batch 2; fetch_rank is cumulative; within a batch the
    ts order picks the winners."""
    import os

    from searchgov_spider_spark.streaming.budget import streaming_budget_gate
    from searchgov_spider_spark.streaming.dedup import DISCOVERED_SCHEMA

    p = tmp_path / "disc_budget"
    p.mkdir()

    def row(ts, h, dom):
        return {"ts": ts, "url_hash": h, "url": f"https://{dom}/{h}", "domain": dom, "wave": 0}

    batches = [
        # batch 1: a.gov has 3 candidates for budget 4 -> all pass, ranks
        # follow ts order (hash 11 has the earliest ts -> rank 1)
        [row("2024-01-01T00:00:05", 10, "a.gov"), row("2024-01-01T00:00:01", 11, "a.gov"),
         row("2024-01-01T00:00:09", 12, "a.gov"), row("2024-01-01T00:00:02", 20, "b.gov")],
        # batch 2: a.gov has 3 more but only 1 slot left; earliest ts wins it
        [row("2024-01-01T00:01:00", 13, "a.gov"), row("2024-01-01T00:00:59", 14, "a.gov"),
         row("2024-01-01T00:01:01", 15, "a.gov"), row("2024-01-01T00:01:02", 21, "b.gov")],
    ]
    for i, rows in enumerate(batches):
        f = p / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(DISCOVERED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(p))
    )
    run_to_memory(streaming_budget_gate(stream, budget=4, order_cols=("ts",)), "stream_budget_t")
    out = spark.sql("SELECT * FROM stream_budget_t").collect()
    a = sorted([r for r in out if r["domain"] == "a.gov"], key=lambda r: r["fetch_rank"])
    b = sorted([r for r in out if r["domain"] == "b.gov"], key=lambda r: r["fetch_rank"])
    assert [r["url_hash"] for r in a] == [11, 10, 12, 14]  # ts order; 14 wins the last slot
    assert [r["fetch_rank"] for r in a] == [1, 2, 3, 4]  # cumulative across batches
    assert [r["url_hash"] for r in b] == [20, 21] and [r["fetch_rank"] for r in b] == [1, 2]


def test_streaming_budget_ttl_refills(spark, tmp_path):
    """The TTL arm for real: under a short processing-time trigger the
    idle-domain timeout fires between micro-batches, clears the budget
    counter, and the domain's budget refills — late arrivals emit with
    fetch_rank restarting at 1. Dropping the TTL arm leaves the counter
    exhausted and this test times out waiting for phase 2."""
    import time

    from searchgov_spider_spark.streaming.budget import streaming_budget_gate
    from searchgov_spider_spark.streaming.dedup import DISCOVERED_SCHEMA

    p = tmp_path / "disc_ttl"
    p.mkdir()

    def row(ts, h, dom):
        return {"ts": ts, "url_hash": h, "url": f"https://{dom}/{h}", "domain": dom, "wave": 0}

    (p / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                row("2024-01-01T00:00:01", 1, "a.gov"),
                row("2024-01-01T00:00:02", 2, "a.gov"),
                row("2024-01-01T00:00:03", 3, "a.gov"),  # over budget, dropped
            ]
        )
        + "\n"
    )
    stream = (
        spark.readStream.schema(DISCOVERED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(p))
    )
    gated = streaming_budget_gate(
        stream, budget=2, order_cols=("ts",), state_ttl_ms=1000
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("ttl_budget_t")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ttl_ck"))
        .start()
    )
    try:
        def rows():
            return spark.sql(
                "SELECT url_hash, fetch_rank FROM ttl_budget_t ORDER BY url_hash"
            ).collect()

        deadline = time.time() + 60
        while time.time() < deadline and len(rows()) < 2:
            time.sleep(0.3)
        got1 = [(r["url_hash"], r["fetch_rank"]) for r in rows()]
        assert got1 == [(1, 1), (2, 2)], got1  # budget 2 of 3 spent

        # idle past the 1 s TTL so the processing-time timeout fires and
        # removes the counter state
        time.sleep(4)
        (p / "b1.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    row("2024-01-01T00:02:01", 4, "a.gov"),
                    row("2024-01-01T00:02:02", 5, "a.gov"),
                ]
            )
            + "\n"
        )
        deadline = time.time() + 60
        while time.time() < deadline and len(rows()) < 4:
            time.sleep(0.3)
        got2 = [(r["url_hash"], r["fetch_rank"]) for r in rows()]
        # refilled: the late arrivals rank 1..2 again, not 3..4 / nothing
        assert got2 == [(1, 1), (2, 2), (4, 1), (5, 2)], got2
        assert q.exception() is None
    finally:
        q.stop()
