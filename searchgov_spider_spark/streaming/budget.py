"""Streaming per-domain politeness budget — P2 as a continuous stateful
operator.

The batch engine enforces the per-domain fetch budget with the salted
two-phase top-k (operators/politeness.py:schedule_wave). In streaming
form the budget counter IS the operator state: discovered URLs arrive as
an unbounded stream and each domain may emit at most ``budget`` URLs per
state lifetime — the streaming analog of the reference's per-domain
1 req/s throttle + wave cap (settings.py DOWNLOAD_DELAY +
scrapy_scheduler slot model) for a fetch tier consuming the frontier as
a stream.

Implementation: ``applyInPandasWithState`` keyed directly on ``domain``.
Unlike the seen-set (streaming/dedup.py), whose state is an array of
hashes and therefore bucket-keyed, budget state is ONE counter per
domain — keying by domain is exactly right at any scale (1,759 seeds in
the reference; state store cost is bytes/domain). A hot domain
concentrates INPUT rows into one pandas group per micro-batch, but the
budget cap bounds the OUTPUT, and the group work is one stable partial
sort of the batch's rows — the same cost class as the batch top-k's
phase-2 exact rank, pre-pruned at scale by feeding the stream through
``streaming_seen_dedup`` first.

Within a micro-batch rows are ordered by ``order_cols`` (+ url_hash
tie-break), matching the batch scheduler's deterministic frontier
ordering; across micro-batches arrival order wins, which is the
streaming contract. ``state_ttl_ms`` arms a processing-time timeout
that clears the counter — an idle domain's budget refills, the
streaming analog of the next wave's fresh budget. Processing-time
timeouts fire between micro-batches of a CONTINUOUS trigger (a
trigger(availableNow) drain ends before idle timeouts get a chance to
run); tests/test_streaming.py:test_streaming_budget_ttl_refills runs
this gate under a 250 ms processing-time trigger long enough for the
timeout to fire and pins the refill (fetch_rank restarts at 1).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCHEDULED_SCHEMA = (
    "ts timestamp, url_hash long, url string, domain string, wave long, fetch_rank long"
)
_IN_COLS = ["ts", "url_hash", "url", "domain", "wave"]


def streaming_budget_gate(
    discovered: DataFrame,
    budget: int,
    order_cols: tuple[str, ...] = ("ts",),
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-domain budget-capped emission over a stream of discovered URLs.

    Input columns: ``ts, url_hash, url, domain, wave`` (extras dropped).
    Output: the first ``budget`` URLs per domain (in ``order_cols``
    order within each micro-batch), each carrying the cumulative
    1-based ``fetch_rank`` the batch scheduler would assign.
    """
    cols = list(order_cols)

    def gate_domain(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        used = int(state.get[0]) if state.exists else 0
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks and used < budget:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(cols + ["url_hash"], kind="stable")
            take = batch.head(budget - used)[_IN_COLS].copy()
            take["fetch_rank"] = range(used + 1, used + 1 + len(take))
            used += len(take)
        else:
            take = None
        state.update((used,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if take is not None and not take.empty:
            yield take

    keyed = discovered.select(*_IN_COLS)
    return keyed.groupBy("domain").applyInPandasWithState(
        gate_domain,
        SCHEDULED_SCHEMA,
        "used long",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
