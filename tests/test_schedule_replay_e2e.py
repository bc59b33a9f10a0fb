"""Kill → resume → replay, end to end: the scheduler's ``Rerun::``
pending-job protocol (scheduling.py, reference schedulers.py:75-99)
composed with the crawl engine's wave checkpoints (P4).

Scenario: a schedule cycle over two sites dies MID-CRAWL on the second
site — after that crawl committed two wave checkpoints but before the
job completed (so its pending entry was never removed). The next boot's
``trigger_pending_jobs`` must replay exactly that job under a
``Rerun::`` id, and the replayed engine must RESUME from the committed
wave (not restart from the seeds): per-wave scheduled counts across
boot 1 + boot 2 must equal an uninterrupted run's, the final seen set
must be identical, and a third boot must replay nothing.

This is the composed proof the per-layer tests (test_scheduling.py's
recorder runner, test_crawl_engine.py's resume) don't give: the real
``engine_runner`` + real CrawlEngine under the scheduler's crash window.
"""

from __future__ import annotations

import pytest

from searchgov_spider_spark.plans.crawl import CrawlEngine
from searchgov_spider_spark.scheduling import CrawlScheduler, engine_runner
from searchgov_spider_spark.sources.crawl_sites import CrawlSite, CrawlSites
from searchgov_spider_spark.sources.fetch import TablePageFetcher
from searchgov_spider_spark.testing.graph import generate_graph, graph_to_dfs


class KilledMidCrawl(RuntimeError):
    pass


def _sites() -> CrawlSites:
    return CrawlSites(
        [
            CrawlSite(
                name="agency-a", allow_query_string=False,
                allowed_domains="agency-a.gov",
                handle_javascript=False,
                starting_urls="https://agency-a.gov/",
                output_target="csv", depth_limit=5,
            ),
            CrawlSite(
                name="hot", allow_query_string=False,
                allowed_domains="hot.example.gov",
                handle_javascript=False,
                starting_urls="https://hot.example.gov/",
                output_target="csv", depth_limit=6,
            ),
        ]
    )


@pytest.fixture(scope="module")
def world(spark):
    graph = generate_graph(n_pages=260, seed=13)
    pages_df, _, robots_df = graph_to_dfs(spark, graph)
    return TablePageFetcher(pages_df), robots_df


def _seen_set(result) -> set[str]:
    return {r["canon_url"] for r in result.seen.collect()}


def test_kill_resume_replay(spark, world, tmp_path):
    fetcher, robots = world
    sites = _sites()
    hot = next(s for s in sites if s.job_id == "hot")

    # -- uninterrupted reference run of the to-be-killed site ------------
    ref_dir = tmp_path / "ref-state"
    ref = CrawlEngine(
        spark, CrawlSites([hot]).to_seeds_df(spark), fetcher,
        robots=robots, state_dir=str(ref_dir / "hot"),
    ).run()
    assert ref.total_scheduled > 0

    # -- boot 1: cycle dies mid-crawl on 'hot' (2 waves committed) -------
    root = tmp_path / "sched-state"
    base = engine_runner(spark, fetcher, robots=robots)
    boot1_partial = {}

    def killing_runner(site, run_id):
        if site.job_id == "hot":
            # run two waves (checkpoints commit under the real state
            # dir), then die before the scheduler can unlink the entry
            partial = engine_runner(spark, fetcher, robots=robots, max_waves=2)(
                site, run_id, state_dir=str(root / site.job_id)
            )
            boot1_partial["result"] = partial
            raise KilledMidCrawl(run_id)
        base(site, run_id, state_dir=str(root / site.job_id))

    sched1 = CrawlScheduler(sites, root, killing_runner)
    sched1.schedule_due()
    assert sched1.store.count_pending_jobs() == 2
    with pytest.raises(KilledMidCrawl):
        sched1.run_pending()  # agency-a completes, hot dies mid-crawl
    assert [j["job_id"] for j in sched1.store.get_all_pending_jobs()] == ["hot"]

    # -- boot 2: replay resumes the interrupted crawl ---------------------
    replayed_results = {}

    def recording_runner(site, run_id):
        replayed_results[run_id] = base(
            site, run_id, state_dir=str(root / site.job_id)
        )

    sched2 = CrawlScheduler(sites, root, recording_runner)
    replayed = sched2.trigger_pending_jobs()
    assert replayed == ["Rerun::hot"]
    assert sched2.store.count_pending_jobs() == 0

    resumed = replayed_results["Rerun::hot"]
    partial = boot1_partial["result"]
    # resumed, not restarted: the replay's first wave index continues
    # past boot 1's committed waves instead of starting at 0
    assert resumed.waves[0].wave == len(partial.waves)
    # per-wave schedule across the kill equals the uninterrupted run's
    assert (
        partial.scheduled_per_wave + resumed.scheduled_per_wave
        == ref.scheduled_per_wave
    )
    # and the final URL-seen set is bit-identical
    assert _seen_set(resumed) == _seen_set(ref)

    # -- boot 3: nothing left to replay (once and only once) -------------
    sched3 = CrawlScheduler(sites, root, recording_runner)
    assert sched3.trigger_pending_jobs() == []


def test_completed_job_killed_before_unlink_is_noop(spark, world, tmp_path):
    """The protocol's only at-least-once window: the crawl finished but
    the process died before the pending entry was removed. The replay
    must resume from the drained frontier and terminate without
    scheduling anything (idempotent, no duplicate output)."""
    fetcher, robots = world
    sites = _sites()
    root = tmp_path / "state"
    base = engine_runner(spark, fetcher, robots=robots)

    def complete_then_die(site, run_id):
        base(site, run_id, state_dir=str(root / site.job_id))
        raise KilledMidCrawl(run_id)  # after completion, before unlink

    sched1 = CrawlScheduler(sites, root, complete_then_die)
    sched1.schedule_due(due=["hot"])
    with pytest.raises(KilledMidCrawl):
        sched1.run_pending()

    replayed_results = {}

    def recording_runner(site, run_id):
        replayed_results[run_id] = base(
            site, run_id, state_dir=str(root / site.job_id)
        )

    sched2 = CrawlScheduler(sites, root, recording_runner)
    assert sched2.trigger_pending_jobs() == ["Rerun::hot"]
    assert replayed_results["Rerun::hot"].total_scheduled == 0


def test_resume_from_every_truncation_prefix(spark, world, tmp_path):
    """Crash-point sweep: truncating the committed state to ANY wave
    prefix (deleting manifests > k hides later data — the torn-state
    analog) and resuming must reproduce the uninterrupted run's
    remaining per-wave schedule and its exact final seen set. This
    pins the checkpoint format at every wave, not just the latest."""
    import shutil

    fetcher, robots = world
    hot = next(s for s in _sites() if s.job_id == "hot")
    seeds = CrawlSites([hot]).to_seeds_df(spark)

    full_dir = tmp_path / "full"
    ref = CrawlEngine(
        spark, seeds, fetcher, robots=robots, state_dir=str(full_dir)
    ).run()
    ref_seen = _seen_set(ref)
    probe = CrawlEngine(spark, seeds, fetcher, robots=robots, state_dir=str(full_dir))
    waves = probe.store.committed_waves("frontier")
    assert len(waves) >= 3  # sweep is vacuous on a 1-wave crawl

    for k in waves[1:-1]:  # k=0 is a fresh run; last wave = drained frontier
        d = tmp_path / f"trunc{k}"
        shutil.copytree(full_dir, d)
        for name in ("frontier", "seen", "documents"):
            mdir = d / "manifests" / name
            if not mdir.exists():
                continue
            for p in mdir.glob("wave=*.json"):
                if int(p.name[5:-5]) > k:
                    p.unlink()
        resumed = CrawlEngine.resume(
            spark, seeds, fetcher, robots=robots, state_dir=str(d)
        )
        start = resumed.waves[0].wave
        assert 0 < start <= k
        assert (
            resumed.scheduled_per_wave == ref.scheduled_per_wave[start:]
        ), f"schedule diverged resuming at truncation k={k}"
        assert _seen_set(resumed) == ref_seen, f"seen set diverged at k={k}"
