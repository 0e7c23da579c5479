"""Checkpoint/resume: a killed crawl resumes mid-frontier with no
re-fetches and reaches the identical final state (SURVEY.md §5.4)."""

import os

import pytest

from webcrawler_ray.config import CrawlConfig
from webcrawler_ray.pipelines.crawl import RayCrawler

LIMIT = 60


def _cfg(**kw):
    return CrawlConfig(limit=LIMIT, num_seen_shards=3,
                       num_politeness_shards=2, **kw)


@pytest.fixture(scope="module")
def interrupted_then_resumed(ray_session, tiny_web, tmp_path_factory):
    seeds = open(tiny_web["seeds"]).read().splitlines()

    # uninterrupted reference run
    wd_full = str(tmp_path_factory.mktemp("resume") / "full")
    c_full = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd_full, _cfg())
    s_full = c_full.crawl(seeds)
    c_full.shutdown_services()  # datasets remain readable from parquet

    # interrupted run: stop after 2 rounds (simulated kill between rounds)
    wd_int = str(tmp_path_factory.mktemp("resume") / "interrupted")
    c1 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd_int,
                    _cfg(max_rounds=2))
    c1.crawl(seeds)
    c1.shutdown_services()  # the "kill": actors and driver state are gone

    # fresh crawler over the same workdir resumes from the checkpoint
    c2 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd_int, _cfg())
    s2 = c2.crawl(seeds, resume=True)
    yield c_full, s_full, c2, s2
    c2.shutdown_services()


class TestResume:
    def test_final_summary_matches_uninterrupted(self, interrupted_then_resumed):
        _, s_full, _, s2 = interrupted_then_resumed
        for k in ("round", "T", "attempt_base", "saved_total", "budget_left"):
            assert s2[k] == s_full[k], k

    def test_crawl_order_identical(self, interrupted_then_resumed):
        c_full, _, c2, _ = interrupted_then_resumed
        a = c_full.attempts_dataset().to_pandas().sort_values("fetch_seq")
        b = c2.attempts_dataset().to_pandas().sort_values("fetch_seq")
        assert list(a["url"]) == list(b["url"])
        assert list(a["ts"]) == list(b["ts"])
        assert list(a["status"]) == list(b["status"])

    def test_no_refetches(self, interrupted_then_resumed):
        # every URL appears in exactly one round's attempts partition
        _, _, c2, _ = interrupted_then_resumed
        att = c2.attempts_dataset().to_pandas()
        assert att["url"].is_unique

    def test_resume_skips_finished_rounds(self, interrupted_then_resumed):
        # rounds 0-1 directories were written by the first (killed) run and
        # must not be rewritten: their metrics carry the first run's pid era
        _, _, c2, _ = interrupted_then_resumed
        rounds = sorted(os.listdir(os.path.join(c2.workdir, "rounds")))
        assert len(rounds) > 2

    def test_midround_kill_partial_dir_cleaned(self, ray_session, tiny_web,
                                               tmp_path_factory):
        """A kill DURING a round leaves a partial round dir without
        _SUCCESS; resume must wipe and re-run it, not append to it."""
        import shutil

        seeds = open(tiny_web["seeds"]).read().splitlines()
        wd = str(tmp_path_factory.mktemp("midround") / "wd")
        c1 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd,
                        _cfg(max_rounds=2))
        c1.crawl(seeds)
        c1.shutdown_services()
        # simulate the mid-round kill: round 2 partially written
        r2 = os.path.join(wd, "rounds", "r=00002")
        os.makedirs(os.path.join(r2, "attempts"), exist_ok=True)
        with open(os.path.join(r2, "attempts", "stale.parquet"), "w") as f:
            f.write("not parquet")
        c2 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, _cfg())
        s2 = c2.crawl(seeds, resume=True)
        c2.shutdown_services()
        assert not os.path.exists(
            os.path.join(r2, "attempts", "stale.parquet"))
        att = c2.attempts_dataset().to_pandas()
        assert att["url"].is_unique
        assert s2["saved_total"] == LIMIT + 1

    def test_resume_on_fresh_workdir_returns_none(self, ray_session, tiny_web,
                                                  tmp_path):
        c = RayCrawler(tiny_web["pages"], tiny_web["robots"],
                       str(tmp_path / "empty"), _cfg(max_rounds=1))
        state = c._load_latest_checkpoint()
        assert state is None
        c.shutdown_services()

    def test_resume_refuses_config_drift(self, ray_session, tiny_web,
                                         tmp_path):
        """A checkpoint written under one SEMANTIC config must not be
        resumed under another (lineage guard): changed first_n_words
        here — parallelism knobs (shard counts) must NOT trip it."""
        seeds = open(tiny_web["seeds"]).read().splitlines()
        wd = str(tmp_path / "drift")
        c1 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd,
                        _cfg(max_rounds=1))
        c1.crawl(seeds)
        c1.shutdown_services()
        # same semantics, different REQUESTED parallelism: resume
        # proceeds — shard counts snap to the checkpoint's (state is
        # hash-partitioned per actor) and the crawl completes
        c2 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd,
                        CrawlConfig(limit=LIMIT, num_seen_shards=5,
                                    num_politeness_shards=3))
        s2 = c2.crawl(seeds, resume=True)
        assert c2.cfg.num_seen_shards == 3      # checkpoint's counts
        assert c2.cfg.num_politeness_shards == 2
        assert s2["saved_total"] == LIMIT + 1
        c2.shutdown_services()
        # drifted semantics: loud refusal
        c3 = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd,
                        _cfg(first_n_words=7))
        with pytest.raises(ValueError, match="resume refused"):
            c3.crawl(seeds, resume=True)
        c3.shutdown_services()


class TestInRoundTaskRetry:
    """Fault injection INSIDE a round: SIGKILL a worker mid-task so Ray
    retries it (a system failure — the genuine retry path, not an
    application exception), then require the crawl's outputs to be
    bit-identical to a clean run. Forced paths:

    - ``seen_insert``: killed after its shard inserts landed, so the
      retried fused task re-runs cut -> seen-insert -> attempts write;
      the re-executed inserts must be absorbed set-idempotently and the
      attempts parquet must not double-write.
    - ``finish_candidates``: killed before the seen.contains probe, so
      lineage recomputes through the bucketed frontier-dedup aggregate
      (the hash_bucket_aggregate sidecar idempotence contract) and the
      shards are re-probed.
    """

    @pytest.fixture(scope="class")
    def clean_run(self, ray_session, tiny_web, tmp_path_factory):
        seeds = open(tiny_web["seeds"]).read().splitlines()
        wd = str(tmp_path_factory.mktemp("retry") / "clean")
        c = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, _cfg())
        c.crawl(seeds)
        att = c.attempts_dataset().to_pandas().sort_values(
            "fetch_seq").reset_index(drop=True)
        corpus = (c.crawled_dataset().to_pandas()
                  .sort_values("url").reset_index(drop=True))
        c.shutdown_services()
        return att, corpus

    @pytest.mark.parametrize("point", ["seen_insert",
                                       "finish_candidates"])
    def test_midround_retry_bit_identical(self, ray_session, tiny_web,
                                          tmp_path_factory, clean_run,
                                          point):
        import pandas as pd

        from webcrawler_ray.faults import fault_tripped

        att_clean, corpus_clean = clean_run
        seeds = open(tiny_web["seeds"]).read().splitlines()
        fault_dir = str(tmp_path_factory.mktemp(f"fault_{point}"))
        wd = str(tmp_path_factory.mktemp("retry") / f"faulted_{point}")
        cfg = _cfg(extra={"fault_inject": (point, fault_dir)})
        c = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        c.crawl(seeds)
        assert fault_tripped(fault_dir, point), \
            "the fault never fired - the test exercised nothing"
        att = c.attempts_dataset().to_pandas().sort_values(
            "fetch_seq").reset_index(drop=True)
        corpus = (c.crawled_dataset().to_pandas()
                  .sort_values("url").reset_index(drop=True))
        c.shutdown_services()

        pd.testing.assert_frame_equal(att, att_clean)
        pd.testing.assert_frame_equal(corpus, corpus_clean)
