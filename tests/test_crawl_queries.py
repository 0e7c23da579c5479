"""Tests for the crawl-family registry queries (rows-only operators)."""

import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries(ray_session):
    from webcrawler_ray.pipelines.registry import build_queries

    return build_queries()


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


class TestCrawlQueries:
    def test_flagship_deterministic_across_calls(self, queries):
        a = _df(queries["crawl_flagship"](SF_DIR))
        b = _df(queries["crawl_flagship"](SF_DIR))
        pd.testing.assert_frame_equal(a, b)
        assert list(a["fetch_seq"]) == list(range(len(a)))

    def test_corpus_text_nonempty(self, queries):
        df = _df(queries["crawl_corpus"](SF_DIR))
        assert len(df) > 0
        assert (df["extracted_text"].str.len() > 0).all()

    def test_host_counts_sum_to_attempts(self, queries):
        att = _df(queries["crawl_flagship"](SF_DIR))
        hc = _df(queries["crawl_host_counts"](SF_DIR))
        assert hc["n_pages"].sum() == len(att)

    def test_url_algebra_consistency(self, queries):
        df = _df(queries["url_algebra"](SF_DIR))
        assert len(df) > 0
        # host2 + resource2 losslessly recompose the url (M2/M3 invariant)
        assert (df["host2"] + df["resource2"] == df["url"]).all()
        assert df["passes_blocklist"].dtype == bool

    def test_crawl_log_fields(self, queries):
        df = _df(queries["crawl_log"](SF_DIR))
        assert set(df.columns) == {"URL", "Title", "Text", "Timestamp"}
        assert len(df) > 0
        corpus = _df(queries["crawl_corpus"](SF_DIR))
        assert len(df) == len(corpus)
