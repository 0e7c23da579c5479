"""Tests for the parse stage incl. crawl-time enrichment columns."""

import pyarrow as pa

from webcrawler_ray.stages.parse import ParseHtmlBatch, explode_links


def make_batch():
    html = (b"<html><head><title>T</title></head><body>"
            b"<p>alpha beta gamma <a href='/x'>l</a></p></body></html>")
    return pa.table({
        "url": pa.array(["https://h.test/p1"]),
        "host": pa.array(["https://h.test"]),
        "html": pa.array([html], pa.binary()),
        "fetch_seq": pa.array([7], pa.int64()),
    })


class TestParseStage:
    def test_basic_columns(self):
        out = ParseHtmlBatch(20, keep_html=False)(make_batch())
        assert "extracted_text" in out.column_names
        assert "html" not in out.column_names
        assert out.column("n_links").to_pylist() == [1]
        assert out.column("links").to_pylist() == [["https://h.test/x"]]

    def test_enrich_columns_deterministic(self):
        a = ParseHtmlBatch(20, keep_html=False, enrich=True)(make_batch())
        b = ParseHtmlBatch(20, keep_html=False, enrich=True)(make_batch())
        for c in ("n_tokens", "simhash", "minhash_min"):
            assert c in a.column_names
            assert a.column(c).to_pylist() == b.column(c).to_pylist()
        from webcrawler_ray.functions.tokenizer import tokenize

        text = a.column("extracted_text")[0].as_py()
        assert a.column("n_tokens")[0].as_py() == len(tokenize(text))

    def test_enrich_does_not_change_base_columns(self):
        plain = ParseHtmlBatch(20, keep_html=False)(make_batch())
        rich = ParseHtmlBatch(20, keep_html=False, enrich=True)(make_batch())
        for c in ("extracted_text", "title", "first_n", "links", "n_links"):
            assert plain.column(c).to_pylist() == rich.column(c).to_pylist()


class TestExplodeLinks:
    def test_seq_encoding(self):
        batch = pa.table({
            "links": pa.array([["https://a.test/1", "https://a.test/2"], []],
                              pa.list_(pa.string())),
            "fetch_seq": pa.array([3, 4], pa.int64()),
        })
        out = explode_links(batch)
        assert out.column("url").to_pylist() == ["https://a.test/1",
                                                 "https://a.test/2"]
        assert out.column("seq").to_pylist() == [(3 << 20) | 0, (3 << 20) | 1]

    def test_empty(self):
        batch = pa.table({"links": pa.array([], pa.list_(pa.string())),
                          "fetch_seq": pa.array([], pa.int64())})
        assert explode_links(batch).num_rows == 0
