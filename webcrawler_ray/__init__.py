"""webcrawler_ray — a Ray-Data-native rebuild of Pendulun/WebCrawler.

A from-scratch distributed URL-frontier + fetch scheduler over Parquet
tables of Common-Crawl-style web pages, expressed as ray.data.Dataset
pipelines (map_batches over zero-copy Arrow batches, actor pools for
stateful stages), plus the training-data operators a 100 TB pipeline
needs (dedup family, similarity search, text analysis, multimodal stubs).

Reference (behavior only, no code copied): /root/reference — a 1.3 kLoC
pure-Python 80-thread course crawler. See SURVEY.md for the full mapping.

NOTE: nothing in this package calls ray.init()/ray.shutdown(); sessions
are owned by bench.py / CLI entry points / the test fixture.
"""

__version__ = "0.1.0"
