"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline — a full frontier crawl of the
deterministic synthetic web at sf0.001 scale — and returns the saved-page
corpus as a Dataset. ``queries()`` exposes every implemented operator
family (SURVEY.md §2 + the training-data operators); ``oracle_sql()``
carries the DuckDB equivalents for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in webcrawler_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from webcrawler_ray.pipelines.registry import crawl_corpus

    return crawl_corpus("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from webcrawler_ray.pipelines.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible entry of queries();
    non-SQL-expressible ops (multi-round crawl, LSH/sketch dedup, IVF ANN,
    model-style scoring, codec stub) are omitted -> rows-only checks."""
    from webcrawler_ray.pipelines.registry import ORACLE_SQL

    return {k: v for k, v in ORACLE_SQL.items() if v}
