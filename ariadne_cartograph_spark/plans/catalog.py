"""Query catalog — the registry behind ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 that is implemented gets an entry here:
a callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string computing the same
result with the same column names (the driver hash-compares values after
sorting columns by name).

Conventions enforced across the catalog (see SURVEY.md §5.2):
- every computed column is explicitly aliased, identically on both sides;
- floating aggregates are rounded on both sides so double-precision
  summation-order differences between engines cannot flip the hash;
- any top-k has a total deterministic ordering (ties broken by key);
- no query relies on "keep an arbitrary row" semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py
    tags: list[str] = field(default_factory=list)  # SURVEY §2 operator ids


REGISTRY: dict[str, CatalogEntry] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: list[str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in REGISTRY, f"duplicate catalog entry {name}"
        REGISTRY[name] = CatalogEntry(name, fn, oracle, headline, tags or [])
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect modules that populate REGISTRY.
    from . import relational  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import geo_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}


def get_headline() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in REGISTRY.items() if e.headline}
