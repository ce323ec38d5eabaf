"""Driver-facing query suite.

Every operator from SURVEY.md §2 (plus the §7.6 extension surface) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame``
callable and, where SQL-expressible, an equivalent DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes the registry to the driver.
"""

from .registry import REGISTRY, QuerySpec, query

from . import core_relational  # noqa: E402,F401  (registers queries)
from . import extensions  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
