from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    # Optional per-sf oracle: (sf_dir) -> SQL, for queries whose tuning
    # literals legitimately scale with the corpus (e.g. LSH plane count
    # sized by corpus rows). ``oracle`` stays the sf0.01 instantiation —
    # that's what the driver runs; local sweeps at other sfs use this.
    oracle_for: Callable[[str], str] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    oracle_for: Callable[[str], str] | None = None,
):
    """Register a suite query under a SURVEY §2 op-id key."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(
            fn=fn, oracle=oracle, doc=fn.__doc__ or "", oracle_for=oracle_for
        )
        return fn

    return deco
