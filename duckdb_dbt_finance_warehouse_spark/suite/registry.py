from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The scale the driver's correctness gate runs at — ``oracle_for``
# specs instantiate their SQL for this dir when no explicit sf is given.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only OR oracle_for-derived
    doc: str = ""
    # Optional per-sf oracle: (sf_dir) -> SQL, for queries whose tuning
    # literals legitimately scale with the corpus (e.g. LSH plane count
    # sized by corpus rows from parquet footers).  Specs with an
    # ``oracle_for`` leave ``oracle`` as None and resolve LAZILY via
    # ``resolved_oracle`` — instantiating at import time would make
    # importing the registry touch the testdata directory (it reads
    # parquet footers), breaking any environment without it.
    oracle_for: Callable[[str], str] | None = None
    _oracle_cache: dict[str, str] = field(default_factory=dict, repr=False)

    def resolved_oracle(self, sf_dir: str = DRIVER_SF_DIR) -> str | None:
        """The oracle SQL for ``sf_dir``: the static string when the
        oracle is scale-independent, else ``oracle_for(sf_dir)``
        (cached per sf — it may read parquet footers)."""
        if self.oracle_for is None:
            return self.oracle
        if sf_dir not in self._oracle_cache:
            self._oracle_cache[sf_dir] = self.oracle_for(sf_dir)
        return self._oracle_cache[sf_dir]

    @property
    def has_oracle(self) -> bool:
        return self.oracle is not None or self.oracle_for is not None


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
