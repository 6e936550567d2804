from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Built-plan cache, per live session (weak: dies with the session). Building
# some plans costs ~1s of driver time (the mapper's per-entry annotation tree
# is hundreds of nested Column objects, each a py4j round trip); a DataFrame is
# an immutable logical plan, so reuse across calls is exactly what a production
# deployment does (build once, run per micro-batch / per request).
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]"
import weakref

_PLAN_CACHE = weakref.WeakKeyDictionary()


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the engine surface. `oracle` is the DuckDB-
    equivalent ANSI SQL (column names/aliases MUST match the Spark output —
    the driver's compare sorts columns by name before value-hashing)."""

    def deco(fn):
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            per_session = _PLAN_CACHE.setdefault(spark, {})
            key = (sf_dir, name)
            df = per_session.get(key)
            if df is None:
                df = per_session[key] = fn(spark, sf_dir)
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        cached.__wrapped__ = fn
        QUERIES[name] = cached
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def release_query_caches(spark: SparkSession) -> None:
    """Drop built plans and executor-cached blocks for `spark`.

    A handful of registry queries persist a shared intermediate (tf-idf token
    counts, bigram relation, geo cells): correct for a single run, but a
    long-lived driver session that invokes many queries accumulates cached
    blocks with no owner to unpersist them. Harness loops (bench.py does this
    between queries) call this to bound cache lifetime to one query; the
    per-batch streaming pipeline manages its own snapshots explicitly.

    SCOPE WARNING: this calls `spark.catalog.clearCache()`, which unpersists
    EVERY cached relation in the session — including caches the caller
    created and still depends on, not just registry-query intermediates
    (registry persists are anonymous `DataFrame.persist()` handles, so there
    is no narrower handle to release them by). Treat this as a session-level
    reset between independent workloads; do not call it mid-pipeline while
    your own persisted DataFrames are still live."""
    _PLAN_CACHE.pop(spark, None)
    spark.catalog.clearCache()
