"""Central query registry.  Every operator claimed in SURVEY.md §2 gets a
named entry here with its Spark callable and (where SQL-expressible) the
DuckDB oracle — the pair is what the driver's correctness gate checks."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from dataclass_array_spark.workload.base import load_tables  # re-export


@dataclasses.dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: Tuple[str, ...] = ()
    bench: bool = True  # include in bench.py headline timing


def _collect() -> Dict[str, Query]:
    out: Dict[str, Query] = {}
    from dataclass_array_spark.workload import tpch

    modules = [tpch]
    for modname in ("tpch2", "relational", "relational2", "events", "llm", "streaming", "shapes"):
        try:
            mod = __import__(
                f"dataclass_array_spark.workload.{modname}", fromlist=["QUERIES"]
            )
            modules.append(mod)
        except ImportError:
            continue
    for mod in modules:
        for k, v in mod.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name {k}")
            out[k] = v
    return out


QUERIES: Dict[str, Query] = _collect()


def query_fns() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: q.fn for k, q in QUERIES.items()}


def oracle_sqls() -> Dict[str, str]:
    return {k: q.oracle for k, q in QUERIES.items() if q.oracle}
