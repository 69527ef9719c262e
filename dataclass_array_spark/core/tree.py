"""Tree utilities: recursive map over dict/list/tuple structures treating
DcaTable (and DataFrame/Column) as leaves — reference
`utils/tree_utils.py:40-82`."""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame

from dataclass_array_spark.core.table import DcaTable

_LEAF_TYPES = (DcaTable, DataFrame, Column, str, bytes, int, float, bool, type(None))


def tree_map(fn: Callable[[Any], Any], *trees: Any) -> Any:
    """Map ``fn`` over parallel trees; DcaTable instances are leaves."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: tree_map(fn, *[t[k] for t in trees]) for k in first}
    if isinstance(first, (list, tuple)):
        mapped = [tree_map(fn, *[t[i] for t in trees]) for i in range(len(first))]
        return type(first)(mapped)
    return fn(*trees)
