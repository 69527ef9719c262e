"""dataclass_array_spark — a PySpark-native analytics engine with the
capabilities of google-research/dataclass_array, rebuilt Spark-first.

The reference (`/root/reference/dataclass_array`, v1.5.2) is a pure-Python
array-programming library: typed struct-of-arrays with a shared N-d batch
shape, shape ops, schema validation, and vmap-style vectorization.  This
package re-expresses that data model on Spark DataFrames (see
``core.table.DcaTable``) and additionally surfaces the relational layer
(joins/aggs/windows — all Catalyst built-ins), large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns), and Structured Streaming — everything designed for a
1000-executor / 100 TB deployment even though tests run on local[32].

Public API (mirrors the reference's `dataclass_array/__init__.py`):

- ``DcaTable``       — the DataFrame-backed analog of ``dca.DataclassArray``
- ``dataclass_array``— class decorator analog (coercion policy knobs)
- ``field``          — explicit field schema (analog of ``dca.field``)
- ``stack``/``concat`` — module-level combination ops (``ops.py`` analog)
- ``vectorize_method`` — auto-batching decorator (``vectorization.py`` analog)
- relational/LLM operators live under ``operators``.
"""

from dataclass_array_spark.core.table import (
    DcaTable,
    dataclass_array,
    field,
)
from dataclass_array_spark.core.ops import stack, concat
from dataclass_array_spark.vectorize import VectorizeFallbackWarning, vectorize_method
from dataclass_array_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "DcaTable",
    "dataclass_array",
    "field",
    "stack",
    "concat",
    "vectorize_method",
    "VectorizeFallbackWarning",
    "get_spark",
]
