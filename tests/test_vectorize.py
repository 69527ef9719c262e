"""Vectorize-method tests (reference vectorization_test.py analog):
tier-1 Column tracing and tier-2 Arrow-batch per-row loop must agree."""

import numpy as np
import pyspark.sql.functions as F

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Ray(das.DcaTable):
    pos: f32["*b 3"]
    dir: f32["*b 3"]

    @das.vectorize_method
    def dir_norm2_t1(self):
        # Column-traceable: compiles to one Catalyst select (tier 1)
        return {
            "n2": F.aggregate(
                self.dir, F.lit(0.0).cast("double"), lambda a, x: a + x * x
            )
        }

    @das.vectorize_method
    def dir_norm2_t2(self):
        # numpy body: forces tier-2 mapInPandas per-row execution
        return {"n2": float(np.dot(np.asarray(self.dir), np.asarray(self.dir)))}

    @das.vectorize_method
    def scaled_t2(self, factor):
        return {"v": (np.asarray(self.pos) * factor).astype(np.float32)}


def make(spark, shape=(4,)):
    n = int(np.prod(shape))
    pos = np.arange(n * 3, dtype=np.float32).reshape(shape + (3,))
    dir_ = np.ones(shape + (3,), dtype=np.float32) * 2
    return Ray(spark, pos=pos, dir=dir_), pos, dir_


def test_tier1_tier2_agree(spark):
    r, pos, dir_ = make(spark)
    n1 = r.dir_norm2_t1().to_numpy_fields()["n2"]
    n2 = r.dir_norm2_t2().to_numpy_fields()["n2"]
    np.testing.assert_allclose(n1, n2)
    np.testing.assert_allclose(n1, np.full(4, 12.0))


def test_tier2_batch_shape_preserved(spark):
    r, pos, dir_ = make(spark, (2, 2))
    out = r.dir_norm2_t2()
    assert out.shape == (2, 2)


def test_tier2_array_output_and_args(spark):
    r, pos, dir_ = make(spark)
    out = r.scaled_t2(3.0)
    got = out.to_numpy_fields()["v"]
    np.testing.assert_allclose(got, pos * 3.0)
