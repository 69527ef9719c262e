"""The README quickstart must actually run (doc accuracy)."""

import numpy as np

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32


def test_readme_quickstart(spark):
    @das.dataclass_array(broadcast=True, cast_dtype=True)
    class Ray(das.DcaTable):
        pos: f32["*batch 3"]
        dir: f32["*batch 3"]

    r = Ray(
        spark,
        pos=np.zeros((2, 3, 3), np.float32),
        dir=np.ones((2, 3, 3), np.float32),
    )
    assert r.shape == (2, 3)
    sliced = r.reshape("h w -> w h")[0]
    assert sliced.shape == (2,)
    masked = r[np.array([True, False])]
    assert masked.shape == (1, 3)
    t = Ray.read_parquet  # the adoption entry point exists
    assert callable(t)
