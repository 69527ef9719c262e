"""Pin-release contract: every pin_materialization registers its
checkpointed RDD, and release_pins() frees those blocks between queries
(the round-15 bench measured late-pass degradation from dead pinned
blocks waiting on the periodic-GC ContextCleaner)."""

import time

from pyspark import StorageLevel

from dataclass_array_spark.core import table as T


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def test_pin_registers_and_release_unpersists(spark):
    T.release_pins()  # drain pins from earlier tests in the session
    before = _persistent_ids(spark)
    df = T.pin_materialization(spark.range(100).toDF("x"))
    assert df.count() == 100  # pinned frame is usable until release
    assert len(T._LIVE_PIN_RDDS) == 1
    added = _persistent_ids(spark) - before
    assert len(added) == 1  # exactly one new persisted RDD: the pin
    n = T.release_pins()
    assert n == 1
    assert T._LIVE_PIN_RDDS == []
    # unpersist(blocking=False) is async; poll briefly for removal
    for _ in range(50):
        if not (added & _persistent_ids(spark)):
            break
        time.sleep(0.1)
    assert not (added & _persistent_ids(spark))


def test_release_pins_is_idempotent_and_safe_when_empty(spark):
    T.release_pins()
    assert T.release_pins() == 0


def test_release_does_not_touch_ordinary_persists(spark):
    T.release_pins()
    df = spark.range(50).toDF("y").persist(StorageLevel.MEMORY_ONLY)
    try:
        df.count()
        assert T.release_pins() == 0  # persist() is not a pin
        assert df.count() == 50
    finally:
        df.unpersist()
