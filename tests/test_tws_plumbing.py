"""transformWithState plumbing (streaming/tws.py), testable without
the protobuf-backed streaming runner this container lacks:

1. the StatefulProcessor's state arithmetic with a FAKE handle —
   exact integer-cents money accumulation, MapState type counts, and
   the deterministic top-type argmax, across simulated micro-batches;
2. the plan/schema build of transformWithStateInPandas itself (the
   crash is at stream START — the protobuf import lives in the
   streaming Python runner, not in plan construction).
"""

from __future__ import annotations

import pandas as pd
import pytest

from miba_2023_capstone_rb_nlp_spark.streaming.tws import (
    OUT_SCHEMA,
    UserProfileProcessor,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return tuple(k) in self._m

    def getValue(self, k):
        return self._m[tuple(k)]

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def iterator(self):
        return iter(self._m.items())


class _FakeHandle:
    def __init__(self):
        self.value_states = {}
        self.map_states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.value_states.setdefault(name, _FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.map_states.setdefault(name, _FakeMapState())


def _batch(values, types):
    return pd.DataFrame({"value": values, "event_type": types})


def test_processor_composes_across_batches():
    p = UserProfileProcessor()
    p.init(_FakeHandle())
    out1 = list(
        p.handleInputRows(
            (7,), iter([_batch([1.25, 2.50], ["view", "click"])]), None
        )
    )
    out2 = list(
        p.handleInputRows(
            (7,), iter([_batch([0.25, None], ["view", "view"])]), None
        )
    )
    last = out2[0].iloc[0]
    assert last["user_id"] == 7
    assert last["n_events"] == 4  # null-valued rows still count
    assert last["sum_value"] == pytest.approx(4.00)  # exact cents
    assert last["n_types"] == 2
    assert last["top_type"] == "view"  # 3 views vs 1 click
    # first emission was the mid-stream snapshot
    assert out1[0].iloc[0]["n_events"] == 2


def test_processor_argmax_tie_breaks_by_type_asc():
    p = UserProfileProcessor()
    p.init(_FakeHandle())
    out = list(
        p.handleInputRows(
            (1,), iter([_batch([1.0, 1.0], ["view", "click"])]), None
        )
    )
    assert out[0].iloc[0]["top_type"] == "click"  # 1-1 tie → ASC


def test_transform_with_state_plan_builds(spark):
    from miba_2023_capstone_rb_nlp_spark.streaming.tws import (
        running_user_profiles,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "value AS user_id",
            "CAST(value AS DOUBLE) AS value",
            "'view' AS event_type",
        )
    )
    out = running_user_profiles(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "sum_value", "n_types", "top_type",
    ]
    assert OUT_SCHEMA.split(",")[0].strip() == "user_id bigint"


def test_tws_environment_impossibility_record():
    """The pinned environment report VERDICT r10 #5 asked for.

    Promotion of ``register_tws_entry()`` to a driver entry needs the
    transformWithStateInPandas STREAMING RUNNER, which imports
    ``google.protobuf`` (pyspark.sql.streaming.proto) at stream
    start. Round-11 vendoring attempt, recorded here:

    - ``import google.protobuf`` → ModuleNotFoundError (verified
      below, with the exact module name pinned);
    - ``pip download --no-deps protobuf`` → "No matching
      distribution found" (no PyPI route from this sandbox, so the
      pure-Python no-C-extension wheel cannot be fetched);
    - a filesystem sweep finds only typeshed STUBS
      (jedi/third_party/typeshed) and JVM-shaded jars
      (orc-*-shaded-protobuf) — no runnable ``google.protobuf``
      package to vendor.

    If this test ever FAILS (protobuf became importable), delete it
    and promote the entry via ``register_tws_entry()``."""
    with pytest.raises(ModuleNotFoundError) as ei:
        import google.protobuf  # noqa: F401
    assert ei.value.name in ("google", "google.protobuf")


def test_processor_tolerates_all_null_event_types():
    p = UserProfileProcessor()
    p.init(_FakeHandle())
    out = list(
        p.handleInputRows(
            (9,),
            iter([pd.DataFrame({"value": [1.0], "event_type": [None]})]),
            None,
        )
    )
    row = out[0].iloc[0]
    assert row["n_events"] == 1 and row["n_types"] == 0
    assert row["top_type"] is None
