"""Round-11 guards: set_conf_tracked's unset-capture (VERDICT r10
#6 — the proper closure of ADVICE r9 #2's restore-by-value caveat)."""

from __future__ import annotations

from miba_2023_capstone_rb_nlp_spark.suite import (
    _conf_explicitly_set,
    release_persisted,
    set_conf_tracked,
)


def test_tracked_conf_default_key_restored_to_unset(spark):
    """A default-valued key that was never explicitly set must come
    back TRULY-UNSET after the tracked lifecycle releases — not
    re-set to its default string (the pre-r11 behavior a
    set-vs-default-distinguishing consumer could observe)."""
    key = "spark.sql.files.maxRecordsPerFile"
    assert _conf_explicitly_set(spark, key) is False, (
        "precondition: the test session must not explicitly set "
        f"{key} — pick another default-valued key"
    )
    default = spark.conf.get(key)
    set_conf_tracked(spark, key, "123456")
    try:
        assert spark.conf.get(key) == "123456"
        assert _conf_explicitly_set(spark, key) is True
    finally:
        release_persisted()
    assert _conf_explicitly_set(spark, key) is False
    assert spark.conf.get(key) == default


def test_tracked_conf_explicit_key_restored_by_value(spark):
    """A key the session HAD explicitly set is restored to that
    explicit value (and stays explicitly-set)."""
    key = "spark.sql.files.maxPartitionBytes"
    was_explicit = _conf_explicitly_set(spark, key)
    prior = spark.conf.get(key) if was_explicit else None
    spark.conf.set(key, "134217728")
    try:
        set_conf_tracked(spark, key, "268435456")
        assert spark.conf.get(key) == "268435456"
        release_persisted()
        assert spark.conf.get(key) == "134217728"
        assert _conf_explicitly_set(spark, key) is True
    finally:
        release_persisted()
        if was_explicit:
            spark.conf.set(key, prior)
        else:
            spark.conf.unset(key)


def test_probe_reports_unknown_without_jvm_bridge(spark):
    """Where the private JVM bridge is unavailable (Connect), the
    probe must report None — set_conf_tracked then degrades to the
    documented restore-by-value behavior instead of guessing."""

    class _NoBridge:
        def __getattr__(self, name):  # any access fails like Connect
            raise AttributeError(name)

    assert _conf_explicitly_set(_NoBridge(), "spark.sql.ansi.enabled") is None
