"""Session-conf hygiene of the catalog (VERDICT r2 item 7).

``load_table`` needs a UTC session timezone for oracle parity, but a
library must not *silently* rewrite the caller's session conf.  Contract:
no-op when the session already satisfies the requirement; a UserWarning
naming the conf when it must mutate.
"""

from __future__ import annotations

import warnings

from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_no_mutation_no_warning_when_conf_already_utc(spark, sf_smoke):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails the test
        load_table(spark, sf_smoke, "events").limit(1).collect()
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_mutation_is_loud_on_hostile_session(spark, sf_smoke):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            load_table(spark, sf_smoke, "region").limit(1).collect()
        msgs = [str(w.message) for w in caught if w.category is UserWarning]
        assert any("spark.sql.session.timeZone" in m for m in msgs), msgs
        # the pin actually happened — parity semantics restored
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
