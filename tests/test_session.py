"""get_spark master-resolution contract (jobs/session.py).

Under spark-submit the launcher's --master must win: builder.master() is
only called when a master was explicitly passed or when running
standalone. The decision is a pure function so it's testable without
launching a second JVM.
"""

from __future__ import annotations

from manga_ocr_spark.jobs.session import _resolve_master


def test_explicit_master_always_wins():
    assert _resolve_master("local[4]", {"PYSPARK_GATEWAY_PORT": "5"}, 32) == "local[4]"
    assert _resolve_master("yarn", {}, 32) == "yarn"


def test_under_spark_submit_master_is_left_to_the_launcher():
    # spark-submit's gateway is up -> do NOT set a master (None = leave
    # the launcher's --master in the JVM conf untouched)
    assert _resolve_master(None, {"PYSPARK_GATEWAY_PORT": "5"}, 32) is None


def test_standalone_defaults_to_local_cpus():
    assert _resolve_master(None, {}, 8) == "local[8]"
