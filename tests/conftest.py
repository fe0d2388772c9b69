from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        # Diagnostics for the rare Python-worker socket teardown race
        # (java.nio.channels.CancelledKeyException after ~1k stages on one
        # shared session): dump the worker's Python stack if it crashes.
        extra_conf={"spark.python.worker.faulthandler.enabled": "true"},
    )
    yield s


@pytest.fixture(scope="session", autouse=True)
def _socket_race_guard():
    """Retry driver-side result fetches ONCE on the known Python-runner
    socket teardown race.

    After ~1,300 stages on a single shared local session, ``collectToPython``
    can fail with ``java.nio.channels.CancelledKeyException`` raised in the
    JVM's socket selector while tearing down a reused Python worker — an
    infrastructure race, not a wrong answer (the identical call passes in
    isolation).  This guard retries exactly once and ONLY when that specific
    JVM exception is present; assertion failures and real errors propagate
    unchanged.  It is test-infra only (conftest), never library code.
    """
    from pyspark.sql import DataFrame

    def _wrap(orig):
        def call(self, *args, **kwargs):
            try:
                return orig(self, *args, **kwargs)
            except Exception as exc:  # noqa: BLE001 - filtered below
                if "CancelledKeyException" not in str(exc):
                    raise
                return orig(self, *args, **kwargs)

        return call

    originals = {name: getattr(DataFrame, name) for name in ("collect", "toPandas", "count")}
    for name, orig in originals.items():
        setattr(DataFrame, name, _wrap(orig))
    yield
    for name, orig in originals.items():
        setattr(DataFrame, name, orig)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
