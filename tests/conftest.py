from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _activate_pbshim() -> None:
    """Make ``google.protobuf`` importable in this process AND in the
    PySpark workers the session will spawn, so the
    ``transformWithStateInPandas`` twin runs instead of skipping.
    See ``vendor/pbshim/sitecustomize.py`` — no-op when a real
    protobuf wheel is installed or the vendored SDK copy is absent."""
    shim = os.path.join(_REPO, "vendor", "pbshim")
    try:
        import google.protobuf  # noqa: F401 — real wheel; nothing to do

        return
    except ImportError:
        pass
    if shim not in sys.path:
        sys.path.insert(0, shim)
    try:
        import google.protobuf  # noqa: F401 — shim resolvable?
    except ImportError:
        sys.path.remove(shim)
        return
    # worker processes: inherit PYTHONPATH from the driver JVM's env,
    # where our dir makes sitecustomize auto-run at interpreter start
    prev = os.environ.get("PYTHONPATH", "")
    if shim not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            shim + (os.pathsep + prev if prev else "")
        )


_activate_pbshim()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from go_zoom_kinesis_spark.session import get_spark

    spark = get_spark(app_name="gzk-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
