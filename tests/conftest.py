from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("BEYMANI_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from beymani_spark.sources import get_spark

    s = get_spark("beymani-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(scope="session")
def alt_sf_dir():
    """Alternate-seed/skew fixture build (materialized on first use)."""
    from .altseed import build_altseed

    return build_altseed()
