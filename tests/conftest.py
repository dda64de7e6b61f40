from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biosd_feature_annotator_spark.session import get_spark  # noqa: E402
from biosd_feature_annotator_spark.sources.lexicon import load_lexicon  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="kg-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lexicon():
    return load_lexicon(os.path.join(GOLDEN_DIR, "lexicon.json"))
