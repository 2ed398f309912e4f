import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.io import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("AFG_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="afg-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def seq_fixtures(spark):
    """Small deterministic corpus: 60 docs, ~480 events, 200 probes."""
    from engine.datagen import gen_probes, gen_seq_events, gen_sequences

    n_docs = 60
    seqs = gen_sequences(spark, n_docs, seed=7, partitions=4).cache()
    events = gen_seq_events(spark, n_docs, seed=7, partitions=4).cache()
    probes = gen_probes(spark, n_docs, 200, seed=7).cache()
    seqs.count(), events.count(), probes.count()
    return {"sequences": seqs, "seq_events": events, "probes": probes}
