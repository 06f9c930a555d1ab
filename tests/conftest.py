import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tiny test corpora: use exact (full-scan) hot-term detection so the
# salting assertions are deterministic
os.environ.setdefault("OLSPARK_SALT_SAMPLE_FRAC", "1.0")


@pytest.fixture(scope="session")
def spark():
    from ocaml_lucene_spark.session import get_spark

    s = get_spark("ocaml_lucene_spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic 800-doc webtext corpus (shared across tests)."""
    from ocaml_lucene_spark.sources.corpus import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    path = generate_corpus(str(out), n_docs=800, seed=42)
    return path
