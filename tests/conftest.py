import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def documents_index(ray_session, tmp_path_factory):
    """Build the documents index once for the whole test session."""
    from lucenenet_ray.pipelines.flagship import index_documents

    path = str(tmp_path_factory.mktemp("idx") / "documents")
    manifest = index_documents(SF_DIR, path, n_buckets=4)
    return path, manifest


@pytest.fixture(scope="session")
def corpus():
    """Raw (doc_id, text) plus analyzed tokens for oracle computation."""
    import pyarrow.parquet as pq

    from lucenenet_ray.analysis import analyze

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    docs = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    toks = {d: analyze(x)[0] for d, x in zip(docs, texts)}
    return docs, texts, toks
