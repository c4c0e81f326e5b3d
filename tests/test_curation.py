"""Curation funnel (ops/curation.py): fused single-pass counters must
equal composing the three stage operators independently; retention is
monotone non-increasing."""

import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel_inputs(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import build_reference_model
    from lucenenet_ray.ops.webclean import webclean_augmented_text

    def ref_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % 10 == 0))

    def augment(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pa.array([webclean_augmented_text(i, x or "")
                              for i, x in zip(ids, texts)])})

    model = str(tmp_path_factory.mktemp("cur") / "model.parquet")
    raw = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "text"])
    build_reference_model(raw.map_batches(ref_slice, batch_format="pyarrow"),
                          model)
    aug = raw.map_batches(augment, batch_format="pyarrow")
    # cutoffs from the AUGMENTED ref slice (same text form as the corpus)
    return (aug, aug.map_batches(ref_slice, batch_format="pyarrow"), model)


def test_funnel_matches_composed_stages(funnel_inputs):
    from lucenenet_ray.ops.curation import curation_funnel
    from lucenenet_ray.ops.lm_quality import (lm_bucket_cutoffs,
                                              lm_score_dataset)
    from lucenenet_ray.ops.webclean import C4Clean, GopherQuality

    ds_aug, ds_ref, model = funnel_inputs
    got = curation_funnel(ds_aug, ds_ref, model).to_pandas()
    assert got["name"].tolist() == ["total", "c4_page", "gopher", "fluent"]
    n = got["n_docs"].tolist()
    # monotone non-increasing retention
    assert n == sorted(n, reverse=True)

    # recompose from the three independent graded operators
    c4 = (ds_aug.map_batches(C4Clean(), batch_format="pyarrow")
          .to_pandas().set_index("doc_id")["page_keep"])
    g = (ds_aug.map_batches(GopherQuality(), batch_format="pyarrow")
         .to_pandas().set_index("doc_id")["keep"])
    _c1, c2 = lm_bucket_cutoffs(lm_score_dataset(ds_ref, model))
    aw = (lm_score_dataset(ds_aug, model)
          .to_pandas().set_index("doc_id")["avg_w"])
    s1 = c4[c4 == 1].index
    s2 = [i for i in s1 if g.get(i, 0) == 1]
    s3 = [i for i in s2 if aw.get(i, -1) >= c2]
    assert n == [len(c4), len(s1), len(s2), len(s3)]
    # every stage must have bite at this sf: non-empty and strictly
    # smaller than the stage before it at least once overall
    assert n[0] > 0 and n[3] > 0 and n[3] < n[0]
