"""Child-side block join (ops/joins.py child_block_join)."""

import numpy as np
import pyarrow as pa
import pytest


def test_child_block_join_filters_to_parents(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.joins import child_block_join

    children = pa.table({
        "pkey": pa.array([1, 1, 2, 3, 3, 3, 4], type=pa.int64()),
        "val": pa.array([10, 11, 20, 30, 31, 32, 40], type=pa.int64()),
    })
    out = child_block_join(rd.from_arrow(children),
                           np.asarray([1, 3]), "pkey").to_pandas()
    assert sorted(out["val"].tolist()) == [10, 11, 30, 31, 32]


def test_child_block_join_empty_parents(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.joins import child_block_join

    children = pa.table({"pkey": pa.array([1, 2], type=pa.int64())})
    out = child_block_join(rd.from_arrow(children),
                           np.asarray([], dtype=np.int64),
                           "pkey").to_pandas()
    assert len(out) == 0
