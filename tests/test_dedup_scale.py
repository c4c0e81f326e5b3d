"""Scale-shape tests for the flagship exact-dedup pre-pass (VERDICT r4
'What's wrong #1/#2'): the guard must never materialize url partials on
the driver on the over-threshold path, and the at-scale fallback must be
the vectorized per-partition kernel — zero per-url-group Python calls."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd


def _mk_pages(n_urls=200, dup_every=3, seed=7):
    """Synthetic pages with cross-batch dups and exact (url, warc_ts)
    ties that differ only in html bytes."""
    rng = np.random.default_rng(seed)
    urls, tss, htmls = [], [], []
    for i in range(n_urls):
        u = f"http://site{i % 37}.example/p/{i}"
        k = 1 + (i % dup_every == 0) * int(rng.integers(1, 4))
        base = int(rng.integers(1, 10**6))
        for j in range(k):
            urls.append(u)
            # half the dup urls tie on ts (differ in html), half differ in ts
            tss.append(base + (0 if (i % 6 == 0) else j))
            htmls.append(f"<html>v{j}-{i}</html>".encode())
    perm = rng.permutation(len(urls))
    return pa.table({
        "url": pa.array([urls[p] for p in perm], type=pa.string()),
        "warc_ts": pa.array([tss[p] for p in perm],
                            type=pa.timestamp("us")),
        "html": pa.array([htmls[p] for p in perm], type=pa.binary()),
    })


def _reference_dedup(t: pa.Table) -> pa.Table:
    from lucenenet_ray.pipelines.flagship import keep_latest_by_url

    out = []
    for u in sorted(set(t.column("url").to_pylist())):
        g = t.filter(pc.equal(t.column("url"), u))
        out.append(keep_latest_by_url(g))
    return pa.concat_tables(out)


def _sorted(t: pa.Table) -> pa.Table:
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


class _NoDriverFetchNoGroupPython:
    """Fails the test if the dedup path fetches Dataset blocks to the
    driver (to_arrow_refs) or calls the per-url-group Python kernel."""

    def __enter__(self):
        import ray.data

        from lucenenet_ray.pipelines import flagship

        self._ds_cls = ray.data.Dataset
        self._orig_refs = self._ds_cls.to_arrow_refs
        self._flagship = flagship
        self._orig_keep = flagship.keep_latest_by_url

        def no_refs(ds_self, *a, **kw):
            raise AssertionError(
                "to_arrow_refs on the over-threshold dedup path")

        def no_group(group):
            raise AssertionError(
                "per-url-group Python kernel on the at-scale dedup path")

        self._ds_cls.to_arrow_refs = no_refs
        flagship.keep_latest_by_url = no_group
        return self

    def __exit__(self, *exc):
        self._ds_cls.to_arrow_refs = self._orig_refs
        self._flagship.keep_latest_by_url = self._orig_keep
        return False


def test_partition_kernel_matches_per_group_reference():
    from lucenenet_ray.pipelines.flagship import \
        _keep_latest_partition_kernel

    t = _mk_pages()
    got = _sorted(_keep_latest_partition_kernel(t))
    want = _sorted(_reference_dedup(t))
    assert got.equals(want)


def test_dedup_latest_fallback_vectorized_and_driverless(ray_session):
    """Forcing the over-threshold branch (max_broadcast_urls=0): result
    identical to the broadcast fast path, with driver fetches and
    per-group Python forbidden."""
    from lucenenet_ray.pipelines.flagship import dedup_latest

    t = _mk_pages()
    ds = rd.from_arrow(t).repartition(5)
    fast = _sorted(pa.Table.from_pylist(dedup_latest(ds).take_all()))
    with _NoDriverFetchNoGroupPython():
        slow_ds = dedup_latest(rd.from_arrow(t).repartition(5),
                               max_broadcast_urls=0)
        slow = _sorted(pa.Table.from_pylist(slow_ds.take_all()))
    want = _sorted(_reference_dedup(t))
    # column order can differ after shuffles; compare canonically
    cols = sorted(t.column_names)
    assert fast.select(cols).equals(want.select(cols))
    assert slow.select(cols).cast(want.select(cols).schema).equals(
        want.select(cols))


def test_dedup_latest_pages_fallback_vectorized_and_driverless(
        ray_session, tmp_path):
    from lucenenet_ray.pipelines.flagship import dedup_latest_pages

    import pyarrow.parquet as pq

    t = _mk_pages(n_urls=120)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)
    ds = rd.read_parquet(path)
    with _NoDriverFetchNoGroupPython():
        out_ds = dedup_latest_pages(path, ds, max_broadcast_urls=0)
        out = _sorted(pa.Table.from_pylist(out_ds.take_all()))
    want = _sorted(_reference_dedup(t))
    cols = sorted(t.column_names)
    assert out.select(cols).cast(want.select(cols).schema).equals(
        want.select(cols))


def test_dedup_fallback_block_invariance(ray_session):
    """Same bytes out at any input partitioning (the co-location property
    the polars-hash exchange must provide)."""
    from lucenenet_ray.pipelines.flagship import dedup_latest

    t = _mk_pages(n_urls=150, seed=11)
    a = dedup_latest(rd.from_arrow(t).repartition(2),
                     max_broadcast_urls=0)
    b = dedup_latest(rd.from_arrow(t).repartition(13),
                     max_broadcast_urls=0)
    ta = _sorted(pa.Table.from_pylist(a.take_all()))
    tb = _sorted(pa.Table.from_pylist(b.take_all()))
    assert ta.equals(tb)
