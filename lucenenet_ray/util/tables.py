"""Small-result Dataset → Arrow table collection, hardened.

Ray Data operators (notably ``groupby(...).count()`` / ``map_groups``) can
emit zero-row blocks whose schema is EMPTY (zero columns) rather than the
operator's logical schema; ``pa.concat_tables`` then fails with
"Schema at index N was different". Every driver-side collection of a
small aggregated result goes through :func:`dataset_to_table`, which drops
empty blocks and unifies any remaining schema drift permissively.

Only for k-scale / candidate-scale results — never call this on a
corpus-sized dataset (it materializes on the driver).
"""

from __future__ import annotations

import pyarrow as pa


def concat_tables(tabs: list[pa.Table], schema: pa.Schema | None = None) -> pa.Table:
    """Concat, dropping zero-row blocks (their schemas may be empty/partial).

    If every block is empty, returns ``schema.empty_table()`` when a schema
    is given, else the first block's empty table, else a zero-column table.
    """
    nonempty = [t for t in tabs if t.num_rows > 0]
    if not nonempty:
        if schema is not None:
            return schema.empty_table()
        return tabs[0] if tabs else pa.table({})
    if len(nonempty) == 1:
        return nonempty[0]
    try:
        return pa.concat_tables(nonempty)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return pa.concat_tables(nonempty, promote_options="permissive")


def dataset_to_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Collect a SMALL Ray Dataset as one Arrow table (see module note)."""
    import ray

    return concat_tables(ray.get(ds.to_arrow_refs()), schema=schema)


def matrix_list_array(m) -> pa.Array:
    """(n, d) numpy matrix → Arrow fixed_size_list column WITHOUT the
    per-row Python list materialization of ``pa.array(list(m))`` — one
    flat buffer + a width, O(1) Python objects per batch. Consumers read
    it back with ``pc.list_flatten(col).to_numpy().reshape(n, d)``
    exactly like a plain list column."""
    import numpy as np

    m = np.ascontiguousarray(m)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(m.reshape(-1)), m.shape[1])
