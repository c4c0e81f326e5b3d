"""Registry hygiene: the driver grades only the FIRST 50 queries() entries,
so the window must stay fully oracle-backed (rows-only queries belong
past 50), and every oracle key must have a query."""

import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    return E


def test_graded_window_all_oracle_backed():
    E = _entry()
    names = list(E.queries())[:50]
    osql = E.oracle_sql()
    missing = [n for n in names if n not in osql]
    assert missing == [], missing


def test_bm25_contract_leads_the_window():
    E = _entry()
    head = list(E.queries())[:10]
    assert sum(1 for n in head if n.startswith("bm25_")) == 9
    assert "numeric_range_filter" in head


def test_every_oracle_has_a_query():
    E = _entry()
    qs = E.queries()
    dangling = [k for k in E.oracle_sql() if k not in qs]
    assert dangling == []
