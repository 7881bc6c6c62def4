"""Guard for the driver's first-50 correctness window (round-5 verdict
item 7): a newly registered operator must never silently land past the
window again, and everything unwitnessed in the PREVIOUS round's
correctness record must be inside it now."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_first_50_covers_previously_unwitnessed():
    import __spark_entry__ as e

    names = list(e.queries())
    window = set(names[:50])
    prev_path = os.path.join(REPO, "CORRECTNESS_r05.json")
    prev = set(json.load(open(prev_path))) if os.path.exists(prev_path) else set()
    missing = [n for n in names if n not in prev and n not in window]
    assert not missing, (
        f"queries() registered past the driver's first-50 window without "
        f"a prior correctness row: {missing} — reorder queries() "
        f"(__spark_entry__._QUERIES_FRONT)"
    )
    # the overflow slots must only hold rows whose exclusion is
    # deliberate (documented lists), not accidental tail placement
    overflow = names[50:]
    assert set(overflow) <= set(e._QUERIES_BACK), overflow


def test_oracle_sql_names_match_queries():
    import __spark_entry__ as e

    qs, osql = set(e.queries()), set(e.oracle_sql())
    # every oracle belongs to a declared query (the driver hashes oracle
    # text per name; an orphan means a renamed/dropped query)
    assert osql <= qs, osql - qs
