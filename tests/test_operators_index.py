"""OPERATORS.md is generated from the query registry; this test
regenerates it in-memory and fails on any drift, so the committed
index always matches `queries()` / `oracle_sql()` exactly."""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_operators_md_matches_registry():
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import gen_operators
    finally:
        sys.path.pop(0)

    expected = gen_operators.generate()
    committed = (REPO / "OPERATORS.md").read_text()
    assert committed == expected, (
        "OPERATORS.md is stale — run `python tools/gen_operators.py` "
        "and commit the result"
    )

    # structural invariants: one row per registered query, every
    # oracle key is also a query key
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert expected.count("\n| `") == len(qs)
    assert set(oracles) <= set(qs)
    for name in qs:
        assert f"| `{name}` |" in expected
