"""Wave-76 session additions: linear multi-touch attribution, SCD-2
dimension history, anchor-text alias mining. The two events queries
get their exact gate from the driver sweep (test_entry
auto-parametrizes their DuckDB oracles); these tests pin the window
edge semantics and planted-input behavior the oracles cannot isolate
— strict window bounds, zero-touch conversions, run collapse across
equal timestamps, alias normalization and tie-breaking."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgflow.ops.web import anchor_aliases
from kgflow.ops.window import linear_attribution, scd2_intervals


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _ev(rows):
    """rows: (event_id, user_id, ts_str, event_type)"""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "user_id": pd.Series([r[1] for r in rows], dtype="int64"),
                "ts": pd.Series(
                    [pd.Timestamp(r[2]) for r in rows],
                    dtype="datetime64[us]",
                ),
                "event_type": pd.Series(
                    [r[3] for r in rows], dtype=object
                ),
            }
        )
    )


class TestLinearAttribution:
    def test_strict_window_bounds(self):
        # lookback 60s; conversion at :02:00.
        # - touch at :02:00 (== c.ts) excluded (strict <)
        # - touch at :01:00 (== c.ts - lookback) excluded (strict >)
        # - touch at :01:30 included
        ev = _ev(
            [
                (1, 7, "2024-01-01 00:01:00", "click"),
                (2, 7, "2024-01-01 00:01:30", "view"),
                (3, 7, "2024-01-01 00:02:00", "click"),
                (4, 7, "2024-01-01 00:02:00", "purchase"),
            ]
        )
        out = linear_attribution(ev, lookback_s=60).to_pandas()
        assert out.to_dict("records") == [
            {"event_type": "view", "n_touches": 1, "credit": 1_000_000}
        ]

    def test_floor_split_and_multiuser(self):
        # user 1: conversion with 3 touches -> each floor(1e6/3)=333333
        # user 2: conversion with 0 touches -> contributes nothing
        ev = _ev(
            [
                (1, 1, "2024-01-01 00:00:10", "click"),
                (2, 1, "2024-01-01 00:00:20", "click"),
                (3, 1, "2024-01-01 00:00:30", "view"),
                (4, 1, "2024-01-01 00:00:40", "purchase"),
                (5, 2, "2024-01-01 00:00:40", "purchase"),
                # user 2 touch AFTER its conversion: not credited
                (6, 2, "2024-01-01 00:00:50", "click"),
            ]
        )
        out = (
            linear_attribution(ev, lookback_s=3600)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert out.to_dict("records") == [
            {"event_type": "click", "n_touches": 2, "credit": 666_666},
            {"event_type": "view", "n_touches": 1, "credit": 333_333},
        ]

    def test_cross_user_isolation(self):
        # touches belong to a DIFFERENT user than the conversion
        ev = _ev(
            [
                (1, 1, "2024-01-01 00:00:10", "click"),
                (2, 2, "2024-01-01 00:00:20", "purchase"),
            ]
        )
        out = linear_attribution(ev, lookback_s=3600).to_pandas()
        assert len(out) == 0

    def test_overlapping_conversions_share_touches(self):
        # two conversions of the same user both see the one touch
        ev = _ev(
            [
                (1, 3, "2024-01-01 00:00:10", "view"),
                (2, 3, "2024-01-01 00:00:20", "purchase"),
                (3, 3, "2024-01-01 00:00:30", "purchase"),
            ]
        )
        out = linear_attribution(ev, lookback_s=3600).to_pandas()
        assert out.to_dict("records") == [
            {"event_type": "view", "n_touches": 2, "credit": 2_000_000}
        ]


class TestScd2Intervals:
    def test_run_collapse_and_sentinel(self):
        ev = _ev(
            [
                (1, 1, "2024-01-01 00:00:00", "a"),
                (2, 1, "2024-01-01 00:01:00", "a"),
                (3, 1, "2024-01-01 00:02:00", "b"),
                (4, 1, "2024-01-01 00:03:00", "a"),
                (5, 2, "2024-01-01 00:00:30", "a"),
            ]
        )
        out = (
            scd2_intervals(ev, attr_col="event_type")
            .to_pandas()
            .sort_values(["user_id", "version"])
            .reset_index(drop=True)
        )
        assert out["version"].tolist() == [1, 2, 3, 1]
        assert out["event_type"].tolist() == ["a", "b", "a", "a"]
        assert out.loc[0, "valid_from"] == pd.Timestamp(
            "2024-01-01 00:00:00"
        )
        # closed runs chain: valid_to == next run's valid_from
        assert out.loc[0, "valid_to"] == out.loc[1, "valid_from"]
        assert out.loc[1, "valid_to"] == out.loc[2, "valid_from"]
        # open runs carry the far-future sentinel
        sent = pd.Timestamp("2999-12-31 00:00:00")
        assert out.loc[2, "valid_to"] == sent
        assert out.loc[3, "valid_to"] == sent

    def test_equal_ts_ordered_by_event_id(self):
        # same timestamp: event_id breaks the tie, so the run order is
        # deterministic (a then b -> two runs, not one)
        ev = _ev(
            [
                (2, 1, "2024-01-01 00:00:00", "b"),
                (1, 1, "2024-01-01 00:00:00", "a"),
            ]
        )
        out = (
            scd2_intervals(ev)
            .to_pandas()
            .sort_values("version")
            .reset_index(drop=True)
        )
        assert out["event_type"].tolist() == ["a", "b"]
        assert out["version"].tolist() == [1, 2]


class TestAnchorAliases:
    def _pages(self):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "url": [f"https://s{i}.ex/p" for i in range(6)],
                    "html": [
                        # normalization folds case + whitespace; the
                        # #fragment canonicalizes onto the same target
                        b'<a href="https://T.ex/a">Alpha Corp</a>'
                        b'<a href="https://t.ex/a#f">alpha  corp</a>',
                        b'<a href="https://t.ex/a">Alpha</a>',
                        b'<a href="https://t.ex/a">ALPHA CORP</a>',
                        b'<a href="https://t.ex/a">Alpha</a>'
                        b'<a href="https://u.ex/b">Beta</a>',
                        b'<a href="https://t.ex/a">zeta</a>',
                        b'<a href="https://u.ex/b">beta</a>',
                    ],
                }
            )
        )

    def test_normalize_rank_topk(self):
        out = (
            anchor_aliases(self._pages(), top_k=2)
            .to_pandas()
            .sort_values(["target", "rank"])
            .reset_index(drop=True)
        )
        got = [
            tuple(r)
            for r in out[
                ["target", "alias", "n_anchor", "rank"]
            ].itertuples(index=False)
        ]
        assert got == [
            ("https://t.ex/a", "alpha corp", 3, 1),
            ("https://t.ex/a", "alpha", 2, 2),
            ("https://u.ex/b", "beta", 2, 1),
        ]

    def test_count_tie_breaks_by_alias_ascending(self):
        pages = rd.from_pandas(
            pd.DataFrame(
                {
                    "url": ["https://x.ex/1", "https://x.ex/2"],
                    "html": [
                        b'<a href="https://t.ex/z">bbb</a>',
                        b'<a href="https://t.ex/z">aaa</a>',
                    ],
                }
            )
        )
        out = (
            anchor_aliases(pages, top_k=1)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert out["alias"].tolist() == ["aaa"]

    def test_min_count_filters(self):
        out = anchor_aliases(self._pages(), top_k=5, min_count=2).to_pandas()
        assert set(out["alias"]) == {"alpha corp", "alpha", "beta"}
        assert (out["n_anchor"] >= 2).all()
