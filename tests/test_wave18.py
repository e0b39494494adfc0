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


class TestRakeKeyphrases:
    def test_classic_semantics(self):
        from kgflow.ops.text import rake_keyphrases

        # "deep learning" phrase: deg(deep)=2, freq(deep)=1 -> 2e6;
        # deg(learning)=2+2=4 (two phrases of len 2), freq=2 -> 2e6
        # "machine learning": deg(machine)=2/1, learning term 2e6
        # -> both phrases score 4e6; tie broken by phrase asc
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1], dtype="int64"),
                    "text": [
                        "deep learning is the machine learning of it"
                    ],
                }
            )
        )
        out = (
            rake_keyphrases(docs, top_k=5)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert out["phrase"].tolist() == ["deep learning", "machine learning"]
        assert out["score"].tolist() == [4_000_000, 4_000_000]
        assert out["rank"].tolist() == [1, 2]

    def test_duplicate_phrase_dedup_and_stop_only_doc(self):
        from kgflow.ops.text import rake_keyphrases

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2], dtype="int64"),
                    "text": ["red fox and red fox", "the of and to"],
                }
            )
        )
        out = rake_keyphrases(docs, top_k=5).to_pandas()
        # doc 2 is all stopwords -> absent; doc 1's repeated phrase
        # appears once
        assert out["doc_id"].tolist() == [1]
        assert out["phrase"].tolist() == ["red fox"]
        # deg(red)=4, freq=2 -> 2e6; deg(fox)=4, freq=2 -> 2e6
        assert out["score"].tolist() == [4_000_000]

    def test_stoplist_matches_sql_oracle(self):
        """The oracle inlines the stoplist verbatim; pin equality so
        an edit to either side fails loudly."""
        import re

        import __ray_entry__ as entry
        from kgflow.ops.text import RAKE_STOPWORDS

        sql = entry.oracle_sql()["doc_rake"]
        m = re.search(r"w IN \(([^)]*)\)", sql)
        sql_words = re.findall(r"'([^']+)'", m.group(1))
        assert tuple(sql_words) == RAKE_STOPWORDS


class TestRrfTopk:
    def test_fusion_matches_reference(self):
        """Planted vectors where cosine and L2 disagree: q=(1,0);
        a=(10,0) is cosine-closest (sim 1.0) but L2-far; b=(0.9,0.1)
        is L2-closest. RRF must fuse both legs' ranks."""
        from kgflow.ops.ann import rrf_topk

        emb = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series([0, 1, 2, 3], dtype="int64"),
                    "embedding": [
                        np.asarray([1.0, 0.0], dtype=np.float32),   # query
                        np.asarray([10.0, 0.0], dtype=np.float32),  # a
                        np.asarray([0.9, 0.1], dtype=np.float32),   # b
                        np.asarray([-1.0, 0.0], dtype=np.float32),  # far
                    ],
                }
            )
        )
        out = (
            rrf_topk(
                emb,
                [0],
                np.asarray([[1.0, 0.0]], dtype=np.float32),
                k_each=3,
                top_k=3,
            )
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        # cosine leg: a(r1), b(r2), far(r3)
        # l2 leg (squared dists 81 / 0.02 / 4): b(r1), far(r2), a(r3)
        t = 1_000_000
        got = dict(
            zip(out["neighbor_id"].tolist(), out["rrf"].tolist())
        )
        assert got[1] == t // 61 + t // 63  # a
        assert got[2] == t // 62 + t // 61  # b
        assert got[3] == t // 63 + t // 62  # far
        # fused order: b > a > far
        assert out["neighbor_id"].tolist() == [2, 1, 3]

    def test_self_match_excluded(self):
        from kgflow.ops.ann import rrf_topk

        emb = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series([0, 1], dtype="int64"),
                    "embedding": [
                        np.asarray([1.0, 0.0], dtype=np.float32),
                        np.asarray([0.5, 0.5], dtype=np.float32),
                    ],
                }
            )
        )
        out = rrf_topk(
            emb, [0], np.asarray([[1.0, 0.0]], dtype=np.float32), top_k=5
        ).to_pandas()
        assert 0 not in out["neighbor_id"].tolist()
        assert out["neighbor_id"].tolist() == [1]


class TestFactHistory:
    def test_scd2_over_fact_stream(self):
        """The kg_fact_history composition: SCD-2 keyed by a composite
        fact string over a timestamped object stream."""
        from kgflow.ops.window import scd2_intervals

        facts = rd.from_pandas(
            pd.DataFrame(
                {
                    "fact": ["acme\x1fceo"] * 3 + ["acme\x1fhq"],
                    "obj_canonical": ["alice", "alice", "bob", "berlin"],
                    "warc_ts": pd.Series(
                        pd.to_datetime(
                            [
                                "2024-01-01",
                                "2024-02-01",
                                "2024-03-01",
                                "2024-01-15",
                            ]
                        ),
                        dtype="datetime64[us]",
                    ),
                    "tie": ["u1", "u2", "u3", "u4"],
                }
            )
        )
        out = (
            scd2_intervals(
                facts,
                key="fact",
                ts_col="warc_ts",
                id_col="tie",
                attr_col="obj_canonical",
            )
            .to_pandas()
            .sort_values(["fact", "version"])
            .reset_index(drop=True)
        )
        ceo = out[out["fact"] == "acme\x1fceo"]
        assert ceo["obj_canonical"].tolist() == ["alice", "bob"]
        assert ceo["version"].tolist() == [1, 2]
        assert ceo.iloc[0]["valid_to"] == ceo.iloc[1]["valid_from"]
        assert out[out["fact"] == "acme\x1fhq"]["version"].tolist() == [1]


class TestClusteringMetrics:
    def _run(self, pred, gold):
        from kgflow.ops.profile import clustering_metrics

        ds = rd.from_pandas(
            pd.DataFrame({"pred": pred, "gold": gold}, dtype=object)
        )
        return clustering_metrics(ds).to_pandas().iloc[0]

    def test_perfect_clustering(self):
        r = self._run(["a", "a", "b", "b"], ["x", "x", "y", "y"])
        s = 1_000_000_000
        assert r["n_items"] == 4
        assert r["b3_p_fp"] == 4 * s and r["b3_r_fp"] == 4 * s
        assert (r["pair_tp"], r["pair_fp"], r["pair_fn"]) == (2, 0, 0)

    def test_over_merged(self):
        # one predicted cluster over two gold clusters of 2:
        # P_i = 2/4 each -> b3_p = 4 * s/2; recall perfect
        r = self._run(["a"] * 4, ["x", "x", "y", "y"])
        s = 1_000_000_000
        assert r["b3_p_fp"] == 4 * (s // 2)
        assert r["b3_r_fp"] == 4 * s
        # pairs: tp = 2 (within-gold), fp = 6 - 2, fn = 0
        assert (r["pair_tp"], r["pair_fp"], r["pair_fn"]) == (2, 4, 0)

    def test_over_split(self):
        # singletons vs one gold cluster of 3: precision 1, R_i = 1/3
        r = self._run(["a", "b", "c"], ["x", "x", "x"])
        s = 1_000_000_000
        assert r["b3_p_fp"] == 3 * s
        assert r["b3_r_fp"] == 3 * (s // 3)
        assert (r["pair_tp"], r["pair_fp"], r["pair_fn"]) == (0, 0, 3)


class TestSnaiveBacktest:
    def test_lag_join_semantics(self):
        from kgflow.ops.window import snaive_backtest

        # type A: days 0,1,7,8 with counts 2,1,3,1
        # -> scored days: 7 (fc=2, err 1), 8 (fc=1, err 0)
        rows = []
        eid = 0
        for day, cnt in [(0, 2), (1, 1), (7, 3), (8, 1)]:
            for _ in range(cnt):
                rows.append(
                    (
                        eid,
                        1,
                        str(
                            pd.Timestamp("2024-01-01")
                            + pd.Timedelta(days=day, hours=eid % 3)
                        ),
                        "A",
                    )
                )
                eid += 1
        ev = _ev(rows)
        out = snaive_backtest(ev, season_days=7).to_pandas()
        assert out.to_dict("records") == [
            {
                "event_type": "A",
                "n_days": 2,
                "sum_abs_err": 1,
                "sum_actual": 4,
            }
        ]


class TestPersonalizedPagerank:
    """Seeded teleport vector vs a dense power iteration with the same
    personalization — both the driver-resident fast path (default) and
    the forced distributed path (NODE_BROADCAST_LIMIT=0)."""

    EDGES = [
        (1, 2), (1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (3, 5), (2, 5),
        (6, 1), (6, 5),
    ]

    @staticmethod
    def _dense_ppr(edges, seeds, d=0.85, iters=10):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        V = len(nodes)
        out = np.zeros(V)
        for u, _ in edges:
            out[idx[u]] += 1
        p = np.zeros(V)
        for s in seeds:
            p[idx[s]] = 1.0 / len(seeds)
        r = p.copy()
        for _ in range(iters):
            dm = r[out == 0].sum()
            contrib = np.zeros(V)
            for u, v in edges:
                contrib[idx[v]] += r[idx[u]] / out[idx[u]]
            r = ((1 - d) + d * dm) * p + d * contrib
        return dict(zip(nodes, r))

    def _check(self, got, seeds):
        want = self._dense_ppr(self.EDGES, seeds)
        assert set(got) == set(want)
        for n, r in want.items():
            assert abs(got[n] - r) < 1e-9, (n, got[n], r)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        # mass concentrates near the seeds vs classic pagerank
        assert got[seeds[0]] > 1.0 / len(want)

    def test_driver_path_matches_dense(self):
        from kgflow.ops.graph import pagerank

        df = pd.DataFrame(self.EDGES, columns=["src", "dst"])
        got = (
            pagerank(rd.from_pandas(df).repartition(3), iters=10, seeds=[1, 6])
            .to_pandas()
            .set_index("node")["rank"]
            .to_dict()
        )
        self._check(got, [1, 6])

    def test_distributed_path_matches_dense(self, monkeypatch):
        import kgflow.ops.graph as G

        monkeypatch.setattr(G, "NODE_BROADCAST_LIMIT", 0)
        df = pd.DataFrame(self.EDGES, columns=["src", "dst"])
        got = (
            G.pagerank(rd.from_pandas(df).repartition(3), iters=10, seeds=[1, 6])
            .to_pandas()
            .set_index("node")["rank"]
            .to_dict()
        )
        self._check(got, [1, 6])

    def test_unknown_seed_raises(self):
        from kgflow.ops.graph import pagerank

        df = pd.DataFrame(self.EDGES, columns=["src", "dst"])
        with pytest.raises(ValueError, match="no seed"):
            pagerank(rd.from_pandas(df), iters=2, seeds=[99]).to_pandas()


class TestHoltSmooth:
    def test_recurrence_and_zero_fill(self):
        from kgflow.ops.window import holt_smooth

        # type A: days 0 (2 events), 2 (1 event) -> dense grid day 1
        # zero-filled; hand recurrence with scale 1000:
        # t1: l=2000 b=0 ; t2: v=0 -> l=(0+2000+0)//2=1000,
        # b=((1000-2000)+0) div 2 = -500 (TRUNCATING)
        # t3: v=1 -> l=(1000+1000-500)//2=750, b=((750-1000)-500) div 2 = -375
        ev = _ev(
            [
                (1, 1, "2024-01-01 05:00:00", "A"),
                (2, 1, "2024-01-01 06:00:00", "A"),
                (3, 1, "2024-01-03 07:00:00", "A"),
            ]
        )
        out = (
            holt_smooth(ev)
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert out["level_fp"].tolist() == [2000, 1000, 750]
        assert out["trend_fp"].tolist() == [0, -500, -375]

    def test_trunc_div_matches_sql(self):
        from kgflow.ops.window import _trunc_div2

        x = np.array([-3, 3, -4, 4, -1, 1, 0])
        # DuckDB `//` truncates toward zero
        assert _trunc_div2(x).tolist() == [-1, 1, -2, 2, 0, 0, 0]


class TestMarkovBacktest:
    def test_split_argmax_and_scoring(self):
        from kgflow.ops.window import markov_backtest

        # user 1 stream (ids chosen so parity drives the split):
        # pairs: (a->b id2 even: train), (b->a id3 odd: test),
        #        (a->b id4 even: train), (b->c id5 odd: test),
        #        (c->b id6 even: train), (b->b id8 even: train),
        #        (b->a id9 odd: test)
        rows = [
            (1, 1, "2024-01-01 00:00:01", "a"),
            (2, 1, "2024-01-01 00:00:02", "b"),
            (3, 1, "2024-01-01 00:00:03", "a"),
            (4, 1, "2024-01-01 00:00:04", "b"),
            (5, 1, "2024-01-01 00:00:05", "c"),
            (6, 1, "2024-01-01 00:00:06", "b"),
            (8, 1, "2024-01-01 00:00:07", "b"),
            (9, 1, "2024-01-01 00:00:08", "a"),
        ]
        ev = _ev(rows)
        out = (
            markov_backtest(ev)
            .to_pandas()
            .sort_values("from_type")
            .reset_index(drop=True)
        )
        # train pairs: a->b, a->b, c->b, b->b  => pred[a]=b, pred[b]=b,
        # pred[c]=b; test pairs: b->a, b->c, b->a (all from b)
        assert out.to_dict("records") == [
            {
                "from_type": "b",
                "predicted": "b",
                "n_test": 3,
                "n_correct": 0,
            }
        ]

    def test_cross_user_no_adjacency(self):
        from kgflow.ops.window import markov_backtest

        # one event per user -> no pairs at all
        ev = _ev(
            [
                (1, 1, "2024-01-01 00:00:01", "a"),
                (2, 2, "2024-01-01 00:00:02", "b"),
                (3, 3, "2024-01-01 00:00:03", "a"),
            ]
        )
        out = markov_backtest(ev).to_pandas()
        assert len(out) == 0


class TestLateArrivals:
    def test_watermark_accounting(self):
        from kgflow.ops.window import late_arrivals

        # arrival order == event_id; watermark 60s.
        # id1 ts=100s -> no prior; id2 ts=200s -> prior max 100, wm 40,
        # on time; id3 ts=130s -> prior max 200, wm 140, LATE by 10s;
        # id4 ts=139s -> prior max still 200, wm 140, LATE by 1s;
        # id5 ts=141s -> on time (strict <)
        base = pd.Timestamp("2024-01-01")

        def at(s):
            return str(base + pd.Timedelta(seconds=s))

        ev = _ev(
            [
                (1, 7, at(100), "x"),
                (2, 7, at(200), "x"),
                (3, 7, at(130), "x"),
                (4, 7, at(139), "x"),
                (5, 7, at(141), "x"),
                (6, 8, at(50), "x"),
            ]
        )
        out = (
            late_arrivals(ev, watermark_s=60)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out.to_dict("records") == [
            {
                "user_id": 7,
                "n_events": 5,
                "n_late": 2,
                "max_lateness_s": 10,
            },
            {
                "user_id": 8,
                "n_events": 1,
                "n_late": 0,
                "max_lateness_s": 0,
            },
        ]


class TestExpectationSuite:
    def test_all_check_families_and_planted_violations(self):
        from kgflow.ops.checks import expectation_suite

        child = rd.from_pandas(
            pd.DataFrame(
                {
                    "k": pd.Series([1, 1, 2, 3, 3, 3], dtype="int64"),
                    "v": pd.Series(
                        [1.0, -2.0, 3.0, None, 5.0, -1.0], dtype="float64"
                    ),
                    "fk": pd.Series([10, 10, 11, 99, 98, 10], dtype="int64"),
                }
            )
        )
        parent = rd.from_pandas(
            pd.DataFrame({"p": pd.Series([10, 11], dtype="int64")})
        )
        out = (
            expectation_suite(
                child,
                unique=[["k"]],
                rules={
                    "not_null:v": lambda df: df["v"].isna().to_numpy(),
                    "nonneg:v": lambda df: (
                        df["v"].to_numpy(dtype=np.float64) < 0
                    ),
                },
                fks=[("fk:fk->parent", "fk", parent, "p")],
            )
            .to_pandas()
            .set_index("rule")["n_violations"]
            .to_dict()
        )
        assert out == {
            "fk:fk->parent": 2,   # 99, 98
            "nonneg:v": 2,        # -2, -1 (NaN < 0 is False)
            "not_null:v": 1,
            "unique:k": 3,        # k=1 surplus 1, k=3 surplus 2
        }

    def test_empty_suite_raises(self):
        from kgflow.ops.checks import expectation_suite

        ds = rd.from_pandas(pd.DataFrame({"a": [1]}))
        with pytest.raises(ValueError, match="no checks"):
            expectation_suite(ds)


class TestRandomProjection:
    def test_exact_integer_projection_and_jl_property(self):
        from kgflow.ops.ann import random_projection
        from kgflow.ops.sketch import _fnv1a_strings

        rng = np.random.RandomState(7)
        X = rng.randn(40, 64).astype(np.float32)
        emb = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series(range(40), dtype="int64"),
                    "embedding": [X[i] for i in range(40)],
                }
            )
        )
        out = random_projection(emb, k=16).to_pandas()
        assert len(out) == 40 * 16
        # exact reference: same quantize-first int matmul
        keys = np.array(
            [f"{i}|{j}" for i in range(1, 65) for j in range(1, 17)],
            dtype=str,
        )
        S = np.where(
            (_fnv1a_strings(keys).reshape(64, 16) & np.uint64(1)) == 1,
            1,
            -1,
        ).astype(np.int64)
        Xq = np.floor(X.astype(np.float64) * 10000).astype(np.int64)
        want = Xq @ S
        got = (
            out.sort_values(["vec_id", "rp_dim"])["y"]
            .to_numpy()
            .reshape(40, 16)
        )
        assert (got == want).all()
        # JL sanity: projected squared distances approximate k/dim-scaled
        # originals on average (loose factor-2 band)
        d_orig = ((Xq[0] - Xq[1:]) ** 2).sum(axis=1).astype(np.float64)
        d_proj = ((want[0] - want[1:]) ** 2).sum(axis=1).astype(np.float64)
        ratio = (d_proj / d_orig).mean() / 16.0
        assert 0.5 < ratio < 2.0


class TestGazetteerSpot:
    def test_positions_lengths_and_boundaries(self):
        from kgflow.ops.text import gazetteer_spot

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2], dtype="int64"),
                    "text": [
                        "the Hash  Join beats a hash join here",
                        # ends with the phrase prefix: the window must
                        # not cross into doc 1's tokens
                        "always use hash",
                    ],
                }
            )
        )
        lex = rd.from_pandas(
            pd.DataFrame({"phrase": ["hash join", "hash", "beats a hash"]})
        )
        out = (
            gazetteer_spot(docs, lex)
            .to_pandas()
            .sort_values(["doc_id", "pos", "phrase"])
            .reset_index(drop=True)
        )
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == [
            (1, 2, "hash"),            # "Hash" lowercased
            (1, 2, "hash join"),
            (1, 4, "beats a hash"),
            (1, 6, "hash"),
            (1, 6, "hash join"),
            (2, 3, "hash"),
        ]

    def test_empty_lexicon(self):
        from kgflow.ops.text import gazetteer_spot

        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([1], dtype="int64"), "text": ["a b"]}
            )
        )
        lex = rd.from_pandas(pd.DataFrame({"phrase": pd.Series([], dtype=object)}))
        assert len(gazetteer_spot(docs, lex).to_pandas()) == 0
