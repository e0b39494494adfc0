"""Wave 19: gazetteer mentions wired into the KG pipeline.

`kg_gazetteer_mentions` is rows-only at the driver (the pages fixture
is not a DuckDB view), so this file pins its EXACT output at sf0.001
against an independent brute-force token-window scan of the same
sentence stream.
"""

import os
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


SF = "/root/testdata/sf0.001"


class TestKgGazetteerMentions:
    def test_exact_vs_bruteforce(self):
        import __ray_entry__ as entry
        from kgflow.fixtures.pages import pages_for_sf_dir
        from kgflow.pipelines.kg import read_pages, sentences_ds

        got = (
            entry.queries()["kg_gazetteer_mentions"](SF)
            .to_pandas()
            .sort_values(["url", "sent_id", "pos", "mention"])
            .reset_index(drop=True)
        )

        pages = pages_for_sf_dir(SF)
        gold = pq.read_table(
            os.path.join(pages, "gold_clusters.parquet")
        ).to_pandas()
        lex: dict[str, str] = {}
        for m, e in zip(gold["mention"], gold["entity"]):
            p = re.sub(r"[^0-9a-z]+", " ", str(m).lower()).strip()
            lex.setdefault(p, e)
        lengths = sorted({p.count(" ") + 1 for p in lex})

        sents = sentences_ds(read_pages(pages)).to_pandas()
        rows = []
        for url, sid, text in zip(
            sents["url"], sents["sent_id"], sents["text"]
        ):
            toks = re.findall(r"\w+", str(text).lower())
            for L in lengths:
                for i in range(len(toks) - L + 1):
                    g = " ".join(toks[i : i + L])
                    if g in lex:
                        rows.append((url, sid, i + 1, g, lex[g]))
        want = (
            pd.DataFrame(
                rows,
                columns=["url", "sent_id", "pos", "mention", "entity"],
            )
            .sort_values(["url", "sent_id", "pos", "mention"])
            .reset_index(drop=True)
        )

        assert len(got) == len(want) and len(got) > 0
        pd.testing.assert_frame_equal(
            got.astype({"sent_id": "int64", "pos": "int64"}), want
        )
        # the recall channel must surface multi-word and typo aliases,
        # not just single-token canonical names
        assert (got["mention"].str.contains(" ")).any()
        assert (got["mention"] != got["entity"]).any()


class TestPowerIterationScatter:
    def test_converges_to_dominant_eigvec(self):
        import numpy as np
        import ray.data as rd

        from kgflow.ops.ann import power_iteration_scatter

        # planted dominant direction + small noise: the exact-integer
        # recurrence must land on the eigh answer up to sign
        rng = np.random.RandomState(7)
        u = rng.randn(16)
        u /= np.linalg.norm(u)
        X = np.outer(rng.randn(300) * 3.0, u) + 0.1 * rng.randn(300, 16)
        emb = rd.from_pandas(
            pd.DataFrame({"embedding": [r.astype(np.float32) for r in X]})
        )
        got = (
            power_iteration_scatter(emb, iters=100)
            .to_pandas()
            .sort_values("i")["v"]
            .to_numpy(dtype=np.float64)
        )
        Xq = np.floor(X.astype(np.float32).astype(np.float64) * 100)
        A = Xq.T @ Xq
        _, v = np.linalg.eigh(A)
        cos = abs(got @ v[:, -1]) / np.linalg.norm(got)
        assert cos > 0.999

    def test_overflow_guard_raises(self):
        import numpy as np
        import ray.data as rd

        from kgflow.ops.ann import power_iteration_scatter

        X = np.full((50, 8), 9.0e5, dtype=np.float32)
        emb = rd.from_pandas(
            pd.DataFrame({"embedding": [r for r in X]})
        )
        with pytest.raises(OverflowError):
            power_iteration_scatter(emb, iters=3, quant=10000)


class TestLshTopkHashed:
    def test_planted_duplicate_always_found(self):
        import numpy as np
        import ray.data as rd

        from kgflow.ops.ann import lsh_topk_hashed

        # an exact duplicate shares every signature in every table, so
        # it is ALWAYS a candidate and must rank first by cosine
        rng = np.random.RandomState(11)
        X = rng.randn(200, 16).astype(np.float32)
        X[137] = X[0]
        emb = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": pd.Series(range(200), dtype="int64"),
                    "embedding": [r for r in X],
                }
            )
        )
        out = lsh_topk_hashed(emb, [0], X[[0]], k=3).to_pandas()
        assert 137 in set(out["neighbor_id"])
        top = out.sort_values(
            ["cos", "neighbor_id"], ascending=[False, False]
        ).iloc[0]
        assert top["neighbor_id"] == 137


class TestSkyline:
    def _run(self, rows):
        import ray.data as rd

        from kgflow.ops.relational import skyline

        df = pd.DataFrame(rows, columns=["id", "price", "size"])
        out = (
            skyline(rd.from_pandas(df), "price", "size")
            .to_pandas()
            .sort_values("id")["id"]
            .tolist()
        )
        return out

    def test_dominance_ties_and_duplicates(self):
        # (1) frontier point, (2) dominated by 1 on both axes,
        # (3) equal price as 1 but smaller size -> dominated,
        # (4) exact duplicate of 1 -> both survive,
        # (5) cheaper but smaller -> frontier,
        # (6) same size as 5, higher price -> dominated by 5
        rows = [
            (1, 10.0, 8),
            (2, 11.0, 7),
            (3, 10.0, 5),
            (4, 10.0, 8),
            (5, 4.0, 3),
            (6, 6.0, 3),
        ]
        assert self._run(rows) == [1, 4, 5]

    def test_guard_on_data_sized_frontier(self):
        import ray.data as rd

        from kgflow.ops.relational import skyline

        # bigger always costs more: no row dominates any other, so the
        # frontier is the whole input — the guard must refuse
        df = pd.DataFrame(
            {
                "id": range(100),
                "price": np.arange(100, dtype=np.float64),
                "size": np.arange(100, dtype=np.int64),
            }
        )
        with pytest.raises(ValueError, match="max_candidates"):
            skyline(
                rd.from_pandas(df), "price", "size", max_candidates=50
            ).to_pandas()


class TestCdcApply:
    def test_insert_update_delete_passthrough(self):
        import ray.data as rd

        from kgflow.ops.relational import cdc_apply

        base = rd.from_pandas(
            pd.DataFrame(
                {
                    "k": pd.Series([1, 2, 3, 4], dtype="int64"),
                    "v": pd.Series([10, 20, 30, 40], dtype="int64"),
                }
            )
        )
        changes = rd.from_pandas(
            pd.DataFrame(
                {
                    "k": pd.Series([2, 2, 3, 5, 5], dtype="int64"),
                    "seq": pd.Series([0, 7, 1, 2, 9], dtype="int64"),
                    "op": ["U", "U", "D", "U", "D"],
                    "v": pd.Series([21, 22, 0, 50, 0], dtype="int64"),
                }
            )
        )
        got = (
            cdc_apply(base, changes, "k", "seq", "op", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # 1 passes through; 2 takes the max-seq update (22); 3 deleted;
        # 4 passes through; 5 inserted then deleted -> absent
        want = pd.DataFrame(
            {"k": pd.Series([1, 2, 4], dtype="int64"),
             "v": pd.Series([10, 22, 40], dtype="int64")}
        )
        pd.testing.assert_frame_equal(
            got.astype({"k": "int64", "v": "int64"}), want
        )

    def test_negative_seq_rejected(self):
        import ray.data as rd

        from kgflow.ops.relational import cdc_apply

        base = rd.from_pandas(
            pd.DataFrame({"k": pd.Series([1], dtype="int64"),
                          "v": pd.Series([1], dtype="int64")})
        )
        changes = rd.from_pandas(
            pd.DataFrame(
                {"k": pd.Series([1], dtype="int64"),
                 "seq": pd.Series([-5], dtype="int64"),
                 "op": ["U"], "v": pd.Series([2], dtype="int64")}
            )
        )
        with pytest.raises(Exception, match="seq values must be >= 0"):
            cdc_apply(base, changes, "k", "seq", "op", "v").to_pandas()


class TestZonemapIndex:
    def _table(self, tmp_path):
        import pyarrow as pa

        root = str(tmp_path / "facts")
        # partition p holds keys [1000*p, 1000*p + 50); partition 3 empty
        for p in range(4):
            d = os.path.join(root, f"zpart={p}")
            os.makedirs(d)
            n = 0 if p == 3 else 50
            t = pa.table(
                {"k": pa.array(range(1000 * p, 1000 * p + n), pa.int64()),
                 "v": pa.array([p] * n, pa.int64())}
            )
            pq.write_table(t, os.path.join(d, "part.parquet"))
        return root

    def test_lookup_prunes_and_never_misses(self, tmp_path):
        from kgflow.materialize.zonemap import (
            build_zonemap_index,
            zonemap_lookup,
        )

        root = self._table(tmp_path)
        recs = build_zonemap_index(root, "k")
        assert [r["n_rows"] for r in recs] == [50, 50, 50, 0]
        assert recs[1]["lo"] == 1000 and recs[1]["hi"] == 1049
        # a range inside partition 1 prunes to exactly that partition
        assert zonemap_lookup(root, "k", 1010, 1020) == ["zpart=1"]
        # spanning the 0/1 boundary returns both, never fewer
        assert zonemap_lookup(root, "k", 40, 1005) == [
            "zpart=0",
            "zpart=1",
        ]
        # a gap range (between partitions) and the empty partition
        # overlap nothing
        assert zonemap_lookup(root, "k", 60, 900) == []
        assert zonemap_lookup(root, "k", 3000, 3100) == []

    def test_pruned_read_is_exact(self, tmp_path):
        from kgflow.materialize.zonemap import (
            build_zonemap_index,
            read_range_pruned,
        )

        root = self._table(tmp_path)
        build_zonemap_index(root, "k")
        got = (
            read_range_pruned(root, "k", 1040, 2010)
            .to_pandas()
            .sort_values("k")["k"]
            .tolist()
        )
        assert got == list(range(1040, 1050)) + list(range(2000, 2011))
        # empty overlap -> empty dataset, no files touched
        assert len(read_range_pruned(root, "k", 60, 900).to_pandas()) == 0

    def test_missing_index_is_loud(self, tmp_path):
        from kgflow.materialize.zonemap import zonemap_lookup

        root = self._table(tmp_path)
        with pytest.raises(FileNotFoundError, match="build_zonemap_index"):
            zonemap_lookup(root, "k", 0, 10)

    def test_query_pruning_efficacy(self):
        import __ray_entry__ as entry
        from kgflow.materialize.zonemap import zonemap_lookup

        # driver query stages 8 key-range partitions; the 10% probe
        # must touch at most 2 of them
        out = entry.queries()["orders_range_pruned"](SF).to_pandas()
        assert len(out) > 0
        import glob as _glob
        import tempfile

        root = [
            d
            for d in _glob.glob(
                os.path.join(tempfile.gettempdir(), "kgflow_zonemap_orders_*")
            )
            if os.path.isdir(d)
        ]
        assert root, "staged layout missing"
        # recompute the probe bounds the query used
        t = pq.read_table(
            os.path.join(SF, "orders.parquet"), columns=["o_orderkey"]
        )["o_orderkey"]
        kmin, kmax = min(t.to_pylist()), max(t.to_pylist())
        span = kmax - kmin
        lo, hi = kmin + span // 10, kmin + (2 * span) // 10
        for r in root:
            parts = zonemap_lookup(r, "o_orderkey", lo, hi)
            total = len(_glob.glob(os.path.join(r, "zpart=*")))
            assert total == 8 and len(parts) <= 2


class TestReadExamplesQuarantine:
    def test_split_reasons_and_contiguous_ids(self, tmp_path):
        import json as _json

        from kgflow.sources.jsonl import read_examples_quarantine

        f1 = tmp_path / "a.jsonl"
        f1.write_text(
            "\n".join(
                [
                    _json.dumps({"text": "good one", "spo_list": []}),
                    "{not json",
                    _json.dumps({"notext": 1}),
                    _json.dumps({"text": 42}),
                    _json.dumps(
                        {
                            "text": "good two",
                            "spo_list": [
                                {"subject": "a", "predicate": "p",
                                 "object": "b"}
                            ],
                        }
                    ),
                    "",
                ]
            )
        )
        f2 = tmp_path / "b.jsonl"
        f2.write_text(
            _json.dumps({"text": "good three", "spo_list": []}) + "\n"
        )
        good, bad = read_examples_quarantine(str(tmp_path))
        g = good.to_pandas().sort_values("text_id").reset_index(drop=True)
        b = bad.to_pandas().sort_values(["path", "line_no"]).reset_index(
            drop=True
        )
        assert g["text_id"].tolist() == [0, 1, 2]
        assert g["text"].tolist() == ["good one", "good two", "good three"]
        assert g["spo"][1][0]["predicate"] == "p"
        assert b["reason"].tolist() == [
            "invalid_json",
            "bad_schema",
            "bad_schema",
        ]
        assert b["line_no"].tolist() == [2, 3, 4]
        assert b["snippet"].iloc[0] == "{not json"

    def test_matches_silent_reader_on_good_rows(self, tmp_path):
        import json as _json

        from kgflow.sources.jsonl import (
            read_examples,
            read_examples_quarantine,
        )

        f = tmp_path / "c.jsonl"
        f.write_text(
            "\n".join(
                [
                    _json.dumps({"text": f"t{i}", "spo_list": []})
                    if i % 3
                    else "broken"
                    for i in range(10)
                ]
            )
        )
        good, _ = read_examples_quarantine(str(f))
        silent = read_examples(str(f))
        a = good.to_pandas().sort_values("text_id").reset_index(drop=True)
        c = silent.to_pandas().sort_values("text_id").reset_index(drop=True)
        assert a["text"].tolist() == c["text"].tolist()
        assert a["text_id"].tolist() == c["text_id"].tolist()


class TestReadParquetEvolved:
    def _shards(self, tmp_path):
        import pyarrow as pa

        d = str(tmp_path / "corpus")
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([1, 2], pa.int32()),
                    "a": pa.array([1.0, 2.0], pa.float32()),
                }
            ),
            os.path.join(d, "s1.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([3], pa.int64()),
                    "b": pa.array(["x"], pa.string()),
                }
            ),
            os.path.join(d, "s2.parquet"),
        )
        return d

    def test_union_widen_and_nulls(self, tmp_path):
        from kgflow.sources.parquet import read_parquet_evolved

        d = self._shards(tmp_path)
        df = (
            read_parquet_evolved(d)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert df["id"].tolist() == [1, 2, 3]
        assert df["b"].tolist()[:2] == [None, None] and df["b"][2] == "x"
        assert pd.isna(df["a"][2]) and df["a"][0] == 1.0

    def test_projection_and_loud_failures(self, tmp_path):
        import pyarrow as pa

        from kgflow.sources.parquet import read_parquet_evolved

        d = self._shards(tmp_path)
        assert len(read_parquet_evolved(d, columns=["id"]).to_pandas()) == 3
        with pytest.raises(KeyError, match="in no shard"):
            read_parquet_evolved(d, columns=["zzz"])
        pq.write_table(
            pa.table({"id": pa.array(["oops"], pa.string())}),
            os.path.join(d, "s3.parquet"),
        )
        with pytest.raises(TypeError, match="column 'id'"):
            read_parquet_evolved(d)


class TestIncrementalCounts:
    def _shards(self, tmp_path, spec):
        import pyarrow as pa

        paths = []
        for name, langs in spec.items():
            p = str(tmp_path / f"{name}.parquet")
            pq.write_table(pa.table({"lang": pa.array(langs)}), p)
            paths.append(p)
        return paths

    def test_two_steps_equal_one_and_idempotent(self, tmp_path):
        from kgflow.materialize.incremental import incremental_counts

        a, b = self._shards(
            tmp_path,
            {"a": ["en", "en", "de"], "b": ["en", "fr", "fr"]},
        )
        s1 = str(tmp_path / "state1")
        # step-wise: a then a+b (a skipped the second time)
        incremental_counts(s1, [a], ["lang"])
        two = (
            incremental_counts(s1, [a, b], ["lang"])
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        # one shot over both
        s2 = str(tmp_path / "state2")
        one = (
            incremental_counts(s2, [a, b], ["lang"])
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(two, one)
        assert two.set_index("lang")["n"].to_dict() == {
            "de": 1,
            "en": 3,
            "fr": 2,
        }
        # re-offering everything is a no-op returning the same state
        again = (
            incremental_counts(s1, [a, b], ["lang"])
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(again, two)
        import json as _json

        cur = _json.load(open(os.path.join(s1, "CURRENT")))
        assert cur["version"] == 2 and len(cur["processed"]) == 2

    def test_empty_state_no_shards_is_loud(self, tmp_path):
        from kgflow.materialize.incremental import incremental_counts

        with pytest.raises(ValueError, match="no new shards"):
            incremental_counts(str(tmp_path / "s"), [], ["lang"])


class TestStageTimes:
    def test_parses_real_stats(self):
        import ray.data as rd

        from kgflow.ops.diagnose import stage_times

        ds = rd.range(50000).map_batches(
            lambda df: df, batch_format="pandas"
        ).materialize()
        t = stage_times(ds.stats())
        assert len(t) >= 1
        r = t.iloc[0]
        assert r["n_tasks"] >= 1 and r["rows_out"] == 50000
        assert r["remote_wall_s"] > 0 and r["udf_s"] > 0
        # summed remote seconds use real units (not raw ms numbers)
        assert r["remote_wall_s"] < 60

    def test_tolerates_garbage(self):
        from kgflow.ops.diagnose import stage_times

        assert len(stage_times("no operators here")) == 0


class TestTypeViolationCounts:
    def test_planted_violations_and_unknowns(self):
        import ray.data as rd

        from kgflow.ops.web import type_violation_counts

        tri = rd.from_pandas(
            pd.DataFrame(
                {
                    "rel": [
                        "born_in", "born_in", "born_in",
                        "works_for", "mystery_rel",
                    ],
                    "subj": [
                        "Alice Fox",      # PER -> ok
                        "helix labs",     # ORG subject -> violation
                        "alice-fox",      # alias normalizes -> PER ok
                        "alice fox",
                        "alice fox",
                    ],
                    "obj": [
                        "osaka",          # LOC -> ok
                        "osaka",
                        "gondor",         # unknown -> '?'
                        "helix labs",     # ORG -> ok
                        "osaka",
                    ],
                }
            )
        )
        et = {
            "alice fox": "PER",
            "helix labs": "ORG",
            "osaka": "LOC",
        }
        sig = {"born_in": ("PER", "LOC"), "works_for": ("PER", "ORG")}
        got = (
            type_violation_counts(tri, et, sig)
            .to_pandas()
            .sort_values(["rel", "subj_type", "obj_type"])
            .reset_index(drop=True)
        )
        rows = {
            (r.rel, r.subj_type, r.obj_type): (r.sig_ok, r.n)
            for r in got.itertuples()
        }
        assert rows[("born_in", "PER", "LOC")] == (True, 1)
        assert rows[("born_in", "ORG", "LOC")] == (False, 1)
        assert rows[("born_in", "PER", "?")] == (False, 1)
        assert rows[("works_for", "PER", "ORG")] == (True, 1)
        # a relation with no signature never passes
        assert rows[("mystery_rel", "PER", "LOC")] == (False, 1)
        assert got["n"].sum() == 5

    def test_query_all_green_on_stub_extractor(self):
        import __ray_entry__ as entry

        df = entry.queries()["kg_type_violations"](SF).to_pandas()
        assert df["n"].sum() > 0
        # the closed-world stub extractor emits only well-typed triples
        assert df.loc[~df["sig_ok"], "n"].sum() == 0


class TestSkylineRandomized:
    def test_matches_bruteforce_on_random_inputs(self):
        import ray.data as rd

        from kgflow.ops.relational import skyline

        rng = np.random.RandomState(3)
        for trial in range(5):
            n = 400
            df = pd.DataFrame(
                {
                    "id": np.arange(n, dtype=np.int64),
                    # small value ranges force heavy ties on both axes
                    "price": rng.randint(0, 12, n).astype(np.float64),
                    "size": rng.randint(0, 12, n).astype(np.int64),
                }
            )
            got = sorted(
                skyline(
                    rd.from_pandas(df).repartition(4), "price", "size"
                )
                .to_pandas()["id"]
                .tolist()
            )
            p = df["price"].to_numpy()
            s = df["size"].to_numpy()
            keep = []
            for i in range(n):
                dominated = (
                    (p <= p[i])
                    & (s >= s[i])
                    & ((p < p[i]) | (s > s[i]))
                ).any()
                if not dominated:
                    keep.append(i)
            assert got == keep, f"trial {trial}"


class TestImageThumbs:
    def test_nn_resize_exact_roundtrip(self):
        import pyarrow as pa
        import ray.data as rd

        from kgflow.ops.multimodal import (
            MEDIA_SCHEMA,
            decode_bmp,
            encode_bmp,
            image_thumbs,
        )

        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (20, 14, 3)).astype(np.uint8)
        rows = {
            "media_id": [1, 2],
            "kind": ["image", "audio"],
            "codec": ["bmp", "wav"],
            "payload": [encode_bmp(img), b"RIFFxxxx"],
            "width": [14, 0],
            "height": [20, 0],
            "sample_rate": [0, 16000],
            "n_frames": [0, 0],
        }
        media = rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))
        out = image_thumbs(media, target_h=8, target_w=8).to_pandas()
        # audio rows pass through nothing; one thumbnail out
        assert len(out) == 1 and out["codec"][0] == "bmp"
        got = decode_bmp(out["payload"][0])
        ri = (np.arange(8) * 20) // 8
        ci = (np.arange(8) * 14) // 8
        want = img[ri][:, ci]
        assert got.shape == (8, 8, 3) and (got == want).all()


class TestGazetteerFingerprint:
    def test_fingerprint_mode_matches_string_mode(self):
        import ray.data as rd

        from kgflow.ops.text import gazetteer_spot

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2, 3], dtype="int64"),
                    "text": [
                        "the Hash  Join beats a hash join here",
                        "always use hash",
                        "nothing to see",
                    ],
                }
            )
        )
        lex = rd.from_pandas(
            pd.DataFrame({"phrase": ["hash join", "hash", "beats a hash"]})
        )
        a = (
            gazetteer_spot(docs, lex)
            .to_pandas()
            .sort_values(["doc_id", "pos", "phrase"])
            .reset_index(drop=True)
        )
        b = (
            gazetteer_spot(docs, lex, fingerprint=True)
            .to_pandas()
            .sort_values(["doc_id", "pos", "phrase"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 6
