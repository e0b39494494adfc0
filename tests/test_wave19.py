"""Wave 19: gazetteer mentions wired into the KG pipeline.

`kg_gazetteer_mentions` is rows-only at the driver (the pages fixture
is not a DuckDB view), so this file pins its EXACT output at sf0.001
against an independent brute-force token-window scan of the same
sentence stream.
"""

import os
import re

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
