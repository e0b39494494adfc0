"""A2 — corpus triple P/R/F1 with the reference's counting semantics.

≙ ``INFERLitModel._cal`` + ``test_step`` + ``test_epoch_end``
(`/root/reference/src/openue/lit_models/transformer.py:184-215`):
per sentence, ``pre`` = #predicted triples (duplicates counted), ``true``
= #gold triples, ``cor`` = #predicted triples that appear in the gold
list (list membership); corpus P = cor/pre, R = cor/true, F1 harmonic.

Ray-Data mapping (SURVEY.md §2.6 A2): tag + union the predicted and gold
triple tables, co-locate per sentence with one ``groupby`` shuffle on the
(url, sent_id) key, emit per-sentence count rows, and finish with a tiny
global sum — the partial+final aggregate pattern. The metric is a bag
metric, insensitive to row order (SURVEY.md §2.10).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def explode_gold(gold_ds: "rd.Dataset") -> "rd.Dataset":
    """gold_spo(url, sent_id, spo list<struct>) → one row per gold triple."""

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, sid, spo in zip(df["url"], df["sent_id"], df["spo"]):
            for t in spo if spo is not None else []:
                rows.append((url, sid, t["subject"], t["predicate"], t["object"]))
        return pd.DataFrame(rows, columns=["url", "sent_id", "subj", "rel", "obj"])

    return gold_ds.map_batches(_explode, batch_format="pandas")


def _sentence_counts(g: pd.DataFrame) -> pd.DataFrame:
    pred = g[g["src"] == "p"]
    gold = g[g["src"] == "g"]
    gold_list = list(zip(gold["subj"], gold["rel"], gold["obj"]))
    pre = len(pred)
    true = len(gold_list)
    cor = 0
    for t in zip(pred["subj"], pred["rel"], pred["obj"]):
        if t in gold_list:  # list membership, duplicates on pred side count
            cor += 1
    return pd.DataFrame({"pre": [pre], "true": [true], "cor": [cor]})


def triple_prf(pred_ds: "rd.Dataset", gold_triples_ds: "rd.Dataset") -> dict:
    """Corpus P/R/F1. One shuffle (groupby on the sentence key) + tiny sum."""
    p = pred_ds.select_columns(["url", "sent_id", "subj", "rel", "obj"]).add_column(
        "src", lambda df: pd.Series(["p"] * len(df), index=df.index), batch_format="pandas"
    )
    g = gold_triples_ds.select_columns(
        ["url", "sent_id", "subj", "rel", "obj"]
    ).add_column(
        "src", lambda df: pd.Series(["g"] * len(df), index=df.index), batch_format="pandas"
    )
    counts = (
        p.union(g)
        .groupby(["url", "sent_id"])
        .map_groups(_sentence_counts, batch_format="pandas")
    )
    agg = counts.sum(["pre", "true", "cor"])
    pre, true, cor = agg["sum(pre)"], agg["sum(true)"], agg["sum(cor)"]
    prec = cor / pre if pre else 0.0
    rec = cor / true if true else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"pre": int(pre), "true": int(true), "cor": int(cor), "p": prec, "r": rec, "f1": f1}
