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


def get_entities(seq: list[str]) -> list[tuple[str, int, int]]:
    """≙ reference ``get_entities`` (`data/utils.py:83-107`) for a flat
    tag sequence (IOBES-aware start/end rules from ``start_of_chunk`` /
    ``end_of_chunk``, `data/utils.py:23-80`): chunks as (type, begin,
    end) with type = suffix after '-'."""
    prev_tag, prev_type = "O", ""
    begin = 0
    chunks: list[tuple[str, int, int]] = []
    for i, chunk in enumerate(list(seq) + ["O"]):
        tag = chunk[0]
        type_ = chunk.split("-")[-1]
        # end_of_chunk (ref :53-80)
        end = prev_tag in ("E", "S")
        end |= prev_tag == "B" and tag in ("B", "S", "O")
        end |= prev_tag == "I" and tag in ("B", "S", "O")
        end |= prev_tag not in ("O", ".") and prev_type != type_
        if end:
            chunks.append((prev_type, begin, i - 1))
        # start_of_chunk (ref :23-50)
        start = tag in ("B", "S")
        start |= prev_tag == "E" and tag in ("E", "I")
        start |= prev_tag == "S" and tag in ("E", "I")
        start |= prev_tag == "O" and tag in ("E", "I")
        start |= tag not in ("O", ".") and prev_type != type_
        if start:
            begin = i
        prev_tag, prev_type = tag, type_
    return chunks


def ner_chunk_prf(tagged: "rd.Dataset") -> dict:
    """A3 — seqeval-style entity-chunk P/R/F1, ≙ reference
    ``compute_metrics``/``f1_score`` (`lit_models/metric.py:33-63`,
    `data/utils.py:110-122`): per row, the predicted and gold chunk SETS
    are intersected; counts are summed across the corpus (partial+final,
    no driver loop). Input columns: ``pred_tags``, ``gold_tags``
    (list<str> each)."""

    def counts(batch) -> pd.DataFrame:
        pre = true = cor = 0
        for p, g in zip(batch["pred_tags"].to_pylist(), batch["gold_tags"].to_pylist()):
            ps = set(get_entities(p))
            gs = set(get_entities(g))
            pre += len(ps)
            true += len(gs)
            cor += len(ps & gs)
        return pd.DataFrame({"pre": [pre], "true": [true], "cor": [cor]})

    agg = tagged.map_batches(counts, batch_format="pyarrow").sum(
        ["pre", "true", "cor"]
    )
    pre, true, cor = agg["sum(pre)"], agg["sum(true)"], agg["sum(cor)"]
    p = cor / pre if pre else 0.0
    r = cor / true if true else 0.0
    return {
        "p": p,
        "r": r,
        "f1": 2 * p * r / (p + r) if p + r else 0.0,
    }


def seq_multilabel_prf(scored: "rd.Dataset") -> dict:
    """A4 — multi-label relation P/R, ≙ reference ``seq_metric``
    (`lit_models/metric.py:66-103`): threshold 0.5, TP = Σ(pred·label),
    P = TP/Σpred, R = TP/Σlabel; F1 = 2pr/(p+r) **iff both nonzero**
    (the reference's ``if p and r`` quirk is kept). Input columns:
    ``scores``, ``labels`` (list<float> each)."""
    import numpy as np

    def counts(batch) -> pd.DataFrame:
        s = np.asarray(batch["scores"].to_pylist(), dtype=np.float64)
        y = np.asarray(batch["labels"].to_pylist(), dtype=np.float64)
        pred = s > 0.5
        return pd.DataFrame(
            {
                "tp": [float((pred * y).sum())],
                "pred_one": [float(pred.sum())],
                "true_one": [float(y.sum())],
            }
        )

    agg = scored.map_batches(counts, batch_format="pyarrow").sum(
        ["tp", "pred_one", "true_one"]
    )
    tp, po, to = agg["sum(tp)"], agg["sum(pred_one)"], agg["sum(true_one)"]
    p = tp / po if po else 0
    r = tp / to if to else 0
    return {"p": p, "r": r, "f1": 2 * p * r / (p + r) if p and r else 0}


def explode_gold(gold_ds: "rd.Dataset") -> "rd.Dataset":
    """gold_spo(url, sent_id, spo list<struct>) → one row per gold triple."""

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, sid, spo in zip(df["url"], df["sent_id"], df["spo"]):
            for t in spo if spo is not None else []:
                rows.append((url, sid, t["subject"], t["predicate"], t["object"]))
        return pd.DataFrame(rows, columns=["url", "sent_id", "subj", "rel", "obj"])

    return gold_ds.map_batches(_explode, batch_format="pandas")


def _bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
    """Whole-bucket vectorized counting (no per-sentence Python): a
    predicted triple is correct iff its (url, sent_id, subj, rel, obj)
    key appears in the DISTINCT gold keys of the same sentence —
    duplicates on the predicted side each count (list-membership
    semantics of ``_cal``); duplicate GOLD rows raise ``true`` but not
    ``cor``."""
    key = ["url", "sent_id", "subj", "rel", "obj"]
    pred = g[g["src"] == "p"]
    gold = g[g["src"] == "g"]
    gold_keys = gold[key].drop_duplicates()
    cor = len(pred.merge(gold_keys, on=key))
    return pd.DataFrame(
        {"pre": [len(pred)], "true": [len(gold)], "cor": [cor]}
    )


def triple_prf(pred_ds: "rd.Dataset", gold_triples_ds: "rd.Dataset") -> dict:
    """Corpus P/R/F1. One bucketed shuffle on the sentence key + tiny sum."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    p = pred_ds.select_columns(["url", "sent_id", "subj", "rel", "obj"]).add_column(
        "src", lambda df: pd.Series(["p"] * len(df), index=df.index), batch_format="pandas"
    )
    g = gold_triples_ds.select_columns(
        ["url", "sent_id", "subj", "rel", "obj"]
    ).add_column(
        "src", lambda df: pd.Series(["g"] * len(df), index=df.index), batch_format="pandas"
    )
    counts = bucketed_group_reduce(
        p.union(g), key_cols=["url", "sent_id"], reduce_fn=_bucket_counts
    )
    agg = counts.sum(["pre", "true", "cor"])
    pre, true, cor = agg["sum(pre)"], agg["sum(true)"], agg["sum(cor)"]
    prec = cor / pre if pre else 0.0
    rec = cor / true if true else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"pre": int(pre), "true": int(true), "cor": int(cor), "p": prec, "r": rec, "f1": f1}
