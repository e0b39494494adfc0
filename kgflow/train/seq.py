"""Training lifecycle for the stage-1 relation classifier (the
`scripts/run_seq.sh` analogue, torch-free).

The reference trains BertForRelationClassification with
pytorch-lightning (`/root/reference/scripts/run_seq.sh`,
`lit_models/transformer.py:60-120`: BCE-with-logits over multi-hot
relation labels, A4 multilabel P/R as the val metric). This container
has no torch, so the trainer is a linear multi-label classifier over
binary bag-of-token features — enough to exercise the FULL
lifecycle the reference has (feature build → epochs of gradient descent
→ metric eval → weights artifact) with the engine's own distributed
primitives:

- **forward/backward are data-parallel map_batches**: the weight matrix
  is broadcast via ``ray.put`` once per epoch; every batch computes its
  gradient contribution with two numpy matmuls and emits ONE row
  (flattened gradient + loss). No raw actors, no parameter server — the
  reduce is the engine's own aggregation.
- **the gradient reduce is a sum over batch rows** with two paths,
  auto-selected on the flattened gradient length (``grad_shards``
  overrides): DENSE — the driver pulls #batches rows and sums (right
  when V×R is a few thousand floats); SHARDED — every batch splits its
  gradient vector into ``grad_shards`` contiguous slices keyed by shard
  id and the sum runs distributed via ``bucketed_group_reduce`` (one
  reduce partition per shard), so the driver receives exactly ONE
  summed gradient (#shards rows, V×R floats total) instead of
  #batches × V×R — the tree-reduce upgrade path for large vocabularies.
- **eval is the A4 metric** (multilabel micro P/R, reference
  `lit_models/transformer.py:84-101` semantics) computed with a
  distributed sum.

The stub scorer keys each relation to a unique trigger token, so the
linear model separates the fixture perfectly — the test asserts loss
decreases monotonically-ish and final P/R ≈ 1, which is exactly the
"training works end-to-end" gate run_seq.sh provides upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


# flattened-gradient length above which the epoch reduce goes
# distributed (sharded) instead of a driver pull of #batches rows
GRAD_SHARD_THRESHOLD = 1 << 18
GRAD_SHARDS_DEFAULT = 8


def _resolve_shards(vec_len: int, grad_shards: int | None) -> int:
    if grad_shards is not None:
        return max(1, grad_shards)
    return GRAD_SHARDS_DEFAULT if vec_len > GRAD_SHARD_THRESHOLD else 1


def _shard_rows(gvec: np.ndarray, loss: float, n: int, shards: int) -> pa.Table:
    """Emit a batch's flattened gradient as ``shards`` keyed rows
    (contiguous equal-ish slices); loss/n ride on shard 0 only so the
    reduce stays a plain per-key sum."""
    bounds = np.linspace(0, len(gvec), shards + 1).astype(np.int64)
    return pa.table(
        {
            "shard": pa.array(range(shards), pa.int64()),
            "g": pa.array(
                [gvec[bounds[s] : bounds[s + 1]].tolist() for s in range(shards)],
                pa.list_(pa.float64()),
            ),
            "loss": pa.array(
                [float(loss) if s == 0 else 0.0 for s in range(shards)], pa.float64()
            ),
            "n": pa.array([n if s == 0 else 0 for s in range(shards)], pa.int64()),
        }
    )


def _reduce_grad(parts: "rd.Dataset", shards: int) -> tuple[np.ndarray, float, float]:
    """Sum the per-batch gradient rows → (gvec_sum, loss_sum, n_sum).
    Sharded path: one ``bucketed_group_reduce`` partition per shard id
    sums its slice in the cluster; the driver then pulls #shards rows
    (ONE gradient's worth of floats) and concatenates."""
    if shards <= 1:
        df = parts.to_pandas()
        gvec = np.sum(np.stack([np.asarray(g) for g in df["g"]]), axis=0)
        return gvec, float(df["loss"].sum()), float(df["n"].sum())

    from kgflow.ops.shuffle import bucketed_group_reduce

    def shard_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, grp in g.groupby("shard", sort=True):
            out.append(
                {
                    "shard": int(shard),
                    "g": np.sum(
                        np.stack([np.asarray(v) for v in grp["g"]]), axis=0
                    ).tolist(),
                    "loss": float(grp["loss"].sum()),
                    "n": int(grp["n"].sum()),
                }
            )
        return pd.DataFrame(out)

    df = (
        bucketed_group_reduce(
            parts, key_cols=["shard"], reduce_fn=shard_sum, num_buckets=shards
        )
        .to_pandas()
        .sort_values("shard")
    )
    gvec = np.concatenate([np.asarray(g) for g in df["g"]])
    return gvec, float(df["loss"].sum()), float(df["n"].sum())


def _bag_matrix(input_ids: list, vocab_size: int) -> np.ndarray:
    """[B, V] binary token-presence matrix (bag-of-words; presence not
    counts — the trigger-token signal is presence-shaped)."""
    B = len(input_ids)
    X = np.zeros((B, vocab_size), dtype=np.float32)
    for i, ids in enumerate(input_ids):
        ids = np.asarray(ids, dtype=np.int64)
        ids = ids[(ids >= 0) & (ids < vocab_size)]
        X[i, ids] = 1.0
    return X


def train_seq_classifier(
    features: "rd.Dataset",
    vocab_size: int,
    num_relations: int,
    epochs: int = 25,
    lr: float = 2.0,
    l2: float = 1e-6,
    seed: int = 42,
    grad_shards: int | None = None,
) -> dict:
    """Full-batch synchronous gradient descent; returns
    {"W": [V,R], "b": [R], "losses": [per-epoch BCE]}.
    ``grad_shards=None`` auto-selects the reduce path on V*R+R
    (see module docstring); an explicit value forces it."""
    feats = features.select_columns(["input_ids", "label_ids_seq"]).materialize()
    rng = np.random.RandomState(seed)
    W = (rng.randn(vocab_size, num_relations) * 0.01).astype(np.float64)
    b = np.zeros(num_relations, dtype=np.float64)
    losses: list[float] = []
    shards = _resolve_shards(vocab_size * num_relations + num_relations, grad_shards)

    for _ in range(epochs):
        wref = ray.put((W, b))

        def grad_batch(t: pa.Table) -> pa.Table:
            Wc, bc = ray.get(wref)
            X = _bag_matrix(t.column("input_ids").to_pylist(), vocab_size)
            Y = np.asarray(t.column("label_ids_seq").to_pylist(), dtype=np.float64)
            Z = X @ Wc + bc
            P = 1.0 / (1.0 + np.exp(-Z))
            eps = 1e-12
            loss = -np.sum(Y * np.log(P + eps) + (1 - Y) * np.log(1 - P + eps))
            D = P - Y  # [B, R]
            gvec = np.concatenate([(X.T @ D).ravel(), D.sum(axis=0)])  # [V*R + R]
            return _shard_rows(gvec, loss, len(X), shards)

        parts = feats.map_batches(grad_batch, batch_format="pyarrow")
        gvec, loss, n = _reduce_grad(parts, shards)
        gw = gvec[: vocab_size * num_relations] / n
        gb = gvec[vocab_size * num_relations :] / n
        losses.append(loss / n)
        W -= lr * (gw.reshape(vocab_size, num_relations) + l2 * W)
        b -= lr * gb

    return {"W": W, "b": b, "losses": losses}


def eval_seq_classifier(
    features: "rd.Dataset",
    W: np.ndarray,
    b: np.ndarray,
    threshold: float = 0.5,
) -> dict:
    """A4-style multilabel micro P/R/F1 (reference
    lit_models/transformer.py:84-101 — including the `if p and r` F1
    quirk) via one distributed sum."""
    vocab_size = W.shape[0]
    wref = ray.put((W, b))

    def counts(t: pa.Table) -> pa.Table:
        Wc, bc = ray.get(wref)
        X = _bag_matrix(t.column("input_ids").to_pylist(), vocab_size)
        Y = np.asarray(t.column("label_ids_seq").to_pylist(), dtype=np.float64)
        P = 1.0 / (1.0 + np.exp(-(X @ Wc + bc)))
        pred = P >= threshold
        true = Y > 0.5
        return pa.table(
            {
                "tp": pa.array([int(np.sum(pred & true))], pa.int64()),
                "pred_one": pa.array([int(pred.sum())], pa.int64()),
                "true_one": pa.array([int(true.sum())], pa.int64()),
            }
        )

    agg = features.select_columns(["input_ids", "label_ids_seq"]).map_batches(
        counts, batch_format="pyarrow"
    ).sum(["tp", "pred_one", "true_one"])
    tp, po, to = agg["sum(tp)"], agg["sum(pred_one)"], agg["sum(true_one)"]
    p = tp / po if po else 0.0
    r = tp / to if to else 0.0
    return {
        "p": p,
        "r": r,
        "f1": 2 * p * r / (p + r) if p and r else 0.0,
        "tp": int(tp),
        "pred_one": int(po),
        "true_one": int(to),
    }


def train_and_eval_seq(
    corpus: "rd.Dataset", epochs: int = 25, seed: int = 42
) -> pd.DataFrame:
    """Lifecycle entry: (text_id, text, spo) corpus → seq features →
    train → eval. Returns a 1-row summary frame (driver query)."""
    from kgflow.stages.features import make_seq_features_fn
    from kgflow.stages.runtime import get_tokenizer

    tok = get_tokenizer()
    feats = corpus.map_batches(make_seq_features_fn(), batch_format="pyarrow")
    feats = feats.materialize()
    res = train_seq_classifier(
        feats, tok.vocab_size, tok.num_relations, epochs=epochs, seed=seed
    )
    m = eval_seq_classifier(feats, res["W"], res["b"])
    return pd.DataFrame(
        [
            {
                "n_examples": int(feats.count()),
                "epochs": int(epochs),
                "loss_first4": int(np.floor(res["losses"][0] * 1e4)),
                "loss_last4": int(np.floor(res["losses"][-1] * 1e4)),
                "p4": int(np.floor(m["p"] * 1e4)),
                "r4": int(np.floor(m["r"] * 1e4)),
                "f14": int(np.floor(m["f1"] * 1e4)),
            }
        ]
    )


NUM_TAGS = 8


def train_ner_tagger(
    features: "rd.Dataset",
    vocab_size: int,
    epochs: int = 15,
    lr: float = 2.0,
    seed: int = 42,
    grad_shards: int | None = None,
) -> dict:
    """`run_ner.sh` analogue: per-token linear tagger (token-id one-hot
    -> 8 BIO tags, softmax cross-entropy, same data-parallel
    map_batches-gradient loop as the seq trainer, including the
    auto-sharded distributed reduce). Attended positions only (label
    -100/pad excluded like the reference CrossEntropyLoss(ignore_index))."""
    feats = features.select_columns(["input_ids", "label_ids_ner"]).materialize()
    rng = np.random.RandomState(seed)
    W = (rng.randn(vocab_size, NUM_TAGS) * 0.01).astype(np.float64)
    losses: list[float] = []
    shards = _resolve_shards(vocab_size * NUM_TAGS, grad_shards)

    for _ in range(epochs):
        wref = ray.put(W)

        def grad_batch(t: pa.Table) -> pa.Table:
            Wc = ray.get(wref)
            gw = np.zeros_like(Wc)
            loss = 0.0
            n_tok = 0
            for ids, tags in zip(
                t.column("input_ids").to_pylist(),
                t.column("label_ids_ner").to_pylist(),
            ):
                ids = np.asarray(ids, dtype=np.int64)
                tags = np.asarray(tags, dtype=np.int64)[: len(ids)]
                ok = (tags >= 0) & (ids >= 0) & (ids < vocab_size)
                ids, tags = ids[ok], tags[ok]
                if not len(ids):
                    continue
                Z = Wc[ids]  # [T, K] one-hot token -> row lookup
                Z = Z - Z.max(axis=1, keepdims=True)
                E = np.exp(Z)
                P = E / E.sum(axis=1, keepdims=True)
                loss += float(-np.log(P[np.arange(len(ids)), tags] + 1e-12).sum())
                D = P
                D[np.arange(len(ids)), tags] -= 1.0
                np.add.at(gw, ids, D)
                n_tok += len(ids)
            return _shard_rows(gw.ravel(), loss, n_tok, shards)

        parts = feats.map_batches(grad_batch, batch_format="pyarrow")
        gvec, loss, n = _reduce_grad(parts, shards)
        losses.append(loss / n)
        W -= lr * gvec.reshape(vocab_size, NUM_TAGS) / n

    return {"W": W, "losses": losses}


def eval_ner_tagger(features: "rd.Dataset", W: np.ndarray) -> dict:
    """Per-token tagging accuracy over attended positions."""
    vocab_size = W.shape[0]
    wref = ray.put(W)

    def counts(t: pa.Table) -> pa.Table:
        Wc = ray.get(wref)
        ok_n = 0
        n = 0
        for ids, tags in zip(
            t.column("input_ids").to_pylist(), t.column("label_ids_ner").to_pylist()
        ):
            ids = np.asarray(ids, dtype=np.int64)
            tags = np.asarray(tags, dtype=np.int64)[: len(ids)]
            m = (tags >= 0) & (ids >= 0) & (ids < vocab_size)
            ids, tags = ids[m], tags[m]
            if not len(ids):
                continue
            pred = np.argmax(Wc[ids], axis=1)
            ok_n += int((pred == tags).sum())
            n += len(ids)
        return pa.table(
            {"ok": pa.array([ok_n], pa.int64()), "n": pa.array([n], pa.int64())}
        )

    agg = features.select_columns(["input_ids", "label_ids_ner"]).map_batches(
        counts, batch_format="pyarrow"
    ).sum(["ok", "n"])
    return {"acc": agg["sum(ok)"] / max(agg["sum(n)"], 1), "n_tokens": int(agg["sum(n)"])}


def train_and_eval_ner(
    corpus: "rd.Dataset", epochs: int = 15, seed: int = 42
) -> pd.DataFrame:
    from kgflow.stages.features import make_ner_features_fn
    from kgflow.stages.runtime import get_tokenizer

    tok = get_tokenizer()
    feats = corpus.map_batches(
        make_ner_features_fn(), batch_format="pyarrow"
    ).materialize()
    res = train_ner_tagger(feats, tok.vocab_size, epochs=epochs, seed=seed)
    m = eval_ner_tagger(feats, res["W"])
    return pd.DataFrame(
        [
            {
                "n_examples": int(feats.count()),
                "epochs": int(epochs),
                "loss_first4": int(np.floor(res["losses"][0] * 1e4)),
                "loss_last4": int(np.floor(res["losses"][-1] * 1e4)),
                "acc4": int(np.floor(m["acc"] * 1e4)),
                "n_tokens": int(m["n_tokens"]),
            }
        ]
    )
