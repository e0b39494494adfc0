"""Deterministic tokenizer (BERT-convention ids, closed-world vocab).

Stands in for the HF ``AutoTokenizer`` of the reference
(`/root/reference/src/openue/data/data_module.py:19-35`): same API surface
where the reference semantics depend on it —

- lowercasing before tokenization = reference ``preprocess``
  (`data/utils.py:383-385`);
- special ids follow the BERT convention the reference hard-codes:
  PAD=0, UNK=100, CLS=101, SEP=102 (SEP is literal ``102`` at
  `models/model.py:245`);
- relation special tokens ``[relation0]..[relationR-1]`` occupy a dense id
  range starting at ``start_idx`` (`data/data_module.py:27-35`,
  `models/model.py:149`), so ``rel_id = token_id - start_idx``
  (`models/model.py:366`).

The vocab is built deterministically from the fixture closed world; OOV
tokens (e.g. page numbers in titles) map to [UNK]. In production this
class is swapped for a real subword tokenizer behind the same interface;
every pipeline stage only touches the methods defined here.

Scale note: the tokenizer is constructed ONCE per actor (it is captured in
``TokenizeStage.__init__``); per-batch work is a compiled-regex findall +
dict lookups per sentence — no per-row Python in the driver.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from kgflow.fixtures import corpus

PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102

_TOKEN_RE = re.compile(r"\[relation\d+\]|\w+|[^\w\s]")


class SimpleTokenizer:
    def __init__(self, words: list[str] | None = None, num_relations: int | None = None):
        words = words if words is not None else corpus.vocab_words()
        self.num_relations = (
            num_relations if num_relations is not None else corpus.NUM_RELATIONS
        )
        base = 104
        self.vocab: dict[str, int] = {w: base + i for i, w in enumerate(words)}
        self.start_idx = base + len(words)  # id of [relation0]
        for k in range(self.num_relations):
            self.vocab[f"[relation{k}]"] = self.start_idx + k
        self.inv_vocab: dict[int, str] = {i: w for w, i in self.vocab.items()}
        self.inv_vocab.update({PAD_ID: "[PAD]", UNK_ID: "[UNK]", CLS_ID: "[CLS]", SEP_ID: "[SEP]"})
        self.vocab_size = self.start_idx + self.num_relations

    # -- reference-equivalent surface ---------------------------------------

    def tokenize(self, text: str) -> list[str]:
        return _TOKEN_RE.findall(text.lower())

    def encode(self, text: str, add_special_tokens: bool = True, max_length: int | None = None) -> list[int]:
        """≙ HF ``tokenizer(preprocess(text), truncation="longest_first")``
        as used at reference `data/utils.py:579-584` (lowering included)."""
        ids = [self.vocab.get(t, UNK_ID) for t in self.tokenize(text)]
        if add_special_tokens:
            if max_length is not None and len(ids) > max_length - 2:
                ids = ids[: max_length - 2]
            return [CLS_ID] + ids + [SEP_ID]
        if max_length is not None:
            ids = ids[:max_length]
        return ids

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self.inv_vocab.get(int(i), "[UNK]") for i in ids]

    def convert_tokens_to_string(self, tokens: list[str]) -> str:
        """≙ HF BasicTokenizer-style join (reference
        `lit_models/transformer.py:222-224` detokenization)."""
        return " ".join(tokens)

    def decode_span(self, ids) -> str:
        return self.convert_tokens_to_string(self.convert_ids_to_tokens(ids))

    def vocab_hash(self) -> str:
        h = hashlib.sha256()
        for w, i in sorted(self.vocab.items()):
            h.update(f"{w}\x00{i}\n".encode())
        return h.hexdigest()[:16]


def make_tokenize_fn(max_seq_length: int = 256):
    """Stateless-task form of the tokenize stage (fuses with the extract /
    split chain; tokenizer is a per-worker-process singleton via
    ``kgflow.stages.runtime.get_tokenizer``)."""

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        texts = batch.column("text").to_pylist()
        enc = [tok.encode(t, max_length=max_seq_length - 2) for t in texts]
        ids_arr = pa.array(enc, type=pa.list_(pa.int32()))
        n_tok = pa.array(
            np.fromiter((len(e) for e in enc), dtype=np.int32, count=len(enc))
        )
        return batch.append_column("input_ids", ids_arr).append_column("n_tokens", n_tok)

    return tokenize_batch


class TokenizeStage:
    """Actor-pool map_batches stage: sentences → encoded.

    in : (url, sent_id, text)
    out: (url, sent_id, text, input_ids list<int32>, n_tokens int32)

    ≙ reference ``convert_examples_to_interactive_features`` tokenization
    (`data/utils.py:579-584`): lowercase, add CLS/SEP, truncate to
    ``max_seq_length - 2``. attention_mask/token_type_ids are implicit
    (all-ones / all-zeros for unpadded rows) and materialized only inside
    the model actors — ragged lists stay ragged in Arrow.
    """

    def __init__(self, max_seq_length: int = 256, tokenizer: SimpleTokenizer | None = None):
        if tokenizer is None:
            from kgflow.stages.runtime import get_tokenizer

            tokenizer = get_tokenizer()
        self.tok = tokenizer
        self.max_seq_length = max_seq_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        enc = [self.tok.encode(t, max_length=self.max_seq_length - 2) for t in texts]
        ids_arr = pa.array(enc, type=pa.list_(pa.int32()))
        n_tok = pa.array(np.fromiter((len(e) for e in enc), dtype=np.int32, count=len(enc)))
        return batch.append_column("input_ids", ids_arr).append_column("n_tokens", n_tok)
