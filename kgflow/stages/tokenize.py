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


def make_tokenize_fn(max_seq_length: int = 256, tok_kind: str = "simple"):
    """Stateless-task form of the tokenize stage (fuses with the extract /
    split chain; tokenizer is a per-worker-process singleton via
    ``kgflow.stages.runtime.get_tokenizer``). ``tok_kind`` selects a
    named runtime tokenizer ("bpe" = learned-subword production path)."""

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer(tok_kind)
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


# ---------------------------------------------------------------------------
# Learned-subword tokenizer (BPE) behind the SimpleTokenizer interface
# ---------------------------------------------------------------------------

#: end-of-word marker, one private-use codepoint so `list(word)` keeps it
#: a single symbol during training (Sennrich et al., ACL 2016 use "</w>")
EOW = ""


class _WordFallbackVocab(dict):
    """symbol→id dict that also resolves a PLAIN WORD to its id when the
    word merged to a single end-of-word symbol — keeps the stub models'
    ``tokenizer.vocab[trigger]`` lookups working verbatim under BPE."""

    def __missing__(self, key: str) -> int:
        v = dict.get(self, key + EOW)
        if v is None:
            raise KeyError(key)
        return v

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default


class BpeTokenizer:
    """Byte-pair-encoding tokenizer with the exact surface the pipeline
    stages and stub models consume (`SimpleTokenizer` duck type): the
    production "learned subword vocab" path of M1 — the reference grows
    its HF tokenizer with relation tokens
    (`/root/reference/src/openue/data/data_module.py:27-35`); here the
    base vocab itself is TRAINED (Sennrich et al., ACL 2016) instead of
    fixture-enumerated.

    Training: word counts over a deterministic sample of the fixture
    corpus (plus one count for every closed-world alias surface so the
    alphabet is complete), merges learned to exhaustion with the same
    (count DESC, left ASC, right ASC) tie rule as
    `kgflow.ops.text.bpe_merges`. Exhaustion makes every in-corpus word
    a single symbol — so triggers stay single-token for the relation
    stub — while true OOV words (page numbers) decompose into learned
    subwords instead of collapsing to [UNK].

    Detokenization is LOSSLESS for any word over the training alphabet:
    symbols carry an end-of-word marker, so
    ``convert_tokens_to_string`` re-concatenates subwords and emits a
    space exactly at word boundaries — multi-subword entity spans
    reconstruct byte-identically (the per-url/per-span byte-parity
    invariant the north rule pins).
    """

    #: pages sampled for training counts — deterministic, fixture-seeded
    TRAIN_PAGES = 200

    def __init__(
        self,
        num_relations: int | None = None,
        max_merges: int = 50_000,
        train_pages: int | None = None,
    ):
        self.num_relations = (
            num_relations if num_relations is not None else corpus.NUM_RELATIONS
        )
        counts = self._train_counts(train_pages or self.TRAIN_PAGES)
        self.merges = self._learn_merges(counts, max_merges)
        # final symbol inventory: alphabet + every merge product
        symbols: set[str] = set()
        for w in counts:
            symbols.update(self._word_symbols(w))
        symbols.update(l + r for _, l, r in self.merges)
        base = 104
        ordered = sorted(symbols)
        self.vocab: _WordFallbackVocab = _WordFallbackVocab(
            {s: base + i for i, s in enumerate(ordered)}
        )
        self.start_idx = base + len(ordered)  # id of [relation0]
        for k in range(self.num_relations):
            self.vocab[f"[relation{k}]"] = self.start_idx + k
        self.inv_vocab: dict[int, str] = {i: s for s, i in self.vocab.items()}
        self.inv_vocab.update(
            {PAD_ID: "[PAD]", UNK_ID: "[UNK]", CLS_ID: "[CLS]", SEP_ID: "[SEP]"}
        )
        self.vocab_size = self.start_idx + self.num_relations
        self._ranks = {(l, r): i for i, (_, l, r) in enumerate(self.merges)}
        self._cache: dict[str, tuple[str, ...]] = {}

    # -- training -----------------------------------------------------------

    @staticmethod
    def _word_symbols(word: str) -> list[str]:
        syms = list(word)
        syms[-1] = syms[-1] + EOW
        return syms

    def _train_counts(self, train_pages: int) -> dict[str, int]:
        counts: dict[str, int] = {}
        for i in range(train_pages):
            for j in range(3):
                text, _ = corpus.make_sentence(i, j)
                for w in _TOKEN_RE.findall(text.lower()):
                    counts[w] = counts.get(w, 0) + 1
        # alphabet completeness: every alias surface of the closed world
        for pool in corpus.ENTITY_TYPES.values():
            for ent in pool:
                for form in corpus.alias_forms(ent):
                    for w in _TOKEN_RE.findall(form.lower()):
                        counts[w] = counts.get(w, 0) + 1
        return counts

    def _learn_merges(
        self, counts: dict[str, int], max_merges: int
    ) -> list[tuple[int, str, str]]:
        """Sennrich BPE to exhaustion; ties (count DESC, left ASC,
        right ASC) — the `kgflow.ops.text.bpe_merges` rule, so merge
        sequences are engine-reproducible."""
        syms = [self._word_symbols(w) for w in counts]
        ns = list(counts.values())
        merges: list[tuple[int, str, str]] = []
        for rank in range(1, max_merges + 1):
            pair_counts: dict[tuple[str, str], int] = {}
            for s, n in zip(syms, ns):
                for a, b in zip(s, s[1:]):
                    pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
            if not pair_counts:
                break
            (left, right), _c = min(
                pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right))
            for i, s in enumerate(syms):
                if left not in s:
                    continue
                merged, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == left and s[j + 1] == right:
                        merged.append(left + right)
                        j += 2
                    else:
                        merged.append(s[j])
                        j += 1
                syms[i] = merged
        return merges

    # -- encoding -----------------------------------------------------------

    def _encode_word(self, word: str) -> tuple[str, ...]:
        got = self._cache.get(word)
        if got is not None:
            return got
        syms = self._word_symbols(word)
        # replay merges by rank over the current lowest-rank pair —
        # equivalent to rank-order scans on a fully-trained table
        while len(syms) > 1:
            best, best_rank = None, None
            for a, b in zip(syms, syms[1:]):
                r = self._ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (a, b), r
            if best is None:
                break
            left, right = best
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    merged.append(left + right)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            syms = merged
        out = tuple(syms)
        self._cache[word] = out
        return out

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for w in _TOKEN_RE.findall(text.lower()):
            if w.startswith("[relation"):
                out.append(w)
            else:
                out.extend(self._encode_word(w))
        return out

    def encode(
        self,
        text: str,
        add_special_tokens: bool = True,
        max_length: int | None = None,
    ) -> list[int]:
        ids = [self.vocab.get(t, UNK_ID) for t in self.tokenize(text)]
        if add_special_tokens:
            if max_length is not None and len(ids) > max_length - 2:
                ids = ids[: max_length - 2]
            return [CLS_ID] + ids + [SEP_ID]
        if max_length is not None:
            ids = ids[:max_length]
        return ids

    # -- decoding -----------------------------------------------------------

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self.inv_vocab.get(int(i), "[UNK]") for i in ids]

    def convert_tokens_to_string(self, tokens: list[str]) -> str:
        parts: list[str] = []
        for t in tokens:
            if t.endswith(EOW):
                parts.append(t[: -len(EOW)])
                parts.append(" ")
            elif t.startswith("[") and t.endswith("]"):
                # specials ([UNK]/[relationK]/...) are whole words
                parts.append(t)
                parts.append(" ")
            else:
                parts.append(t)
        return "".join(parts).strip()

    def decode_span(self, ids) -> str:
        return self.convert_tokens_to_string(self.convert_ids_to_tokens(ids))

    def vocab_hash(self) -> str:
        h = hashlib.sha256(b"bpe\x00")
        for w, i in sorted(self.vocab.items()):
            h.update(f"{w}\x00{i}\n".encode())
        return h.hexdigest()[:16]
