"""Deterministic stub scorers standing in for the two BERT models.

The container has no torch/transformers and no network, so correctness is
evidenced GPU-free (SURVEY.md §5.2, FIXTURES.md §6): both the engine's
actor-pool stages and the reference-semantics oracle load the SAME
deterministic scorers, so engine-vs-oracle triple parity must be exact
(P/R = 1.0 ≥ the 0.95 gate).

API mirrors what the pipeline needs from the real models:

- ``StubRelModel.sigmoid(input_ids, attention_mask) -> [B, R] float32``
  ≙ ``BertForRelationClassification.forward(...)[0]``
  (reference `/root/reference/src/openue/models/model.py:19-57`);
- ``StubNerModel.logits(input_ids, attention_mask) -> [B, L, 8] float32``
  ≙ ``BertForNER.forward(...)[0]`` (`models/model.py:77-112`).

Both are *padding-invariant*: scores for a row depend only on its
attended prefix, so padded (oracle) and ragged (engine) call paths agree
bit-for-bit. The NER stub is a rule-backed mock of a trained tagger: a
gazetteer of the closed-world entities typed per relation, emitting the
reference's fixed 8-label scheme ["O","B-SUB","I-SUB","B-OBJ","I-OBJ",
"Relation","CLS","SEP"] (`data/utils.py:617-618`).

In production these classes are replaced by real BERT weights behind the
same two methods; every Ray stage is written against this interface only.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from kgflow.fixtures import corpus
from kgflow.stages.tokenize import SimpleTokenizer, CLS_ID, SEP_ID

# NER label ids, exactly the reference order (data/utils.py:617-618)
O, B_SUB, I_SUB, B_OBJ, I_OBJ, REL_TAG, CLS_TAG, SEP_TAG = range(8)
NER_LABELS = ["O", "B-SUB", "I-SUB", "B-OBJ", "I-OBJ", "Relation", "CLS", "SEP"]

_MIX = np.uint64(2654435761)


class _ComputeEmulator:
    """Transformer-shaped arithmetic load for the stub models.

    The rule-based stubs are ~1000× cheaper than the BERT forward they
    stand in for; with them, a throughput benchmark measures Ray
    overhead, not pipeline behavior. The bench protocol (SURVEY.md §4.2)
    requires the model stage to stay the bottleneck — as a real GPU
    stage would be — so each stub performs dense-layer matmuls
    proportional to the token count (``layers`` × [T, H]·[H, H] sgemm +
    tanh). The result is discarded; stub OUTPUTS are unaffected, so
    correctness/parity tests are identical with emulation on or off.
    Disable with KGFLOW_EMULATE_COMPUTE=0 (tests don't care; bench keeps
    it on). Workers run with OMP_NUM_THREADS=1 under Ray, so this scales
    with the actor pool, not BLAS threads.
    """

    def __init__(self, hidden: int, layers: int, seed: int = 0):
        self.enabled = os.environ.get("KGFLOW_EMULATE_COMPUTE", "1") != "0"
        self.hidden = hidden
        self.layers = layers
        if self.enabled:
            rng = np.random.RandomState(seed + hidden + layers)
            self.W = (rng.randn(hidden, hidden).astype(np.float32) / np.sqrt(hidden))
            self.x0 = rng.randn(1, hidden).astype(np.float32)
        # KGFLOW_BURN_LOG=<dir>: append per-process burn throughput on
        # interpreter exit (scaling-diagnosis aid; off in normal runs)
        log_dir = os.environ.get("KGFLOW_BURN_LOG")
        if self.enabled and log_dir:
            self._stats = {"sec": 0.0, "tokens": 0}
            import json
            import time

            self._clock = time.perf_counter
            path = os.path.join(
                log_dir, f"burn_{os.getpid()}_{hidden}x{layers}.json"
            )

            def _dump(stats=self._stats):
                # overwrite-per-call: Ray workers are SIGKILLed at
                # shutdown, so atexit never fires there
                try:
                    with open(path, "w") as f:
                        json.dump(stats, f)
                except OSError:
                    pass

            self._dump = _dump
        else:
            self._stats = None

    # micro-batch rows per inner matmul: [1024, 256] float32 ≈ 1 MiB —
    # cache-resident, so the burn is COMPUTE-bound. Burning the whole
    # Ray block in one [block_tokens, H] matmul was measured to be
    # memory-bandwidth-bound: with 32 concurrent actors the tasks
    # thrashed DRAM (equal-work task times spread 4s..81s) and throughput
    # stopped scaling past ~8 actors.
    _CHUNK = 1024

    def burn(self, n_tokens: int) -> None:
        if not self.enabled or n_tokens <= 0:
            return
        if self._stats is not None:
            t0 = self._clock()
            self._burn(n_tokens)
            self._stats["sec"] += self._clock() - t0
            self._stats["tokens"] += n_tokens
            self._dump()
            return
        self._burn(n_tokens)

    def _burn(self, n_tokens: int) -> None:
        done = 0
        while done < n_tokens:
            c = min(self._CHUNK, n_tokens - done)
            X = np.broadcast_to(self.x0, (c, self.hidden)).copy()
            for _ in range(self.layers):
                X = np.tanh(X @ self.W)
            # fold into a scalar so the work cannot be optimized away
            if float(X[0, 0]) > 1e30:  # pragma: no cover
                raise RuntimeError("unreachable")
            done += c


class StubRelModel:
    """Trigger-keyed multi-label relation scorer.

    A relation scores 0.9 when its (unique) trigger token is present in the
    attended region, else a deterministic hash value in [0.05, 0.45) — below
    the reference's 0.5 threshold, so distractor sentences exercise the
    argmax-fallback path (`models/model.py:230-233`).
    """

    def __init__(self, tokenizer: SimpleTokenizer, seed: int = 42):
        self.seed = np.uint64(seed)
        self.num_relations = tokenizer.num_relations
        self.trigger_ids = np.array(
            [tokenizer.vocab[trigger] for (_, _, _, _, trigger) in corpus.RELATIONS],
            dtype=np.int64,
        )
        self._emu = _ComputeEmulator(hidden=256, layers=2, seed=seed)

    def sigmoid(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        ids = np.asarray(input_ids, dtype=np.int64)
        mask = np.asarray(attention_mask, dtype=bool)
        self._emu.burn(int(mask.sum()))
        B, L = ids.shape
        R = self.num_relations
        present = np.zeros((B, R), dtype=bool)
        for r in range(R):
            present[:, r] = np.any((ids == self.trigger_ids[r]) & mask, axis=1)
        # padding-invariant row weight: position-weighted sum of attended ids
        pos = np.arange(1, L + 1, dtype=np.uint64)
        w = np.sum(ids.astype(np.uint64) * pos[None, :] * mask.astype(np.uint64), axis=1)
        rr = np.arange(R, dtype=np.uint64)
        h = (w[:, None] * _MIX + rr[None, :] * np.uint64(97) + self.seed) % np.uint64(2**31)
        noise = h.astype(np.float64) / float(2**31) * 0.4 + 0.05
        return np.where(present, 0.9, noise).astype(np.float32)

    def model_hash(self) -> str:
        h = hashlib.sha256(b"stub-rel")
        h.update(self.trigger_ids.tobytes())
        h.update(bytes([int(self.seed) & 0xFF]))
        return h.hexdigest()[:16]


class StubNerModel:
    """Gazetteer-backed relation-conditioned BIO tagger.

    For a row ``[CLS] w1..wn [SEP] [relationK] [SEP] <pad…>`` it finds the
    relation token (id ≥ start_idx), types it, and tags occurrences of the
    relation's subject-type entities B-SUB/I-SUB and object-type entities
    B-OBJ/I-OBJ (object pass overwrites overlaps, matching the training
    labeler's precedence at reference `data/utils.py:484-506`). When
    subject and object types coincide (e.g. spouse_of PER→PER), the
    first occurrence by position is the subject and later ones objects.
    CLS/SEP/Relation positions get their dedicated tags like trained
    labels (`data/utils.py:510-514`); padded positions get "O".
    """

    def __init__(self, tokenizer: SimpleTokenizer, seed: int = 42):
        self.seed = np.uint64(seed)
        self.start_idx = tokenizer.start_idx
        self.num_relations = tokenizer.num_relations
        self.rel_types = [(stype, otype) for (_, stype, otype, _, _) in corpus.RELATIONS]
        self.trigger_ids = [
            tokenizer.vocab[trigger] for (_, _, _, _, trigger) in corpus.RELATIONS
        ]
        self.and_id = tokenizer.vocab.get(corpus._JOIN_WORD, -1)
        # first-token-id → list[(full id tuple, entity_type)]; the
        # gazetteer covers all alias surface forms (a trained tagger
        # recognizes aliases too — linking them is downstream work)
        self.first_tok: dict[int, list[tuple[tuple[int, ...], str]]] = {}
        for etype, pool in corpus.ENTITY_TYPES.items():
            for ent in pool:
                for form in corpus.alias_forms(ent):
                    ids = tuple(tokenizer.encode(form, add_special_tokens=False))
                    self.first_tok.setdefault(ids[0], []).append((ids, etype))
        self._emu = _ComputeEmulator(hidden=256, layers=6, seed=seed)

    def _matches(self, row: list[int], lo: int, hi: int) -> list[tuple[int, int, str]]:
        """Non-overlapping, longest-first gazetteer matches in row[lo:hi]."""
        out: list[tuple[int, int, str]] = []
        i = lo
        while i < hi:
            cands = self.first_tok.get(row[i])
            best = None
            if cands:
                for ids, etype in cands:
                    end = i + len(ids)
                    if end <= hi and tuple(row[i:end]) == ids:
                        if best is None or len(ids) > (best[1] - best[0]):
                            best = (i, end, etype)
            if best is not None:
                out.append(best)
                i = best[1]
            else:
                i += 1
        return out

    def tag_row(self, row: list[int], attended_len: int) -> np.ndarray:
        """Tag ids for one row (length = len(row)); padding-invariant."""
        L = len(row)
        tags = np.zeros(L, dtype=np.int64)  # 'O'
        n = attended_len
        # locate relation token within the attended region
        k = -1
        rel_pos = -1
        for p in range(n - 1, -1, -1):
            if row[p] >= self.start_idx:
                k = row[p] - self.start_idx
                rel_pos = p
                break
        if 0 <= k < self.num_relations:
            stype, otype = self.rel_types[k]
            # sentence tokens live in [1, rel_pos-1): CLS at 0, SEP at rel_pos-1
            lo, hi = 1, max(1, rel_pos - 1)
            # clause sensitivity: a trained tagger conditions on context —
            # restrict to the "and"-delimited clause holding the
            # relation's trigger word (falls back to the full sentence
            # when the trigger is absent, e.g. argmax-fallback rows)
            trig = self.trigger_ids[k]
            tpos = next((p for p in range(lo, hi) if row[p] == trig), None)
            if tpos is not None and self.and_id != -1:
                for p in range(tpos - 1, lo - 1, -1):
                    if row[p] == self.and_id:
                        lo = p + 1
                        break
                for p in range(tpos + 1, hi):
                    if row[p] == self.and_id:
                        hi = p
                        break
            matches = self._matches(row, lo, hi)
            if stype == otype:
                typed = [m for m in matches if m[2] == stype]
                subs = typed[:1]
                objs = typed[1:]
            else:
                subs = [m for m in matches if m[2] == stype]
                objs = [m for m in matches if m[2] == otype]
            for s, e, _ in subs:
                tags[s:e] = I_SUB
                tags[s] = B_SUB
            for s, e, _ in objs:  # object pass overwrites (ref precedence)
                tags[s:e] = I_OBJ
                tags[s] = B_OBJ
        # structural positions (like trained labels, data/utils.py:510-514)
        for p in range(n):
            if row[p] == CLS_ID:
                tags[p] = CLS_TAG
            elif row[p] == SEP_ID:
                tags[p] = SEP_TAG
            elif row[p] >= self.start_idx:
                tags[p] = REL_TAG
        tags[n:] = O
        return tags

    def logits(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        ids = np.asarray(input_ids, dtype=np.int64)
        mask = np.asarray(attention_mask, dtype=np.int64)
        self._emu.burn(int(mask.sum()))
        B, L = ids.shape
        out = np.zeros((B, L, 8), dtype=np.float32)
        lens = mask.sum(axis=1)
        for b in range(B):
            row = ids[b].tolist()
            tags = self.tag_row(row, int(lens[b]))
            out[b, np.arange(L), tags] = 8.0
        # deterministic sub-unit noise so logits look score-like but argmax
        # is unchanged (8.0 margin)
        h = (
            ids.astype(np.uint64) * _MIX
            + np.arange(L, dtype=np.uint64)[None, :]
            + self.seed
        ) % np.uint64(1024)
        out += (h.astype(np.float32) / 1024.0 * 0.5)[:, :, None] * np.linspace(
            0.1, 0.9, 8, dtype=np.float32
        )[None, None, :]
        return out

    def model_hash(self) -> str:
        h = hashlib.sha256(b"stub-ner")
        for t, lst in sorted(self.first_tok.items()):
            h.update(str((t, sorted(lst))).encode())
        h.update(bytes([int(self.seed) & 0xFF]))
        return h.hexdigest()[:16]
