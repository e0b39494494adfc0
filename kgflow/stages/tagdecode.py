"""Fused stage-2: entity tagging + decode + detokenize in one actor pool.

Composition of ``EntityTagStage`` (M3+X3+X4) and ``DecodeStage`` (X5+X6)
— see their modules for the reference-semantics citations. Fused into a
single actor pool because (a) both need per-actor state (model weights,
vocab), (b) decoding immediately at the tagger's output avoids an extra
object-store hop for the logits-shaped intermediate, exactly like a
production GPU stage that decodes on-device results before returning,
and (c) fewer distinct actor pools = no CPU-reservation starvation on
small clusters (each pool's floor is one whole actor).
"""

from __future__ import annotations

import pyarrow as pa

from kgflow.stages.decode import DecodeStage
from kgflow.stages.entitytag import EntityTagStage
from kgflow.stages.tokenize import SimpleTokenizer


class TagDecodeStage:
    def __init__(
        self, seed: int = 42, mode: str = "triple", tok_kind: str = "simple"
    ):
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer(tok_kind)
        self.tag = EntityTagStage(seed=seed, tok_kind=tok_kind)
        self.decode = DecodeStage(tokenizer=tok, mode=mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.decode(self.tag(batch))


class ExtractTriplesStage:
    """Single-pool fused model stage: relation-classify → fan-out →
    entity-tag → decode in ONE actor (both models loaded once per actor
    in ``__init__``).

    Round-3 scaling fix: with relation classification in its own pool,
    the two pools had to SPLIT the CPU budget, but the work ratio
    between them is ~1:5 (8-cpu/300k-page stats: 147 vs 732 CPU-s), so
    either the light pool hoarded CPUs while backlogged (heavy-pool
    utilization 64%) or, capped small, it starved the heavy pool of
    input. With every model stage in one pool and the cheap
    extract/split/tokenize chain left as elastic TASKS fused with the
    read, there is no split to tune: the pool owns the budget, tasks
    fill the gaps, and the same code runs unchanged at N and 4N CPUs.
    Per-stage semantics and outputs are identical to the two-pool
    layout (same classes, same order, same per-block batches).
    """

    def __init__(
        self, seed: int = 42, mode: str = "triple", tok_kind: str = "simple"
    ):
        from kgflow.stages.fanout import make_fanout_fn
        from kgflow.stages.relclassify import RelClassifyStage
        from kgflow.stages.runtime import get_tokenizer

        self.rel = RelClassifyStage(seed=seed, tok_kind=tok_kind)
        self.fanout = make_fanout_fn(get_tokenizer(tok_kind).start_idx)
        self.tagdecode = TagDecodeStage(seed=seed, mode=mode, tok_kind=tok_kind)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.tagdecode(self.fanout(self.rel(batch)))
