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
    def __init__(self, seed: int = 42, mode: str = "triple"):
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        self.tag = EntityTagStage(seed=seed)  # runtime-backed model
        self.decode = DecodeStage(tokenizer=tok, mode=mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.decode(self.tag(batch))
