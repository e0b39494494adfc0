"""Closed-world template corpus for deterministic fixtures.

Mirrors the *shape* of OpenUE's SKE data (reference
`/root/reference/src/openue/data/utils.py:311-332`: JSONL rows of
``{text, spo_list}``), but with a synthetic English closed world so gold
triples are known by construction (FIXTURES.md §2).

Everything here is pure data + pure functions of an integer index —
no RNG state leaks, so page ``i`` always renders identically.
"""

from __future__ import annotations

import random

# --- entities (multi-token, lowercase-stable) -------------------------------

PER = [
    "alice fox", "bob hale", "carol singh", "david okafor", "erin walsh",
    "frank moreau", "grace lindqvist", "henry tanaka", "irene castillo",
    "jack oduya", "karen petrov", "liam burke", "maria santos", "nina adeyemi",
    "oscar lindgren", "paula varga", "quentin marsh", "rita kowalski",
    "sam whitfield", "tara nguyen", "ugo ferrari", "vera holt",
    "walter ibrahim", "xena lopez",
]

LOC = [
    "osaka", "lyon", "porto", "tunis", "quito", "leipzig", "galway",
    "tampere", "cusco", "split", "ghent", "malmo", "bergen", "davao",
    "arequipa", "brno",
]

ORG = [
    "helix labs", "nordwind group", "atlas forge", "bluefin systems",
    "cedar works", "delta ridge", "ember analytics", "fjord capital",
    "granite soft", "harbor line", "ivory peak", "juniper grid",
]

ENTITY_TYPES: dict[str, list[str]] = {"PER": PER, "LOC": LOC, "ORG": ORG}

# --- relations (rel2id fixture, dataset-dynamic like the reference,
# reference data/utils.py:620-625) -------------------------------------------

# (name, subject_type, object_type, template, trigger_word)
# Trigger words are pairwise distinct and appear in no other template, so the
# stub relation classifier can key on them deterministically.
RELATIONS: list[tuple[str, str, str, str, str]] = [
    ("born_in",    "PER", "LOC", "{s} was born in {o} .",        "born"),
    ("works_for",  "PER", "ORG", "{s} works for {o} .",          "works"),
    ("located_in", "ORG", "LOC", "{s} is located in {o} .",      "located"),
    ("founded_by", "ORG", "PER", "{s} was founded by {o} .",     "founded"),
    ("capital_of", "LOC", "LOC", "{s} is the capital of {o} .",  "capital"),
    ("spouse_of",  "PER", "PER", "{s} is the spouse of {o} .",   "spouse"),
    ("ceo_of",     "PER", "ORG", "{s} serves as ceo of {o} .",   "ceo"),
    ("part_of",    "ORG", "ORG", "{s} is a part of {o} .",       "part"),
]

REL_NAMES = [r[0] for r in RELATIONS]
REL2ID = {name: i for i, name in enumerate(REL_NAMES)}
NUM_RELATIONS = len(RELATIONS)

# Joiner used for 2-relation sentences (20% of sentences, FIXTURES.md §2).
_JOIN_WORD = "and"

DISTRACTORS = [
    "the sky turned dark over the quiet hills .",
    "a gentle rain fell through the evening air .",
    "the old bridge creaked under the morning wind .",
    "several lanterns flickered along the narrow path .",
    "the harvest festival drew a large cheerful crowd .",
    "an empty boat drifted slowly down the river .",
]


HOT_ENTITY = PER[0]  # appears in ~25% of PER slots → hot-key skew for linking
HOT_PROB = 0.25


def alias_forms(ent: str) -> list[str]:
    """Deterministic surface variants of an entity (FIXTURES.md §5):
    canonical, hyphenated (multi-token only; resolved by mention
    normalization), and a doubled-final-letter typo (resolved only by
    minhash/LSH near-dup linking)."""
    forms = [ent]
    if " " in ent:
        forms.append(ent.replace(" ", "-"))
    forms.append(ent + ent[-1])
    return forms


def _rng(i: int) -> random.Random:
    # random.Random(seed) is stable across CPython versions for these methods.
    return random.Random(42 * 1_000_003 + i)


def _pick(rng: random.Random, pool: list[str], not_equal: str | None = None) -> str:
    x = rng.choice(pool)
    if pool is PER and x != not_equal and rng.random() < HOT_PROB:
        x = HOT_ENTITY if HOT_ENTITY != not_equal else x
    while x == not_equal:
        x = rng.choice(pool)
    return x


def _surface(rng: random.Random, ent: str) -> str:
    """Render an entity as one of its alias surface forms (~15% aliased)."""
    roll = rng.random()
    if roll < 0.08 and " " in ent:
        return ent.replace(" ", "-")
    if roll < 0.15:
        return ent + ent[-1]
    return ent


def make_sentence(page_i: int, sent_j: int) -> tuple[str, list[tuple[str, str, str]]]:
    """Deterministically render sentence ``j`` of page ``i``.

    Returns ``(text, spo_list)`` where spo_list is a list of
    (subject, predicate, object) string triples (may be empty for
    distractor sentences — these exercise the argmax-fallback path of the
    reference, `models/model.py:230-233`).
    """
    rng = _rng(page_i * 131 + sent_j * 7 + 1)
    roll = rng.random()
    if roll < 0.10:  # distractor, no relation
        return rng.choice(DISTRACTORS), []

    def one_relation() -> tuple[str, list[tuple[str, str, str]]]:
        ridx = rng.randrange(NUM_RELATIONS)
        name, stype, otype, template, _ = RELATIONS[ridx]
        s = _pick(rng, ENTITY_TYPES[stype])
        o = _pick(rng, ENTITY_TYPES[otype], not_equal=s if stype == otype else None)
        s_sf = _surface(rng, s)
        o_sf = _surface(rng, o)
        # gold records the SURFACE form — the reference metric compares
        # emitted surface triples (lit_models/transformer.py:198-201)
        return template.format(s=s_sf, o=o_sf), [(s_sf, name, o_sf)]

    if roll < 0.30:  # two relations in one sentence, shared subject when types allow
        t1, spo1 = one_relation()
        t2, spo2 = one_relation()
        if spo1[0][1] == spo2[0][1]:  # same relation twice → degrade to one
            return t1, spo1
        text = t1[:-2].rstrip() + f" {_JOIN_WORD} " + t2
        return text, spo1 + spo2

    return one_relation()


def vocab_words() -> list[str]:
    """All lowercase word tokens the closed world can emit (sorted, unique).

    Page titles contain page numbers which are OOV on purpose (mapped to
    [UNK]); entities and template words are always in-vocab so triple
    detokenization is lossless.
    """
    words: set[str] = set()
    for pool in ENTITY_TYPES.values():
        for ent in pool:
            words.update(ent.split())
    for _, _, _, template, trigger in RELATIONS:
        for w in template.replace("{s}", "").replace("{o}", "").split():
            if w != ".":
                words.add(w)
        words.add(trigger)
    for d in DISTRACTORS:
        for w in d.split():
            if w != ".":
                words.add(w)
    words.add(_JOIN_WORD)
    for pool in ENTITY_TYPES.values():
        for ent in pool:
            # typo alias introduces a doubled-final-letter last word
            words.add(ent.split()[-1] + ent[-1])
    words.update(["page", "site", "navigation", "home", "about", "copyright"])
    words.update([".", ",", "!", "?", "-", "'", ":", ";"])
    return sorted(words)


def gold_cluster_rows() -> list[tuple[str, str, str]]:
    """(mention_surface, canonical_entity, etype) for every alias form —
    the entity-linking ground truth (FIXTURES.md §5). Mention surfaces
    are given in raw text form; tests normalize through the tokenizer
    round-trip the same way extraction output is produced."""
    rows = []
    for etype, pool in ENTITY_TYPES.items():
        for ent in pool:
            for form in alias_forms(ent):
                rows.append((form, ent, etype))
    return rows
