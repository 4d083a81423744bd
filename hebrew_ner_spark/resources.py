"""Deterministic gazetteer / predicate inventory for the synthetic corpus.

The reference detects mentions with a neural labeller (model/seqlabel.py) —
a learned function token -> BIOSE label. This sandbox has no torch, so the
engine ships a deterministic gazetteer "model" with the exact same UDF
interface (SURVEY.md §7 stage 4): a drop-in neural labeller would replace
only the kernel inside the Arrow batch, not the plan.

The synthetic `documents` table draws from a closed 31-word vocabulary; we
partition it into entities (noun-like), predicates (verb-like) and other.
These sets are frozen — tests and DuckDB oracles embed the same literals.
"""

# Noun-like vocabulary -> KG entities.
ENTITY_TERMS = [
    "batch",
    "column",
    "customer",
    "data",
    "group",
    "hash",
    "key",
    "line",
    "order",
    "part",
    "query",
    "row",
    "spark",
    "stream",
    "table",
    "value",
    "vector",
    "window",
]

# Verb-like vocabulary -> relation predicates.
PREDICATE_TERMS = ["agg", "filter", "join", "merge", "scan", "sort"]

# Adjective-like vocabulary -> entity attributes (dependency-pattern
# relation extraction: ADJ ENT modifies the following entity).
ADJECTIVE_TERMS = ["big", "fast", "slow", "small"]

# Everything else ("the", "a", "dup") is non-mention filler.

# Deterministic morphological dictionary for the synthetic corpus: tokens
# that "segment" into two morphemes (the YAP-analyzer stand-in; every other
# token is a single morpheme). Frozen — oracles embed the same literals.
MORPH_SPLITS = {
    "customer": ["custom", "er"],
    "window": ["wind", "ow"],
    "stream": ["str", "eam"],
    "vector": ["vect", "or"],
    "table": ["tab", "le"],
    "column": ["col", "umn"],
    "order": ["ord", "er"],
    "value": ["val", "ue"],
    "batch": ["bat", "ch"],
    "filter": ["filt", "er"],
    "merge": ["mer", "ge"],
}

# Reduced gazetteer used as the deterministic "gold" labeller for the
# evaluation operators (so pred vs gold P/R/F is non-trivial).
EVAL_GOLD_ENTITY_TERMS = [t for t in ENTITY_TERMS if t not in ("batch", "window", "hash")]

# Hebrew prefix particles the morphological analyzer peels off
# (the reference's linguistic regrouping rules enumerate the same set:
# utils/ner.py:260-330 handles ב/ל/כ/ה/ש/ו/מ and the combos וש/כש).
HEB_PREFIXES = ["ו", "ש", "ה", "ב", "כ", "ל", "מ", "וש", "כש", "וה", "בה", "לה", "כה", "מה", "ושה"]

# Deterministic ontology classes over the entity gazetteer (the type
# dimension domain/range induction works against). Frozen — oracles and
# tests embed the same literals.
ENTITY_TYPES = {
    # agent-like: things that DO operations
    "customer": "AGENT",
    "query": "AGENT",
    "spark": "AGENT",
    # data-like: things operations act ON
    "batch": "DATA",
    "column": "DATA",
    "data": "DATA",
    "line": "DATA",
    "part": "DATA",
    "row": "DATA",
    "stream": "DATA",
    "table": "DATA",
    "value": "DATA",
    "vector": "DATA",
    # key-like: things operations organize BY
    "group": "KEY",
    "hash": "KEY",
    "key": "KEY",
    "order": "KEY",
    "window": "KEY",
}
assert set(ENTITY_TYPES) == set(ENTITY_TERMS)

# Anaphoric vocabulary -> coreference sieve targets (operators/coref.py).
# In the synthetic grammar the indefinite "a" is the anaphor: it refers
# to the nearest preceding entity mention in the document. "the" stays
# plain filler (it also serves as the gap token in deppat patterns).
PRONOUN_TERMS = ["a"]

# Declared class hierarchy (child -> parent, rdfs:subClassOf). The flat
# ENTITY_TYPES classes sit under two intermediate classes and a root —
# three levels, so transitive closure and inherited-type inference have
# real work (operators/kg.py rdfs closure). Frozen — oracles embed it.
TYPE_HIERARCHY = {
    "AGENT": "ACTOR",
    "ACTOR": "THING",
    "DATA": "ARTIFACT",
    "KEY": "ARTIFACT",
    "ARTIFACT": "THING",
}
