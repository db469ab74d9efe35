"""Closed-world lexicon: the deterministic stand-in for trained weights.

The reference ships per-language learned models (Encodings + checkpoints,
cube/api.py:40-106). v0 of this engine is model-free (SURVEY.md §7): the
lexicon below plays the role of those weights for the seeded fixture
vocabulary, and suffix heuristics cover out-of-vocabulary forms. It is
dimension-sized (KBs) and shipped to executors by closure capture — the same
transport we would use for `Encodings` dicts (sc.broadcast for MB-sized).
"""

from __future__ import annotations

# --- fixture vocabulary -------------------------------------------------
PROPER = [
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
    "Iris", "Jack", "Kara", "Liam", "Mona", "Noah", "Mars", "Paris",
    "Tokyo", "Berlin", "Kyoto", "Cairo",
]
NOUNS = [
    "scientist", "engineer", "painter", "teacher", "doctor", "pilot",
    "writer", "farmer", "singer", "robot", "city", "planet", "team",
    "book", "song", "reports", "papers", "ideas",
]
# 3sg-present transitive verbs with lemmas
VERBS_3SG = {
    "admires": "admire", "praises": "praise", "visits": "visit",
    "helps": "help", "supports": "support", "mentions": "mention",
    "quotes": "quote", "follows": "follow", "trusts": "trust",
    "joins": "join", "viaja": "viajar",
}
VERBS_PAST = {
    "admired": "admire", "praised": "praise", "visited": "visit",
    "helped": "help", "supported": "support", "mentioned": "mention",
    "quoted": "quote", "followed": "follow", "trusted": "trust",
    "joined": "join", "sat": "sit", "worked": "work", "lived": "live",
    "arrived": "arrive", "stayed": "stay",
}
# bare forms that act as verbs in web-salad text (keeps the flagship query
# on /root/testdata documents producing triples)
VERBS_BARE = {"join": "join", "merge": "merge", "sort": "sort", "filter": "filter"}

DETS = {"a", "an", "the", "el", "le", "la", "les", "los", "o"}
AUX_COP = {"is": "be", "was": "be", "are": "be", "were": "be", "be": "be", "am": "be", "been": "be"}
ADPS = {"on", "in", "at", "near", "with", "of", "to", "a", "de", "à", "sur"}
PRONS = {"this", "that", "it", "he", "she", "they", "we"}
PUNCT = {".", ",", "!", "?", ";", ":", "'", '"', "(", ")", "-"}

# es/fr forms that are ADP or DET after MWT expansion: "a"/"de" ADP, "el" DET.
# English "a" is DET; disambiguate by lang in the tagger.

IRREGULAR_NOUN_LEMMA = {"reports": "report", "papers": "paper", "ideas": "idea"}

UPOS_TO_XPOS = {
    "NOUN": "NN", "PROPN": "NNP", "DET": "DT", "ADP": "IN", "AUX": "VBZ",
    "PRON": "PRP", "PUNCT": ".", "NUM": "CD", "CCONJ": "CC", "X": "XX",
}


def all_verb_lemmas() -> dict[str, str]:
    out = dict(VERBS_BARE)
    out.update(VERBS_3SG)
    out.update(VERBS_PAST)
    return out
