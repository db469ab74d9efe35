"""Deterministic UPOS/XPOS/FEATS tagger.

Plays the role of the reference's joint tagging head (cube/networks/
parser.py:404-448 writes upos/xpos/attrs; standalone tagger.py:288-329).
Same output contract: one (upos, xpos, feats) triple per word; FEATS stays
an unexploded `k=v|k=v` string for CoNLL-U parity (SURVEY.md §1.4).
"""

from __future__ import annotations

import functools
import re

from . import lexicon as L

_NUM_RE = re.compile(r"^\d[\d.,]*$")


@functools.lru_cache(maxsize=131072)
def tag_word(form: str, lang: str, is_first: bool) -> tuple[str, str, str]:
    low = form.lower()
    if form in L.PUNCT:
        return "PUNCT", form if form in {".", ","} else ".", "_"
    if _NUM_RE.match(form):
        return "NUM", "CD", "NumType=Card"
    if low in L.AUX_COP:
        feats = "Mood=Ind|Number=Sing|Person=3|Tense=Pres|VerbForm=Fin" if low in {"is", "am"} else (
            "Mood=Ind|Tense=Past|VerbForm=Fin" if low in {"was", "were"} else "VerbForm=Fin"
        )
        return "AUX", "VBZ" if low == "is" else "VBD" if low in {"was", "were"} else "VB", feats
    if lang == "en" and low in {"a", "an", "the"}:
        xpos = "DT"
        feats = "Definite=Def|PronType=Art" if low == "the" else "Definite=Ind|PronType=Art"
        return "DET", xpos, feats
    if lang != "en" and low in {"el", "le", "la", "les", "los", "o"}:
        return "DET", "DT", "Definite=Def|PronType=Art"
    if lang != "en" and low in {"a", "de", "à", "sur", "en"}:
        return "ADP", "IN", "_"
    if low in L.ADPS and lang == "en" and low not in {"a"}:
        return "ADP", "IN", "_"
    if low in L.PRONS:
        return "PRON", "PRP", "PronType=Prs"
    if low in L.VERBS_3SG:
        return "VERB", "VBZ", "Mood=Ind|Number=Sing|Person=3|Tense=Pres|VerbForm=Fin"
    if low in L.VERBS_PAST:
        return "VERB", "VBD", "Mood=Ind|Tense=Past|VerbForm=Fin"
    if low in L.VERBS_BARE:
        return "VERB", "VB", "VerbForm=Inf"
    if form in L.PROPER or (form[:1].isupper() and not is_first):
        return "PROPN", "NNP", "Number=Sing"
    if low in L.IRREGULAR_NOUN_LEMMA:
        return "NOUN", "NNS", "Number=Plur"
    if low.endswith("s") and len(low) > 3 and low[:-1] in _NOUN_SET:
        return "NOUN", "NNS", "Number=Plur"
    return "NOUN", "NN", "Number=Sing"


_NOUN_SET = {n.lower() for n in L.NOUNS}


def tag_sentence(forms: list[str], lang: str) -> list[tuple[str, str, str]]:
    return [tag_word(f, lang, i == 0) for i, f in enumerate(forms)]
