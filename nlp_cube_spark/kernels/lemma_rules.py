"""Deterministic lemmatizer: lemma = f(form, upos, lang).

The reference's seq2seq lemmatizer decodes characters with per-character
case classes {2: upper, 3: lower} (cube/networks/lemmatizer.py:210-224) and
its training data dedups on exactly (word, lang, upos)
(cube/networks/utils.py:109-115) — i.e. the lemma is a pure function of that
key. We exploit that: the Spark stage computes `distinct (form, upos, lang)`,
runs this kernel once per key, and broadcast-joins the result back
(SURVEY.md §2a #17). This also structurally fixes the reference's latent
positional-misalignment bug for >25-char words (utils.py:109-110 vs
lemmatizer.py:225-229).

Length failsafe: the reference caps decode at 20x input length
(lemmatizer.py:139-141); a rule lemmatizer can't run away, but we keep the
cap as an explicit guard for parity.
"""

from __future__ import annotations

import functools

from . import lexicon as L

MAX_EXPANSION = 20  # reference lemmatizer.py:141

_VERB_LEMMAS = L.all_verb_lemmas()

_ES_VERB_SUFFIX = {"a": "ar", "e": "er"}


def _recase(lemma: str, form: str, upos: str) -> str:
    """Case-class semantics: PROPN keeps original casing (class 2 on the
    initial), everything else lower-cases (class 3)."""
    if upos == "PROPN":
        return lemma[:1].upper() + lemma[1:] if lemma else lemma
    return lemma.lower()


@functools.lru_cache(maxsize=131072)
def lemmatize(form: str, upos: str, lang: str) -> str:
    low = form.lower()
    if upos in ("PUNCT", "SYM", "NUM"):
        return form
    if upos == "AUX":
        return L.AUX_COP.get(low, low)
    if upos == "VERB":
        if low in _VERB_LEMMAS:
            return _recase(_VERB_LEMMAS[low], form, upos)
        if lang in ("es", "pt") and low[-1:] in _ES_VERB_SUFFIX:
            return _recase(low[:-1] + _ES_VERB_SUFFIX[low[-1]], form, upos)
        if low.endswith("ies") and len(low) > 4:
            return _recase(low[:-3] + "y", form, upos)
        if low.endswith("ed") and len(low) > 3:
            return _recase(low[:-2], form, upos)
        if low.endswith("ing") and len(low) > 4:
            return _recase(low[:-3], form, upos)
        if low.endswith("s") and len(low) > 2 and not low.endswith("ss"):
            return _recase(low[:-1], form, upos)
        return _recase(low, form, upos)
    if upos == "NOUN":
        if low in L.IRREGULAR_NOUN_LEMMA:
            return _recase(L.IRREGULAR_NOUN_LEMMA[low], form, upos)
        if low.endswith("ies") and len(low) > 4:
            return _recase(low[:-3] + "y", form, upos)
        if low.endswith("s") and len(low) > 3 and not low.endswith("ss"):
            return _recase(low[:-1], form, upos)
        return _recase(low, form, upos)
    if upos == "PROPN":
        return _recase(low, form, upos)
    out = _recase(low, form, upos)
    return out[: max(1, MAX_EXPANSION * len(form))]
