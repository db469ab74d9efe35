#!/usr/bin/env python
"""Train the generative char transducers (kernels/transducer.py):
suffix-rule induction for the lemmatizer, shape-template induction for
the MWT expander. Ship gate: zero train error AND zero error on large
DISJOINT random shape batteries (the open-vocabulary guarantee the
perceptron classifiers could only approximate), plus the same held-out
contraction generalizations the learned MWT expander is tested on.

    python scripts/train_micro_transducers.py

Writes kernels/micro_lemma_transducer.json + micro_mwt_transducer.json
and prints their sha256 for io/modelstore._CATALOG.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nlp_cube_spark.kernels import learned, lemma_rules, lexicon, segment_rules, transducer as T

KERNELS_DIR = os.path.join(REPO, "nlp_cube_spark", "kernels")

LANGS = ["en", "de", "es", "fr", "pt", "zh"]
UPOS_LIST = [
    "NOUN", "VERB", "PROPN", "AUX", "ADJ", "ADV", "DET", "ADP", "PRON",
    "PUNCT", "NUM", "SYM", "CCONJ", "SCONJ", "PART", "INTJ", "X",
]
VERBATIM_UPOS = {"PUNCT", "SYM", "NUM"}  # lemma == form at any casing

ALPHA = "abcdefghijklmnopqrstuvwxyz"
# the suffix inventory lemma_rules branches on, plus near-miss shapes so
# length cutoffs and 'almost-suffix' boundaries are induced, not guessed
SUFFIXES = ["", "s", "ss", "es", "ies", "ied", "ed", "ing", "ings", "ng", "ly",
            "y", "e", "a", "o", "er", "ers", "n", "d", "g", "t", "r", "ress"]


def _load_script(name: str):
    p = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _lexicon_words() -> list[str]:
    return sorted(
        set(lexicon.all_verb_lemmas())
        | set(lexicon.AUX_COP)
        | set(lexicon.IRREGULAR_NOUN_LEMMA)
    )


def shape_battery(seed: int) -> list[str]:
    """Deterministic open-vocabulary form battery. Three layers:
    (a) exhaustive (preceding char x suffix x length) grid — every
        suffix decision lemma_rules can make is observed at every
        length bucket behind every possible preceding character;
    (b) lexicon-exception shadows — for each lexicon word, sibling
        forms sharing each of its suffixes, so an exception conflicts
        its suffix chain into backoff instead of shadowing regular
        rules for unseen look-alikes ('merge' must not teach 'vurge');
    (c) unconstrained random words for bulk coverage.
    Casing variants ride along (capitalized + a sprinkle of ALLCAPS)."""
    rng = random.Random(seed)
    forms: set[str] = set()

    def rand(n: int) -> str:
        return "".join(rng.choice(ALPHA) for _ in range(n))

    for suf in SUFFIXES:
        for c in ALPHA:
            for total in range(len(suf) + 1, len(suf) + 10):
                base_len = total - len(suf) - 1
                form = rand(base_len) + c + suf
                forms.add(form)
                if rng.random() < 0.3:
                    forms.add(form.capitalize())
                if rng.random() < 0.05:
                    forms.add(form.upper())
    for w in _lexicon_words():
        for k in range(1, min(len(w), 7) + 1):
            for _ in range(3):
                pre = max(0, len(w) - k - 1)
                c = rng.choice(ALPHA.replace(w[-k - 1], "") if k < len(w) else ALPHA)
                forms.add(rand(pre) + c + w[-k:])
                forms.add(rand(rng.randint(0, 3)) + c + w[-k:])
    for _ in range(1500):
        forms.add(rand(rng.randint(1, 12)))
    return sorted(forms)


def lemma_items(keys) -> dict[str, list[tuple[list[str], str]]]:
    """(form, upos, lang) keys -> per-group (patterns, canonical class)
    items, gold from lemma_rules exactly like the classifier trainer."""
    groups: dict[str, list[tuple[list[str], str]]] = {}
    for form, upos, lang in keys:
        gold = lemma_rules.lemmatize(form, upos, lang)
        prefer = ("orig", "low", "cap") if upos in VERBATIM_UPOS else ("low", "cap", "orig")
        cls = learned.canonical_edit(form, gold, prefer=prefer)
        assert learned.apply_edit(form, cls) == gold, (form, upos, lang, cls, gold)
        groups.setdefault(f"{upos}|{lang}", []).append((T.lemma_patterns(form), cls))
    return groups


def train_lemma() -> dict:
    tl = _load_script("train_micro_lemmatizer")
    corpus_keys = list(
        dict.fromkeys(tl.lemma_keys(400, 7) + tl.salad_keys() + tl.generalization_keys())
    )
    battery = shape_battery(13)
    battery_keys = [
        (f, u, lang) for u in UPOS_LIST for lang in LANGS for f in battery
    ]
    lex_keys = [
        (w, u, lang)
        for u in ("VERB", "NOUN", "AUX", "PROPN")
        for lang in LANGS
        for w in _lexicon_words()
    ]
    keys = list(dict.fromkeys(corpus_keys + lex_keys + battery_keys))
    print(f"lemma transducer: {len(keys)} training keys")
    tables = {g: T.induce(items) for g, items in sorted(lemma_items(keys).items())}
    return tables


def eval_lemma(tables: dict, keys, label: str) -> int:
    wrong = 0
    for form, upos, lang in keys:
        gold = lemma_rules.lemmatize(form, upos, lang)
        tab = tables.get(f"{upos}|{lang}") or tables.get(f"{upos}|en")
        cls = T.lookup(tab, T.lemma_patterns(form)) if tab else "0||low"
        got = learned.apply_edit(form, cls)
        if got != gold:
            if wrong < 10:
                print(f"  MISS {label}: {form!r} {upos} {lang}: {got!r} != {gold!r}")
            wrong += 1
    print(f"  {label}: {len(keys) - wrong}/{len(keys)}")
    return wrong


def train_mwt() -> tuple[dict, list]:
    tm = _load_script("train_micro_mwt")
    groups: dict[str, list[tuple[list[str], str]]] = {}
    for lang, surface, words in tm.TRAIN_PAIRS:
        prog = learned.mwt_program(surface, words)
        assert learned.apply_mwt_program(surface, prog) == [w.lower() for w in words] or \
            learned.apply_mwt_program(surface, prog) == words, (surface, prog, words)
        groups.setdefault(lang, []).append((T.mwt_patterns(surface), prog))
    tables = {lang: T.induce(items) for lang, items in sorted(groups.items())}
    held = getattr(tm, "HELDOUT_PAIRS", [])
    return tables, held


def eval_mwt(tables: dict, pairs, label: str) -> int:
    wrong = 0
    for lang, surface, words in pairs:
        tab = tables.get(lang)
        got = (
            learned.apply_mwt_program(surface, T.lookup(tab, T.mwt_patterns(surface)))
            if tab
            else [surface]
        )
        want = [w.lower() for w in words] if surface == surface.lower() else words
        if got != want:
            if wrong < 10:
                print(f"  MISS {label}: {lang} {surface!r}: {got!r} != {words!r}")
            wrong += 1
    print(f"  {label}: {len(pairs) - wrong}/{len(pairs)}")
    return wrong


def main() -> None:
    print("training lemma transducer")
    lem_tables = train_lemma()
    tl = _load_script("train_micro_lemmatizer")
    train_keys = list(
        dict.fromkeys(tl.lemma_keys(400, 7) + tl.salad_keys() + tl.generalization_keys())
    )
    bad = eval_lemma(lem_tables, train_keys, "train-corpus")
    held_corpus = tl.lemma_keys(120, 909)
    bad += eval_lemma(lem_tables, held_corpus, "holdout-corpus")
    # the open-vocabulary gate: a DISJOINT random battery (fresh seed)
    eval_batt = shape_battery(99)
    for upos in UPOS_LIST:
        bad += eval_lemma(
            lem_tables, [(f, upos, "en") for f in eval_batt], f"open-{upos}-en"
        )
    for lang in ("es", "pt", "de", "zh"):
        bad += eval_lemma(
            lem_tables, [(f, "VERB", lang) for f in eval_batt], f"open-VERB-{lang}"
        )
        bad += eval_lemma(
            lem_tables, [(f, "NOUN", lang) for f in eval_batt], f"open-NOUN-{lang}"
        )

    print("training mwt transducer")
    mwt_tables, held = train_mwt()
    tm = _load_script("train_micro_mwt")
    mwt_bad = eval_mwt(mwt_tables, tm.TRAIN_PAIRS, "train")
    if held:
        mwt_bad += eval_mwt(mwt_tables, held, "heldout-contraction")
    # unseen ordinary words must pass through verbatim in every language
    rng = random.Random(7)
    idrand = [
        (lang, f)
        for lang in LANGS
        for f in {
            "".join(rng.choice(ALPHA) for _ in range(rng.randint(4, 10)))
            for _ in range(200)
        }
    ]
    id_wrong = 0
    for lang, f in idrand:
        tab = mwt_tables.get(lang)
        got = (
            learned.apply_mwt_program(f, T.lookup(tab, T.mwt_patterns(f)))
            if tab
            else [f]
        )
        if got != [f]:
            if id_wrong < 10:
                print(f"  MISS identity: {lang} {f!r} -> {got!r}")
            id_wrong += 1
    print(f"  identity-random: {len(idrand) - id_wrong}/{len(idrand)}")
    mwt_bad += id_wrong

    # GATE BEFORE WRITING: overwriting the shipped JSONs on a failed run
    # would leave checksum-mismatched artifacts that brick every
    # _load_artifact call until manually reverted
    if bad or mwt_bad:
        print("  WARNING: imperfect parity — artifacts NOT written")
        sys.exit(1)

    for name, tables in (
        ("micro_lemma_transducer.json", lem_tables),
        ("micro_mwt_transducer.json", mwt_tables),
    ):
        out_path = os.path.join(KERNELS_DIR, name)
        with open(out_path, "w") as f:
            json.dump(tables, f, indent=1, sort_keys=True)
        digest = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
        n_rules = sum(len(t["rules"]) for t in tables.values())
        print(f"  wrote {out_path} ({n_rules} rules)")
        print(f"  sha256 {digest}  <- update io/modelstore._CATALOG")


if __name__ == "__main__":
    main()
