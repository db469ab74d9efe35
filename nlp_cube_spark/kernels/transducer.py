"""Generative char transduction: decision-list induction over aligned
pattern hierarchies, with backoff.

The learned lemmatizer / MWT expander (kernels/learned.py) are
perceptron CLASSIFIERS over the finite set of edit programs seen in
training: a truly novel inflection whose program was never enumerated
cannot be produced, where the reference's char seq2seq can (reference
lemmatizer.py:78-171 decodes arbitrary char strings; compound.py:183-245
likewise for contractions). This module closes that gap with the other
classic reduction (the CST/Mikheev-style suffix-rule-induction family —
public knowledge), which *composes* transductions for unseen forms
instead of choosing among memorized ones:

- every form maps to an ordered PATTERN LIST, most specific first:
  whole word, then progressively coarser shape abstractions (for
  lemmas: suffixes of decreasing length, length-bucketed so rules like
  "strip plural -s only when len > 3" are INDUCED, not hand-coded; for
  MWT: initial-char + final-chars shape templates, the geometry
  contraction sharing actually needs — 'das' learns from 'dos' via
  (d, s, len 3), which no pure suffix chain can express).
- induction: a pattern's class is the MAJORITY of its training
  observations (the classic CST-lemmatizer design: suffix rules carry
  the regular behavior, lexical exceptions override at the whole-word
  level, which is strictly more specific and therefore wins lookup).
  An exact tie is no evidence — tied patterns are dropped so lookup
  falls through to coarser ones.
- pruning: a usable pattern is stored only when its class differs from
  what its own backoff tail already yields — identity-heavy groups
  collapse to almost nothing. Pruning is sound because hierarchies are
  ALIGNED: two forms sharing a pattern share its entire tail (each
  coarser pattern is a function of the finer one), so "what the tail
  yields" is well-defined per pattern, not per form.
- lookup: first stored pattern in the form's list wins; no match ->
  the group's majority class.

Determinism: induction is order-independent (sets + sorted iteration);
lookup is a pure function of (table, patterns). Tables ship as pinned
JSON artifacts like every other micro-model (trained by
scripts/train_micro_transducers.py, gated on zero train error AND zero
error on large disjoint random shape batteries).
"""

from __future__ import annotations

LEN_BUCKET = 8  # lengths >= 8 behave uniformly in every induced rule set


def lemma_patterns(form: str, L: int = LEN_BUCKET) -> list[str]:
    """Whole word, then suffixes long->short, all length-bucketed."""
    low = form.lower()
    lenb = min(len(low), L)
    pats = [f"w:{low}:{lenb}"]
    for k in range(min(len(low), L), 0, -1):
        pats.append(f"suf{k}:{low[-k:]}:{lenb}")
    return pats


def mwt_patterns(form: str, L: int = LEN_BUCKET) -> list[str]:
    """Whole word, then (initial, final-k) contraction shapes, then bare
    finals — mirrors the feature ladder of learned.mwt_features so the
    transducer generalizes along the same shape axes the classifier
    does (e.g. pt 'das' rides ps1:d:s:3 evidence from 'dos')."""
    low = form.lower()
    lenb = min(len(low), L)
    return [
        f"w:{low}",
        f"ps2:{low[:1]}:{low[-2:]}:{lenb}",
        f"ps1:{low[:1]}:{low[-1:]}:{lenb}",
        f"s2:{low[-2:]}:{lenb}",
        f"s1:{low[-1:]}:{lenb}",
    ]


def induce(items: list[tuple[list[str], str]]) -> dict:
    """[(patterns, cls)] -> {"default": cls, "rules": {pattern: cls}}.

    `cls` strings are domain-opaque (lemma edit scripts or MWT
    programs); induction needs only equality. Patterns must come from
    an aligned hierarchy: forms sharing a pattern share its tail."""
    obs: dict[str, dict[str, int]] = {}
    tails: dict[str, list[str]] = {}
    depth: dict[str, int] = {}
    freq: dict[str, int] = {}
    for pats, cls in items:
        freq[cls] = freq.get(cls, 0) + 1
        for i, p in enumerate(pats):
            counts = obs.setdefault(p, {})
            counts[cls] = counts.get(cls, 0) + 1
            if p not in tails:
                tails[p] = pats[i + 1 :]
                depth[p] = i
    if not freq:
        raise ValueError("cannot induce from zero items")
    # majority default; ties break on the lexicographically first class
    default = max(sorted(freq), key=lambda c: freq[c])
    kept: dict[str, str] = {}

    def _majority(counts: dict[str, int]) -> str | None:
        best = max(counts.values())
        top = sorted(c for c, n in counts.items() if n == best)
        return top[0] if len(top) == 1 else None  # exact tie: no evidence

    def _resolve(tail: list[str]) -> str:
        for p in tail:
            if p in kept:
                return kept[p]
        return default

    # coarsest first: backoff targets are decided before the patterns
    # that back off to them
    for p in sorted(obs, key=lambda p: (-depth[p], p)):
        cls = _majority(obs[p])
        if cls is not None and _resolve(tails[p]) != cls:
            kept[p] = cls
    return {"default": default, "rules": dict(sorted(kept.items()))}


def lookup(table: dict, patterns: list[str]) -> str:
    """First stored pattern wins (patterns are most-specific-first)."""
    rules = table["rules"]
    for p in patterns:
        c = rules.get(p)
        if c is not None:
            return c
    return table["default"]
