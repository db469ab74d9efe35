"""Drop-in user API matching the reference's surface (cube/api.py).

Reference usage (README.md:48-58):

    from cube.api import Cube
    cube = Cube()
    cube.load("en")
    document = cube(text)
    print(document.sentences[0][2].upos)

Ours:

    from nlp_cube_spark.api import Cube
    cube = Cube()
    cube.load("en")                      # no-op accepted for compatibility
    document = cube(text)                # single text -> eager kernel path
    print(document.sentences[0][2].upos)
    str(document)                        # CoNLL-U serialization (__repr__)

    triples = cube.triples(text)         # the KG extension
    words_df = cube.process(spark, pages_df)   # batch mode -> words DF
    trips_df = cube.process_triples(spark, pages_df)

Single-document calls run the kernels eagerly in-process (the reference's
own execution model — cheap for one doc); DataFrame calls route to the
fused Arrow stages.

Word attribute names follow the reference exactly: index, word, lemma,
upos, xpos, attrs, head, label, deps, space_after (README.md:59).
"""

from __future__ import annotations

from .kernels.segment_rules import MWT_LEXICON
from .oracle import annotate_document, extract_triples


class Word:
    __slots__ = ("index", "word", "lemma", "upos", "xpos", "attrs", "head", "label", "deps", "space_after", "mwt_id")

    def __init__(self, index, word, lemma, upos, xpos, attrs, head, label, space_after, mwt_id=0):
        self.index = index
        self.word = word
        self.lemma = lemma
        self.upos = upos
        self.xpos = xpos
        self.attrs = attrs
        self.head = head
        self.label = label
        self.deps = "_"
        self.space_after = space_after
        self.mwt_id = mwt_id

    def _misc(self):
        return "_" if self.space_after else "SpaceAfter=No"

    def __repr__(self):
        return "\t".join(
            [str(self.index), self.word, self.lemma, self.upos, self.xpos,
             self.attrs, str(self.head), self.label, self.deps, self._misc()]
        )


class Sentence:
    def __init__(self, words, lang: str):
        self.words = words
        self.lang = lang

    def __getitem__(self, i):
        return self.words[i]

    def __len__(self):
        return len(self.words)

    @property
    def text(self):
        # reference _detokenize (objects.py:109-115)
        out = []
        emitted = set()
        for w in self.words:
            if w.mwt_id and w.mwt_id in emitted:
                continue
            if w.mwt_id:
                emitted.add(w.mwt_id)
                group = [x for x in self.words if x.mwt_id == w.mwt_id]
                surface = next(
                    (s for s, exp in MWT_LEXICON.get(self.lang, {}).items() if exp == [x.word for x in group]),
                    "".join(x.word for x in group),
                )
                out.append(surface + (" " if group[-1].space_after else ""))
            else:
                out.append(w.word + (" " if w.space_after else ""))
        return "".join(out).strip()

    def __repr__(self):
        lines, emitted = [], set()
        for w in self.words:
            if w.mwt_id and w.mwt_id not in emitted:
                emitted.add(w.mwt_id)
                group = [x for x in self.words if x.mwt_id == w.mwt_id]
                surface = next(
                    (s for s, exp in MWT_LEXICON.get(self.lang, {}).items() if exp == [x.word for x in group]),
                    "".join(x.word for x in group),
                )
                lines.append(
                    "\t".join([f"{group[0].index}-{group[-1].index}", surface,
                               "_", "_", "_", "_", "_", "_", "_", group[-1]._misc()])
                )
            lines.append(repr(w))
        return "\n".join(lines)


class Document:
    def __init__(self, sentences):
        self.sentences = sentences

    def __repr__(self):
        return "\n\n".join(repr(s) for s in self.sentences) + "\n"


class Cube:
    """Reference-compatible entry object (cube/api.py:183-211)."""

    def __init__(self, verbose: bool = False):
        self._lang = "en"

    def load(self, lang: str = "en", device: str = "cpu", **_):
        """Accepts the reference signature; models are the built-in
        deterministic kernels, so nothing downloads."""
        self._lang = lang
        return self

    def __call__(self, text, flavour: str | None = None) -> Document:
        lang = (flavour or self._lang).split("_")[0]
        if isinstance(text, Document):
            # entry point B (reference api.py cube(document)): keep the
            # provided tokenization, redo tagging/parsing/lemmas
            return self._reannotate_document(text, lang)
        sents = []
        for owords in annotate_document(text, lang):
            words = [
                Word(w.word_id, w.form, w.lemma, w.upos, w.xpos, w.feats,
                     w.head, w.deprel, w.space_after, w.mwt_id)
                for w in owords
            ]
            sents.append(Sentence(words, lang))
        return Document(sents)

    def _reannotate_document(self, doc: Document, lang: str) -> Document:
        from .kernels import arc_scores, lemma_rules, mst, tagger_rules

        sents = []
        for sent in doc.sentences:
            forms = [w.word for w in sent.words]
            tags = tagger_rules.tag_sentence(forms, lang)
            upos = [t[0] for t in tags]
            heads = mst.decode_tree(arc_scores.score_matrix(forms, upos)).tolist()
            labels = arc_scores.label_arcs(forms, upos, heads)
            words = [
                Word(
                    w.index, w.word,
                    lemma_rules.lemmatize(w.word, upos[i], lang),
                    upos[i], tags[i][1], tags[i][2], int(heads[i]), labels[i],
                    w.space_after, w.mwt_id,
                )
                for i, w in enumerate(sent.words)
            ]
            sents.append(Sentence(words, lang))
        return Document(sents)

    # ---- KG extension -------------------------------------------------
    def triples(self, text: str, flavour: str | None = None):
        lang = (flavour or self._lang).split("_")[0]
        out = []
        for sid, sent in enumerate(annotate_document(text, lang)):
            for s, p, o, pat in extract_triples(sent):
                out.append({"sent_id": sid, "subj": s, "pred": p, "obj": o, "pattern": pat})
        return out

    # ---- batch (Spark) mode -------------------------------------------
    # kernels= selects the implementation behind every model seam:
    # "rules" (v0 default) or "learned" (pinned-weight micro-models —
    # boundary classifier, joint tagger, biaffine-style parser). Output is
    # identical on the fixture grammar (tests/test_learned_kernel.py); the
    # option exists so a retrained artifact swap is one argument.
    def process(self, spark, pages_df, kernels: str = "rules"):
        from .operators.annotate import annotate

        return annotate(pages_df, scorer=kernels, tagger=kernels, boundary=kernels)

    def process_triples(self, spark, pages_df, kernels: str = "rules"):
        from .operators.annotate import fused_triples

        return fused_triples(pages_df, scorer=kernels, tagger=kernels, boundary=kernels)
