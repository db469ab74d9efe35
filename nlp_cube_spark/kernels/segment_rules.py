"""Deterministic sentence/token boundary classifier + decoder.

The reference scores each pre-token with a 5-class head
{0 PAD, 1 inside-token, 2 token-end, 3 MWT-token-end, 4 sentence-end}
(cube/networks/tokenizer.py:53,70-127) and then greedily decodes the label
stream into sentences/tokens (tokenizer.py:258-304). We keep the exact label
alphabet and the exact decode state machine, but replace the CNN with
deterministic rules (v0 is model-free; see SURVEY.md §7). The rules are the
"trained model" for our seeded fixture grammar.

Chunking: the reference windows the pre-token stream at seq_len=300 with
100-token overlapped context either side (utils_tokenizer.py:58-112) purely
so the CNN sees context across chunk borders; the labels for the main window
are position-independent. Our rule classifier needs one token of lookahead,
so we window identically and carry `overlap` context — exercising the same
boundary bookkeeping — then concatenate main-window labels.
"""

from __future__ import annotations

from .pretokenizer import NO_SPACE, SPACE

PAD, INSIDE, TOK_END, MWT_END, SENT_END = 0, 1, 2, 3, 4

SEQ_LEN = 300  # reference utils_tokenizer.py:97
OVERLAP = 100

SENT_PUNCT = {".", "!", "?"}

# Multi-word surface tokens per language (reference gates MWT expansion on a
# per-language CWE model, api.py:119-120; these play that model's role).
MWT_LEXICON: dict[str, dict[str, list[str]]] = {
    "es": {"del": ["de", "el"], "al": ["a", "el"]},
    "fr": {"du": ["de", "le"], "des": ["de", "les"], "aux": ["à", "les"]},
    "pt": {"do": ["de", "o"], "da": ["de", "a"]},
}


def classify_window(toks: list[str], spa: list[int], start: int, stop: int, lang: str) -> list[int]:
    """Label pre-tokens [start, stop) with full-stream context available."""
    mwt = MWT_LEXICON.get(lang, {})
    labels = []
    n = len(toks)
    for i in range(start, stop):
        t = toks[i]
        if (
            t in {",", "."}
            and spa[i] == NO_SPACE
            and 0 < i < n - 1
            and toks[i - 1].isdigit()
            and toks[i + 1].isdigit()
        ):
            # separator inside a grouped/decimal number: "3" "." "5"
            labels.append(INSIDE)
        elif t in SENT_PUNCT:
            labels.append(SENT_END)
        elif t.lower() in mwt and spa[i] == SPACE:
            labels.append(MWT_END)
        elif (
            t.isdigit()
            and spa[i] == NO_SPACE
            and i + 2 < n
            and toks[i + 1] in {",", "."}
            and spa[i + 1] == NO_SPACE
            and toks[i + 2].isdigit()
        ):
            # grouped numbers: "1" "," "000" -> one token "1,000"
            labels.append(INSIDE)
        elif t in {",", "."} and spa[i] == NO_SPACE and i + 1 < n and toks[i + 1].isdigit() and i > 0 and toks[i - 1].isdigit():
            labels.append(INSIDE)
        else:
            labels.append(TOK_END)
    return labels


def classify(toks: list[str], spa: list[int], lang: str) -> list[int]:
    """Window the stream exactly like the reference dataset, classify each
    main window with overlap context, concatenate."""
    n = len(toks)
    if n == 0:
        return []
    labels: list[int] = []
    num_windows = n // SEQ_LEN + (1 if n % SEQ_LEN else 0)
    for w in range(num_windows):
        start = w * SEQ_LEN
        stop = min(start + SEQ_LEN, n)
        # context bounds (unused values, kept to mirror the reference's
        # window construction and to keep the classifier honest about only
        # seeing [left, right))
        left = max(0, start - OVERLAP)
        right = min(n, stop + OVERLAP)
        assert left <= start and stop <= right
        labels.extend(classify_window(toks, spa, start, stop, lang))
    return labels


def decode(
    toks: list[str], spa: list[int], labels: list[int]
) -> list[list[tuple[str, bool, bool]]]:
    """Greedy label-stream decode -> sentences of (form, space_after, is_mwt).

    State machine semantics match reference tokenizer.py:258-304: accumulate
    pre-token text; emit a token on labels {2,3,4}; flush the sentence on 4;
    whatever is left at the end becomes a final token/sentence.
    Space-after for a composed token is the flag of its *last* pre-token.
    """
    sents: list[list[tuple[str, bool, bool]]] = []
    sent: list[tuple[str, bool, bool]] = []
    buf = ""
    for tok, flag, lab in zip(toks, spa, labels):
        buf += tok.replace("▁", "")
        if lab in (TOK_END, MWT_END, SENT_END):
            if buf.strip():
                sent.append((buf, flag == SPACE, lab == MWT_END))
            buf = ""
        if lab == SENT_END:
            if sent:
                sents.append(sent)
            sent = []
    if buf.strip():
        sent.append((buf, spa[-1] == SPACE if spa else True, False))
    if sent:
        sents.append(sent)
    return sents


NO_SPACE_LANGS = {"zh", "ja", "th"}  # reference autodetects per model
# (tokenizer.py:327-338 samples the corpus); ours is a per-lang config


def is_no_space_lang(lang: str) -> bool:
    return (lang or "").split("_")[0] in NO_SPACE_LANGS


def segment(text: str, lang: str, no_space_lang: bool | None = None, boundary: str = "rules"):
    """normalize -> pretokenize -> classify -> decode, one document.

    no_space_lang=None derives the mode from `lang` (zh/ja-style
    char-per-token pre-tokenization, reference utils_tokenizer.py:37-38).
    `boundary` picks the label classifier behind the seam ('rules' default,
    'learned' = pinned-weight micro-model in kernels/learned.py)."""
    from .pretokenizer import normalize_ws, pretokenize

    if no_space_lang is None:
        no_space_lang = is_no_space_lang(lang)
    norm = normalize_ws(text)
    toks, spa = pretokenize(norm, no_space_lang=no_space_lang)
    if boundary == "rules":
        labels = classify(toks, spa, lang)
    else:
        from .learned import get_boundary

        labels = get_boundary(boundary)(toks, spa, lang)
    return norm, decode(toks, spa, labels)


def expand_mwt(form: str, lang: str) -> list[str]:
    """Surface MWT -> word sequence (plays reference compound.py:183-245)."""
    return MWT_LEXICON.get(lang, {}).get(form.lower(), [form])
