"""Tokenizer training-target encoding (SURVEY §2a #9).

The reference derives, for every pre-token of a sentence, one of five
boundary classes by aligning pre-tokens to GOLD tokens on running
space-stripped character length (utils_tokenizer.py:298-320 and its
subword twin at 610-632):

  0  padding / past sentence end
  1  nothing (pre-token inside a gold token)
  2  gold token ends here
  3  gold MULTIWORD token ends here (token covers >1 words)
  4  sentence end (the pre-token completing the LAST gold token)

Mirrored quirk: the reference's final loop writes `targets[ii]` (not
`targets[tt]`), so only the position that completes the last gold token
receives class 4 and any later pre-tokens stay 0 — we reproduce that
exactly rather than "fixing" it, since trained decoders expect it.

Training-only in the reference (#9: `_get_targets(sentence)`); here the
kernel is pure so the same code runs inside the fused Arrow stage
(operators/targets.fused_tokenizer_targets) or over treebank gold
(operators/targets.tokenizer_targets_from_gold).
"""

from __future__ import annotations


def encode_targets(pretoks: list[str], gold: list[tuple[str, int]]) -> list[int]:
    """Running char-length alignment of `pretoks` to `gold` tokens.

    gold: (token_text, n_words) per gold token, in order. Lengths compare
    space-stripped, as the reference does for the wordpiece variant."""
    targets = [0] * len(pretoks)
    i_token = 0
    cl = 0
    for ii in range(len(pretoks)):
        if i_token >= len(gold):
            break  # degenerate: more pre-tokens than gold chars
        target = 1  # nothing
        cl += len(pretoks[ii].replace(" ", ""))
        if cl == len(gold[i_token][0].replace(" ", "")):
            i_token += 1
            cl = 0
            target = 2  # token
            if gold[i_token - 1][1] > 1:
                target = 3  # multiword token
        if i_token == len(gold):
            targets[ii] = 4  # sentence end; later positions stay 0 (quirk)
            break
        targets[ii] = target
    return targets


def gold_tokens_from_words(tok_forms: list[str], mwt_ids: list[int]) -> list[tuple[str, int]]:
    """Collapse a word stream (annotate/CoNLL-U shape) back to its token
    stream: consecutive words sharing a nonzero mwt_id are one gold token."""
    gold: list[list] = []
    prev_mwt = None
    for tf, mid in zip(tok_forms, mwt_ids):
        if mid and mid == prev_mwt:
            gold[-1][1] += 1
        else:
            gold.append([tf, 1])
        prev_mwt = mid
    return [(t, n) for t, n in gold]
