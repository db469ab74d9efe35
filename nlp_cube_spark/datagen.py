"""Deterministic synthetic Common-Crawl-style `pages` generator.

Schema is exactly the BASELINE.json `input_hint`:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

The text is a seeded sentence stream over the closed fixture grammar
(FIXTURES.md §1): SVO, copula ("X is a Y."), apposition ("X, the Y, ..."),
obl+case ("X sat on Y."), grouped numbers ("... 1,000 reports."), and
es-style MWT sentences ("X viaja al planeta."). Entity and predicate draws
are Zipf-skewed so hot-key salting has something to bite on.

html wraps text in a fixed template with HTML-escaping, so extraction is
checkable byte-for-byte (per-row invariant: byte-identical extracted text
per url).
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import random

from .kernels import lexicon as L

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)
HTML_TEMPLATE = (
    "<html><head><title>{title}</title></head>"
    "<body><article><p>{body}</p></article></body></html>"
)


def _zipf_choice(rng: random.Random, items: list[str], s: float = 1.3) -> str:
    # deterministic Zipf over item ranks
    weights = [1.0 / ((i + 1) ** s) for i in range(len(items))]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for it, w in zip(items, weights):
        acc += w
        if x <= acc:
            return it
    return items[-1]


def _sentence(rng: random.Random, lang: str) -> str:
    v3 = sorted(k for k in L.VERBS_3SG if k != "viaja")
    vp = sorted(L.VERBS_PAST)
    kind = rng.choice(["svo", "svo", "svo_det", "copula", "appos", "obl", "num"]) if lang == "en" else "es_mwt"
    s = _zipf_choice(rng, L.PROPER)
    if kind == "svo":
        v = _zipf_choice(rng, v3 if rng.random() < 0.7 else vp)
        o = _zipf_choice(rng, [p for p in L.PROPER if p != s] or L.PROPER)
        core = f"{s} {v} {o}"
    elif kind == "svo_det":
        v = _zipf_choice(rng, v3)
        n = _zipf_choice(rng, L.NOUNS[:15])
        core = f"{s} {v} the {n}"
    elif kind == "copula":
        n = _zipf_choice(rng, L.NOUNS[:10])
        det = "an" if n[0] in "aeiou" else "a"
        core = f"{s} is {det} {n}"
    elif kind == "appos":
        n = _zipf_choice(rng, L.NOUNS[:10])
        v = _zipf_choice(rng, v3)
        o = _zipf_choice(rng, [p for p in L.PROPER if p != s] or L.PROPER)
        core = f"{s} , the {n} , {v} {o}"
    elif kind == "obl":
        v = rng.choice(["sat", "worked", "lived", "arrived", "stayed"])
        p = rng.choice(["on", "in", "at", "near"])
        o = _zipf_choice(rng, L.PROPER[14:] + ["Mars", "Paris"])
        core = f"{s} {v} {p} {o}"
    elif kind == "num":
        num = rng.choice(["1,000", "3.5", "12", "2,500"])
        n = rng.choice(["reports", "papers", "ideas"])
        core = f"{s} mentions {num} {n}"
    else:  # es_mwt
        o = rng.choice(["planeta", "libro", "equipo"])
        core = f"{s} viaja al {o}"
    # half the sentences attach the final period (SpaceAfter=No coverage,
    # reference README example "a test." style), half keep it detached
    return core + ("." if rng.random() < 0.5 else " .")


def gen_pages(n_docs: int, seed: int = 42, sents_per_doc: tuple[int, int] = (2, 5)) -> list[dict]:
    """Returns list of row dicts (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        lang = "es" if i % 17 == 3 else "en"
        k = rng.randint(*sents_per_doc)
        text = " ".join(_sentence(rng, lang) for _ in range(k))
        url = f"https://ex{seed}.org/p/{i}"
        html = HTML_TEMPLATE.format(title=html_mod.escape(url), body=html_mod.escape(text)).encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": BASE_TS + dt.timedelta(seconds=i * 37),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
    return rows


def gen_aliases(seed: int = 42) -> list[dict]:
    """Entity-linking dictionary (FIXTURES.md §4): alias -> candidate ids
    with priors; controlled ambiguity + a few Zipf-hot entities."""
    rng = random.Random(seed + 1)
    rows = []
    eid = 1000
    for name in L.PROPER + L.NOUNS:
        n_cand = 1 + (1 if rng.random() < 0.25 else 0) + (1 if rng.random() < 0.1 else 0)
        total = 0.0
        priors = [rng.random() + 0.1 for _ in range(n_cand)]
        total = sum(priors)
        for j in range(n_cand):
            rows.append(
                {
                    "alias": name.lower(),
                    "entity_id": eid,
                    "prior": round(priors[j] / total, 6),
                }
            )
            eid += 1
    return rows


def pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """pages rows -> DataFrame with the input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    rows = gen_pages(n_docs, seed=seed)
    df = spark.createDataFrame([tuple(r.values()) for r in rows], schema)
    if partitions:
        df = df.repartition(partitions, "url")
    return df


def aliases_df(spark, seed: int = 42):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("entity_id", T.LongType(), False),
            T.StructField("prior", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame([(r["alias"], r["entity_id"], r["prior"]) for r in gen_aliases(seed)], schema)


def zipf_edges(
    spark,
    n_edges: int = 1_000_000,
    n_nodes: int = 100_000,
    n_hubs: int = 10,
    hub_every: int = 10,
):
    """Deterministic skewed edge set for graph-operator stress tests
    (r6 verdict item 7): every `hub_every`-th edge's src cycles through
    `n_hubs` hub nodes (so each hub gets exactly
    n_edges / hub_every / n_hubs edges — max degree ~10k at the 1M/10/10
    defaults, ~1000x the background median), the rest land uniformly.
    Uniforms are md5-hash-derived from the edge id (the repo's no-RNG
    discipline — 13 hex chars = 52 bits, an exact double), so the graph
    is reproducible on any engine and any partitioning.  Self-loops are
    dropped; multi-edges stay (operators dedup internally).

    Returns (src bigint, dst bigint).  Scale shape: one spark.range
    projection — no shuffle, no driver-side data.
    """
    u = "(conv(substr(md5(concat('{salt}:', id)), 1, 13), 16, 10) / {den})".format
    den = float(1 << 52)
    src = (
        f"case when id % {hub_every} = 0 then (id div {hub_every}) % {n_hubs} "
        f"else {n_hubs} + cast(floor({u(salt='s', den=den)} * {n_nodes - n_hubs}) as bigint) end"
    )
    dst = f"cast(floor({u(salt='d', den=den)} * {n_nodes}) as bigint)"
    return (
        spark.range(n_edges)
        .selectExpr(f"{src} as src", f"{dst} as dst")
        .where("src <> dst")
    )


# ------------------------------------------------- open-vocabulary corpus

_OV_ONSETS = ["br", "cl", "dr", "fl", "gr", "pl", "pr", "sk", "sl", "sp",
              "st", "tr", "ch", "sh", "th", "v", "m", "n", "r", "z"]
_OV_NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "oo", "ou"]
_OV_CODAS = ["b", "ck", "d", "g", "l", "m", "n", "p", "r", "s",
             "t", "x", "nd", "nt", "st"]
_OV_DETS = ["the", "a", "every", "some", "this", "that"]
_OV_PREPS = ["over", "under", "across", "near", "through", "between"]
_OV_CONTR = ["don't", "can't", "it's", "they're", "we've", "isn't"]


def _ov_stem(rng: random.Random) -> str:
    return (
        rng.choice(_OV_ONSETS) + rng.choice(_OV_NUCLEI) + rng.choice(_OV_CODAS)
    )


def _ov_sentence(rng: random.Random) -> str:
    """One pseudo-English sentence over an effectively unbounded lexicon
    (2700 stems x inflections), with function words, occasional
    contractions (MWT pressure), numbers and varied terminators — NOT the
    31-token salad grammar and NOT the gen_pages fixture grammar."""
    noun = lambda: _ov_stem(rng) + rng.choice(["", "s", "er", "ers"])
    verb = lambda: _ov_stem(rng) + rng.choice(["s", "ed", "ing"])
    adj = lambda: _ov_stem(rng) + rng.choice(["y", "ous", "al", "ish"])
    adv = lambda: adj() + "ly"
    parts = [rng.choice(_OV_DETS).capitalize(), adj(), noun(), verb()]
    if rng.random() < 0.3:
        parts.append(rng.choice(_OV_CONTR))
    parts += [rng.choice(_OV_DETS), noun()]
    if rng.random() < 0.5:
        parts += [rng.choice(_OV_PREPS), "the", adj(), noun()]
    if rng.random() < 0.25:
        parts += ["and", str(rng.randint(2, 9999)), noun()]
    if rng.random() < 0.2:
        parts += [",", "while", noun(), verb(), adv()]
    sent = " ".join(parts).replace(" ,", ",") + rng.choice([".", ".", ".", "!", "?"])
    return sent


def open_pages(
    n_docs: int, seed: int = 4242, sents_per_doc: tuple[int, int] = (8, 16)
) -> list[dict]:
    """Open-vocabulary corpus for entry-point-B evaluation at scale
    (r6 verdict item 6): (url, text, lang) rows whose content words the
    micro-model trainers have never seen.  ~12 words/sentence, so 100k
    words needs ~700 docs at the default sents_per_doc."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        k = rng.randint(*sents_per_doc)
        text = " ".join(_ov_sentence(rng) for _ in range(k))
        rows.append(
            {"url": f"https://openvocab{seed}.example/{i}", "text": text, "lang": "en"}
        )
    return rows
