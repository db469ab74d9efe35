"""Training-corpus curation: benchmark decontamination + PII scrubbing.

Two standard steps of an LLM data pipeline that sit between dedup and
shard packing (public knowledge: GPT-3 appendix C's 13-gram overlap
rule; C4's regex scrubbing):

- `decontaminate`: flag training documents sharing any whitespace
  n-gram with an evaluation/benchmark set. The benchmark side is small
  by construction (eval sets are thousands of docs, not billions), so
  its distinct n-gram hashes BROADCAST; the training side streams
  through explode -> broadcast-hash-join -> distinct doc ids. No
  shuffle touches the full corpus' n-grams.
- `scrub_pii`: redact email addresses and phone-number-shaped digit
  runs, counting the redactions per doc. Pure per-row regexp
  expressions (whole-stage codegen; dialect kept inside the
  Java-regex/RE2 common subset so the DuckDB oracle replays exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# backrefs, no lookaround) so engine and oracle agree byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+]?[0-9][0-9 -]{7,}[0-9]"


def _check_reserved(df: DataFrame, reserved: set[str], op: str) -> None:
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {sorted(clash)} reserved "
            "for the output — rename them first"
        )


def _gram_set(df: DataFrame, id_col: str | None, text_col: str, n: int) -> DataFrame:
    from .textstats import ngrams_sql  # THE n-gram definition (shared)

    grams = F.explode(F.expr(ngrams_sql(text_col, n))).alias("gram")
    cols = ([F.col(id_col)] if id_col else []) + [grams]
    return df.select(*cols)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """docs + boolean `contaminated`: true when the doc shares at least
    one whitespace n-gram with `benchmark` (GPT-3-style overlap rule;
    n=13 is the published default — lower it for short-token corpora).

    Plan: benchmark distinct grams (small, broadcast) -> training grams
    explode -> broadcast hash join -> distinct contaminated ids -> left
    join back. The training corpus is never shuffled on gram."""
    _check_reserved(docs, {"gram", "contaminated"}, "decontaminate")
    bench = _gram_set(benchmark, None, bench_text_col, n).dropDuplicates()
    hits = (
        _gram_set(docs, id_col, text_col, n)
        .join(F.broadcast(bench), "gram")
        .select(id_col)
        .dropDuplicates()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails then phone-shaped digit runs, with per-doc counts.

    Order matters and is part of the contract: emails are replaced
    FIRST (an address like user123@host.com contains digit runs), then
    phones are counted/replaced on the email-scrubbed text."""
    _check_reserved(docs, {"n_emails", "n_phones", "scrubbed"}, "scrub_pii")
    after_email_sql = f"regexp_replace({text_col}, '{EMAIL_RE}', '<EMAIL>')"
    return docs.select(
        "*",
        F.size(F.expr(f"regexp_extract_all({text_col}, '{EMAIL_RE}', 0)")).alias(
            "n_emails"
        ),
        F.size(
            F.expr(f"regexp_extract_all({after_email_sql}, '{PHONE_RE}', 0)")
        ).alias("n_phones"),
        F.expr(
            f"regexp_replace({after_email_sql}, '{PHONE_RE}', '<PHONE>')"
        ).alias("scrubbed"),
    )
