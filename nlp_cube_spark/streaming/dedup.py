"""Incremental content dedup for a crawl stream.

`ingest.read_pages_stream` drops url re-fetches inside the watermark;
this module drops content re-PUBLISHES — the same or near-same text
arriving under new urls across micro-batches (mirror sites, syndication).

Per micro-batch (foreachBatch):
  1. exact: md5 content hash, (a) keep the min-url doc per hash within the
     batch, (b) drop docs whose hash already exists in the survivor store;
  2. near: MinHash signatures (16 longs/doc — the store stays tiny no
     matter the corpus), LSH band join within the batch AND against the
     accumulated signature store; a candidate is a duplicate when the
     fraction of agreeing minhash positions >= `sim_threshold` (the
     standard sketch estimate of Jaccard; in-batch keep-rule: min url).
  3. survivors + their signatures append as batch_id partitions with
     dynamic OVERWRITE of the batch's own partitions, so a replayed batch
     after a crash rewrites instead of duplicating (same discipline as
     ingest.start_triples_stream). History comparisons read only
     batch_id < current, so a replay never sees its own partial output.

Scale notes: the signature store is 16 longs + 1 hash per SURVIVOR — at
10^12 docs it is a normal fact table, and both the exact-hash join and
the band join shuffle on uniform hash keys. No shingle storage, no text
re-reads of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import minhash_signature

SIG_K = 16
BANDS = 4


def _with_signature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    sig = minhash_signature(docs, text_col, k=SIG_K)
    return sig.withColumn("content_hash", F.md5(F.col(text_col)))


def _bands(sig: DataFrame) -> DataFrame:
    rows = SIG_K // BANDS
    return sig.select(
        "url",
        "minhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {BANDS - 1}), b -> struct(b as band_id,"
                f" md5(array_join(slice(minhash, b * {rows} + 1, {rows}), '_')) as band_sig))"
            )
        ).alias("band"),
    ).select("url", "minhash", "band.band_id", "band.band_sig")


def _match_frac(a: str, b: str):
    return F.expr(
        f"size(filter(zip_with({a}, {b}, (x, y) -> x = y), v -> v)) / {SIG_K}"
    )


def dedup_batch(
    batch: DataFrame, history_sigs: DataFrame | None, sim_threshold: float = 0.8
) -> DataFrame:
    """One micro-batch of pages -> surviving pages + signature columns
    (minhash, content_hash). Pure batch logic, unit-testable without a
    stream; deterministic keep-rule = min url."""
    sig = _with_signature(batch).localCheckpoint()

    # 1a. in-batch exact: keep min url per content hash
    keep = sig.groupBy("content_hash").agg(F.min("url").alias("url"))
    sig = sig.join(keep, ["content_hash", "url"])
    # 1b. historical exact
    if history_sigs is not None:
        sig = sig.join(
            history_sigs.select("content_hash").dropDuplicates(),
            "content_hash",
            "left_anti",
        )

    # 2. near-dup via band join + signature-agreement estimate
    b = _bands(sig)
    selfp = (
        b.alias("x")
        .join(b.alias("y"), ["band_id", "band_sig"])
        .where(F.col("x.url") > F.col("y.url"))
        .where(_match_frac("x.minhash", "y.minhash") >= sim_threshold)
        .select(F.col("x.url").alias("url"))
        .dropDuplicates()
    )
    sig = sig.join(selfp, "url", "left_anti")
    if history_sigs is not None:
        hb = _bands(history_sigs.select("url", "minhash"))
        histp = (
            _bands(sig)
            .alias("x")
            .join(hb.alias("y"), ["band_id", "band_sig"])
            .where(_match_frac("x.minhash", "y.minhash") >= sim_threshold)
            .select(F.col("x.url").alias("url"))
            .dropDuplicates()
        )
        sig = sig.join(histp, "url", "left_anti")
    return sig


def start_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    sim_threshold: float = 0.8,
    max_files: int = 1,
    available_now: bool = True,
):
    """Stream pages -> content-deduped survivors + signature store.

    Layout: {out_dir}/survivors and {out_dir}/signatures, both partitioned
    by batch_id (dynamic overwrite => idempotent replay)."""
    from .ingest import read_pages_stream

    stream = read_pages_stream(spark, src_dir, max_files=max_files)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # empty overwrite would wipe the table (see ingest)
            return
        # conf must land on the micro-batch session clone (see ingest)
        batch_df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            hist = spark.read.parquet(f"{out_dir}/signatures").where(
                F.col("batch_id") < batch_id
            )
            if not hist.take(1):
                hist = None
        except Exception:  # first batch: store does not exist yet
            hist = None
        surv = dedup_batch(batch_df, hist, sim_threshold).withColumn(
            "batch_id", F.lit(batch_id)
        )
        surv.drop("minhash", "content_hash").write.partitionBy("batch_id").mode(
            "overwrite"
        ).parquet(f"{out_dir}/survivors")
        surv.select("url", "content_hash", "minhash", "batch_id").write.partitionBy(
            "batch_id"
        ).mode("overwrite").parquet(f"{out_dir}/signatures")

    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
