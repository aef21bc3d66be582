"""End-to-end streaming jobs: source -> windowed metrics -> sink.

The streaming counterpart of the batch ELT's materialize(): instead of
full-rebuild CTAS, results append incrementally to partitioned parquet
with exactly-once file-sink semantics (checkpointed offsets + manifest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import functions as F

from globalweather_etl_spark.functions import weather_band
from globalweather_etl_spark.sources.weather_from_events import _fmod
from globalweather_etl_spark.streaming.sources import events_stream_from_dir
from globalweather_etl_spark.streaming.windows import (
    tumbling_stats,
    with_watermark,
)


def run_daily_event_metrics(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    watermark_delay: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain daily per-type event counts/sums.

    Append mode + watermark: a (day, type) row is written exactly once,
    when the watermark passes the end of its day — late events within
    the delay still count, later ones are dropped (the documented
    trade-off; widen the delay to trade latency for completeness).
    available_now=True drains whatever is in the landing dir and stops —
    the batch-like backfill mode; False runs forever.
    """
    events = events_stream_from_dir(spark, landing_dir)
    daily = tumbling_stats(with_watermark(events, "ts", watermark_delay), "1 day")
    writer = (
        daily.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "daily_event_metrics"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints/daily"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def daily_weather_band_counts(events: DataFrame) -> DataFrame:
    """Streaming variant of the reference's weather-band dashboard
    (Dashboard.sql:31-36): derive the temperature from each event with
    the SAME scalar kernel the batch ELT uses (value mod 120 - 10, the
    staging derivation of sources/weather_from_events.py), classify with
    the reference-exact weather_band CASE, and count per (day, band).

    Works on batch AND streaming inputs — the scalar kernel is stateless,
    so unlike the full staging derivation (whose first-row-per-day pick
    needs a row_number window, not available in streaming) this is the
    incremental-friendly projection of the same semantics."""
    # Literally the staging derivation's kernel — importing it (rather
    # than re-typing the formula) keeps stream and batch provably in
    # sync if the derivation ever changes.
    temp = _fmod(F.col("value"), 120.0) - F.lit(10.0)
    classified = events.select(
        F.col("ts"), weather_band(temp).alias("weather_band")
    )
    return (
        classified.groupBy(F.window("ts", "1 day"), "weather_band")
        .agg(F.count(F.lit(1)).alias("n_forecasts"))
        .select(
            F.col("window.start").alias("window_start"),
            "weather_band",
            "n_forecasts",
        )
    )


def enriched_country_counts(
    events: DataFrame, user_dim: DataFrame
) -> DataFrame:
    """Stream-static join: enrich each event with its user's country
    from a static dimension (broadcast per micro-batch; the static side
    may be updated between batches and is re-read lazily), then count
    per (day, country). The streaming analogue of the reference's
    fact-to-DIM_LOCATION join."""
    joined = events.join(F.broadcast(user_dim), "user_id", "left")
    return (
        joined.groupBy(F.window("ts", "1 day"), "country")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "country", "n_events"
        )
    )


def clicks_with_recent_signup(
    clicks: DataFrame, signups: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each click paired with every signup
    of the same user in the preceding `within` window.

    On streaming inputs both sides carry watermarks (set them upstream
    with with_watermark) and the time-bound condition lets Spark evict
    join state once s.ts falls behind click-watermark - within — the
    canonical bounded-state stream-stream join. The same expression is
    a plain interval join on batch inputs (parity-tested)."""
    c = clicks.alias("c")
    s = signups.alias("s")
    cond = (
        (F.col("c.user_id") == F.col("s.user_id"))
        & (F.col("s.ts") <= F.col("c.ts"))
        & (F.col("s.ts") >= F.col("c.ts") - F.expr(f"INTERVAL {within}"))
    )
    return c.join(s, cond, "inner").select(
        F.col("c.event_id").alias("click_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("s.event_id").alias("signup_id"),
        F.col("s.ts").alias("signup_ts"),
    )


def clicks_with_optional_signup(
    clicks: DataFrame, signups: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, paired
    with its same-user signups in the preceding ``within`` window —
    or emitted ONCE with NULL signup columns if none arrives.

    The outer side is the semantics the inner form can't express
    ("which clicks had no recent signup?"), and it is where streaming
    state management actually bites: Spark can only emit the NULL row
    once it is certain no match can still arrive, i.e. when the
    watermark passes click.ts + within and the click's state is
    evicted. Matched rows stream out immediately (append mode);
    unmatched rows surface one watermark-advance later — tests drive
    this with staggered micro-batches. On batch inputs the same
    expression is a plain left interval join (parity-tested), where
    the lateness machinery is a no-op."""
    c = clicks.alias("c")
    s = signups.alias("s")
    cond = (
        (F.col("c.user_id") == F.col("s.user_id"))
        & (F.col("s.ts") <= F.col("c.ts"))
        & (F.col("s.ts") >= F.col("c.ts") - F.expr(f"INTERVAL {within}"))
    )
    return c.join(s, cond, "left_outer").select(
        F.col("c.event_id").alias("click_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("s.event_id").alias("signup_id"),
        F.col("s.ts").alias("signup_ts"),
    )


def drain_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Run a streaming aggregation to completion into an in-memory table
    (test/debug sink): availableNow processes everything currently in the
    source, then the query stops. Read results from spark.table(name)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )


def clean_documents(docs: DataFrame, min_quality: float = 0.3) -> DataFrame:
    """Streaming corpus hygiene: drop low-quality documents and redact
    PII in one pass. Works identically on a batch frame or a
    `jsonl_stream_from_dir` stream — every underlying signal is a pure
    scan-stage expression (functions/text.py), so the streaming planner
    needs no state, no watermark, and each micro-batch is embarrassingly
    parallel. The curation stages that DO need global state (dedup,
    decontamination) stay batch jobs over the landed output.

    Output: doc_id, lang, clean_text (PII-redacted), quality,
    n_tokens, bpe_tokens.
    """
    from globalweather_etl_spark.functions.text import (
        bpe_token_estimate,
        quality_score,
        redact_pii,
        token_count,
    )

    t = F.col("text")
    return (
        docs.withColumn("quality", F.round(quality_score(t), 9))
        .filter(F.col("quality") >= F.lit(min_quality))
        .select(
            "doc_id",
            "lang",
            redact_pii(t).alias("clean_text"),
            "quality",
            token_count(t).alias("n_tokens"),
            bpe_token_estimate(t).alias("bpe_tokens"),
        )
    )


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    return spark.read.parquet(path)


def _state_except_batch(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """The dedup-state history a micro-batch may probe: every
    ``ingest_batch=<k>`` partition EXCEPT the batch's own.  A replayed
    batch that already appended its state before crashing must not see
    its own rows as history — it would drop everything it previously
    kept and overwrite its output with an empty result, losing those
    documents forever (the emitted-exactly-once violation)."""
    df = _read_if_exists(spark, state_dir)
    if df is None:
        return None
    return df.filter(F.col("ingest_batch") != batch_id).drop("ingest_batch")


def _bloom_versions(spark: SparkSession, root: str) -> list[int]:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return out


def run_incremental_dedup(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous-ingestion exact dedup as a streaming job: fold every
    micro-batch of ``docs`` (a streaming DataFrame, e.g. from
    ``jsonl_stream_from_dir``) through the Bloom-screened incremental
    dedup (operators/bloom.py), so a document whose normalized content
    was EVER seen — in any earlier micro-batch or earlier run over the
    same state — is dropped and each distinct content is emitted
    exactly once (min-id keeper within its first batch).

    State lives next to the output, all replay-safe:

    - ``_state/fingerprints/ingest_batch=<batch_id>`` — parquet of the
      distinct content fingerprints each batch kept, one partition per
      batch, written with per-partition OVERWRITE.  The history a
      batch probes is every partition EXCEPT its own — so a replayed
      batch (crash after the state append but before the checkpoint
      commit) can never see its own fingerprints as "already seen",
      recompute kept as empty, and overwrite its output with nothing
      (the exactly-once-emission violation a plain append-only history
      allows).  O(delta) written per batch — older partitions are
      never rewritten.
    - ``_state/bloom/v=<batch_id>`` — the merged filter after that
      batch, built from the latest earlier version + the batch's new
      fingerprints (one bounded aggregate; never rebuilt from
      history). Deterministic per batch id, so replays overwrite
      their own version.
    - ``deduped/ingest_batch=<batch_id>`` — the kept documents,
      per-batch directory overwrite: idempotent under replay.

    Scale shape: per batch, the work is the in-batch hash-groupBy, a
    Bloom probe (k rows per doc joined against the word table), the
    history anti-join over only the Bloom-maybe slice, and an
    O(new-content) state append. The full history is scanned lazily as
    the anti-join's build side but never shuffled in its entirety and
    never rewritten.
    """
    from globalweather_etl_spark.functions.text import fingerprint_md5
    from globalweather_etl_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
        empty_bloom,
        exact_dedup_incremental_bloom,
    )

    hist_dir = os.path.join(out_dir, "_state/fingerprints")
    bloom_root = os.path.join(out_dir, "_state/bloom")

    def _fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        history = _state_except_batch(s, hist_dir, batch_id)
        prev_versions = [v for v in _bloom_versions(s, bloom_root) if v < batch_id]
        prev_bloom = (
            s.read.parquet(os.path.join(bloom_root, f"v={max(prev_versions)}"))
            if prev_versions
            else None
        )
        kept, _, _ = exact_dedup_incremental_bloom(
            batch, history, prev_bloom, id_col, text_col, num_bits, num_hashes
        )
        out_batch = os.path.join(out_dir, f"deduped/ingest_batch={batch_id}")
        kept.write.mode("overwrite").parquet(out_batch)
        # Re-read the landed batch so state derives from what was actually
        # written (no recompute, no read-while-append lineage on history).
        fps = (
            s.read.parquet(out_batch)
            .select(fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        )
        # idempotent per-batch state partition (see docstring): a replay
        # overwrites ITS OWN partition instead of appending duplicates
        # the replay would then probe against
        fps.write.mode("overwrite").parquet(
            os.path.join(hist_dir, f"ingest_batch={batch_id}")
        )
        base = prev_bloom if prev_bloom is not None else empty_bloom(s)
        bloom_merge(base, bloom_build(fps, "fingerprint", num_bits, num_hashes)).write.mode(
            "overwrite"
        ).parquet(os.path.join(bloom_root, f"v={batch_id}"))

    writer = (
        docs.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints/dedup"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_incremental_neardedup(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming NEAR-dedup: the fuzzy sibling of
    ``run_incremental_dedup``. Each micro-batch is near-deduped
    in-batch (MinHash-LSH -> components -> min-id canonical) and then
    screened against the persistent SIGNATURE store
    (``operators.dedup.minhash_dedup_incremental``), so a document
    near-matching anything kept in any earlier batch or run is
    dropped.

    State (replay-safe, all next to the output):
    - ``_state/signatures/ingest_batch=<id>`` — (doc, sig) for every
      kept document, one OVERWRITE partition per batch (~256 B/doc at
      32 hashes).  The history a batch screens against excludes its
      own partition, so a replay (crash between the state write and
      the checkpoint commit) cannot match against its own signatures
      and drop every document it previously kept — the same
      exactly-once-emission hazard run_incremental_dedup guards.
    - ``neardeduped/ingest_batch=<id>`` — kept documents, per-batch
      overwrite: idempotent under replay.

    The screen inherits the MinHash estimator's variance (module
    docstring of minhash_dedup_incremental): borderline-similarity
    pairs near the threshold gate probabilistically but
    DETERMINISTICALLY (signatures are seeded hashes — the same pair
    always gates the same way).
    """
    from globalweather_etl_spark.operators.dedup import (
        minhash_dedup_incremental,
    )

    sig_dir = os.path.join(out_dir, "_state/signatures")

    def _fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        history = _state_except_batch(s, sig_dir, batch_id)
        kept, _ = minhash_dedup_incremental(
            batch, history, id_col, text_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
            max_doc_freq=max_doc_freq,
        )
        out_batch = os.path.join(out_dir, f"neardeduped/ingest_batch={batch_id}")
        kept.write.mode("overwrite").parquet(out_batch)
        # state derives from the landed batch (no read-while-append on
        # the signature dir, no recompute of the screen's lineage);
        # per-batch OVERWRITE partition: replays redo their own state
        landed = s.read.parquet(out_batch)
        fresh_sigs = _signatures_of(landed, id_col, text_col, n,
                                    num_hashes, max_doc_freq)
        fresh_sigs.write.mode("overwrite").parquet(
            os.path.join(sig_dir, f"ingest_batch={batch_id}")
        )

    writer = (
        docs.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints/neardedup"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _signatures_of(docs, id_col, text_col, n, num_hashes, max_doc_freq):
    from globalweather_etl_spark.operators.dedup import (
        _cap_hot_shingles,
        _hashed_shingles,
        _minhash_signed,
    )

    sh = _hashed_shingles(docs, id_col, text_col, n)
    if max_doc_freq is not None:
        sh = _cap_hot_shingles(sh, max_doc_freq)
    return _minhash_signed(sh, num_hashes).select("doc", "sig")


def run_snapshot_ingest(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    stats_cols: list[str] | None = None,
) -> StreamingQuery:
    """Continuous ingestion into a versioned SnapshotTable
    (sources/snapshots.py): every micro-batch becomes one atomic
    append commit, stamped with the micro-batch id for exactly-once
    semantics — after a checkpoint recovery, a replayed batch finds
    its id in the manifest log and is skipped, so readers (who always
    scan a pinned manifest) never see duplicates OR torn batches.

    This is the manifest-log answer to the classic foreachBatch
    at-least-once problem the per-batch-directory jobs above solve
    with overwrite-by-batch-dir: here the whole table additionally
    gains time travel, rollback, diff, and vacuum for free.

    Scale shape: per batch, O(batch) data write + one manifest append;
    the table's history length is the number of commits, not its row
    count. Run `vacuum` on a maintenance cadence to bound manifests
    and reclaim any torn-replay data files.

    ``stats_cols``: maintain the zone-map sidecar as part of every
    commit — an INCREMENTAL build_stats after each write_batch, so
    stats cost O(the batch's files) per trigger and the head is always
    range-prunable without a separate maintenance job. A skipped
    replay (write_batch -> None) skips the stats build too.
    """
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    def _commit(batch: DataFrame, batch_id: int) -> None:
        st = SnapshotTable(batch.sparkSession, table_path)
        v = st.write_batch(batch, batch_id, mode="append")
        if v is not None and stats_cols:
            st.build_stats(
                cols=stats_cols, version=v, incremental=True
            )

    writer = docs.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ivm_refresh(
    events: DataFrame,
    table_path: str,
    group_cols: list[str],
    measures,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously-maintained GROUP BY aggregate (operators/ivm.py)
    fed by a stream: each micro-batch folds into the materialized
    state with one partial aggregate + a file-pruned merge, stamped
    with the batch id for exactly-once refresh after checkpoint
    recovery. This is the reference's dashboard-aggregate shape run
    as a CONTINUOUS aggregate — readers query the state table
    (IncrementalAggregate.read()) and never rescan the raw events.

    Per-trigger cost is O(batch) + the state files the batch's groups
    live in; the raw stream is never retained."""
    from globalweather_etl_spark.operators.ivm import IncrementalAggregate

    def _refresh(batch: DataFrame, batch_id: int) -> None:
        IncrementalAggregate(
            batch.sparkSession, table_path, group_cols, measures
        ).apply_batch(batch, batch_id=batch_id)

    writer = events.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_audited_ingest(
    docs: DataFrame,
    table_path: str,
    quarantine_path: str,
    suite,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming write-audit-publish: every micro-batch is checked
    against a declarative expectations suite
    (operators/expectations.py) BEFORE it can reach the versioned
    table.  Clean batches commit exactly-once into the SnapshotTable
    (batch-id-stamped manifests, as run_snapshot_ingest); failing
    batches are routed whole to a per-batch quarantine directory
    (overwrite-by-batch-dir: idempotent under replay) together with a
    _report.json naming the failed expectations — the operational
    pattern that keeps one bad upstream drop from poisoning a
    continuously-ingested corpus, while losing nothing (quarantined
    batches can be repaired and re-committed by a batch job).

    Scale shape: the audit is ONE aggregate over the micro-batch (the
    suite compiles every constraint into a single scan) plus the
    commit write — O(batch) per trigger, independent of table size.
    """
    import json as _json

    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    def _fold(batch: DataFrame, batch_id: int) -> None:
        ok, rows = suite.check(batch)
        if ok:
            SnapshotTable(batch.sparkSession, table_path).write_batch(
                batch, batch_id, mode="append"
            )
            return
        qdir = os.path.join(quarantine_path, f"ingest_batch={batch_id}")
        batch.write.mode("overwrite").parquet(qdir)
        report = {
            "batch_id": batch_id,
            "failed": [
                {"metric": r["metric"], "value": r["value"]}
                for r in rows
                if not r["passed"]
            ],
        }
        spark = batch.sparkSession
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(
            os.path.join(qdir, "_report.json")
        )
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(hpath, True)
        try:
            out.write(_json.dumps(report).encode("utf-8"))
        finally:
            out.close()

    writer = docs.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
