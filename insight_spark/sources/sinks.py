"""Sinks (SURVEY.md §2.A6-A8, A10).

The reference serves from Elasticsearch (search/suggest) and PostgreSQL
(aggregates) [SURVEY.md §0.1 R:high].  Offline, both are emulated with
layouts that preserve the *access pattern* the serving stores provide,
so swapping in the real connectors (``format("es")``,
``.write.jdbc``) is a one-line change per sink:

- search-index sink → bucketed+sorted parquet table (segment/shard
  layout) + an inverted-index posting table (term → sorted doc ids):
  the two structures an ES index materializes.
- jdbc sink → parquet + a generated DDL file recording the table
  schema that would be issued to PG.

Scale notes: ``partitionBy`` on write gives partition pruning to every
downstream reader; ``bucketBy`` pre-shuffles once at write time so
later term lookups and doc joins are shuffle-free.  The posting-list
build is explode + groupBy — the same bounded-key shuffle shape as
term_freq.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_spark.operators.text import tokenize


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """A6: partitioned parquet sink (hive-style directory pruning)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_search_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    table_prefix: str = "search_idx",
) -> dict[str, str]:
    """A7: search-index sink emulation (the ES role).

    Writes (1) the doc store, bucketed by doc_id and sorted within
    buckets — ES's doc segments; (2) the inverted index: one row per
    term with a sorted posting list of doc ids and the df — ES's term
    dictionary + postings.  Returns the two table names registered in
    the session catalog (bucketed tables must go through the catalog).
    """
    doc_table = f"{table_prefix}_docs"
    post_table = f"{table_prefix}_postings"
    suggest_table = f"{table_prefix}_suggest"

    # The doc-store write and the postings chain are independent jobs
    # over distinct tables/paths — overlapped from two driver threads
    # (guide §2.6) so each write's straggler/commit tail back-fills
    # with the other's tasks, same pattern as the base/delta segment
    # overlap in delta_index_merge_read.  The suggest table reads the
    # WRITTEN posting table, so it stays ordered after postings inside
    # its thread.  Plain threads suffice: no job group / scheduler
    # pool / session conf is set here.  (r12 measured this overlap as
    # noise-inconclusive on a degraded box; re-measured r13 on a quiet
    # box — see OPTIMIZATION_r13.md.)
    def _write_docs() -> None:
        # external tables (explicit path): bucketing metadata lives in
        # the catalog, data at out_dir — no static warehouse conf needed
        (
            docs.write.mode("overwrite")
            .bucketBy(n_buckets, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(out_dir, doc_table))
            .format("parquet")
            .saveAsTable(doc_table)
        )

    def _write_postings_then_suggest() -> None:
        postings = (
            docs.select(
                "doc_id",
                F.explode(F.array_distinct(tokenize(F.col("text")))).alias(
                    "term"
                ),
            )
            .groupBy("term")
            .agg(
                F.sort_array(F.collect_list("doc_id")).alias("posting"),
                F.count("*").alias("df"),
            )
        )
        (
            postings.write.mode("overwrite")
            .bucketBy(n_buckets, "term")
            .sortBy("term")
            .option("path", os.path.join(out_dir, post_table))
            .format("parquet")
            .saveAsTable(post_table)
        )

        # the completion-suggester structure — ES keeps this SEPARATE
        # from the inverted index (an FST keyed by input prefixes); the
        # stand-in keys each term by its 2-char prefix and buckets on
        # it, so a prefix lookup is an EQUALITY on the bucket column
        # and bucket-prunes to 1 of n files, exactly like the term
        # point lookup.  Derived by reading the WRITTEN posting table
        # (one aggregated scan, no re-tokenization).
        suggest = spark.table(post_table).select(
            F.substring("term", 1, 2).alias("prefix2"), "term", "df"
        )
        (
            suggest.write.mode("overwrite")
            .bucketBy(n_buckets, "prefix2")
            .sortBy("prefix2", "term")
            .option("path", os.path.join(out_dir, suggest_table))
            .format("parquet")
            .saveAsTable(suggest_table)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [
            pool.submit(_write_docs),
            pool.submit(_write_postings_then_suggest),
        ]
        for fut in futures:
            fut.result()
    return {"docs": doc_table, "postings": post_table, "suggest": suggest_table}


def search_term_lookup(spark: SparkSession, post_table: str, term: str) -> DataFrame:
    """Serving-side read of the A7 index: posting list for one term.
    Bucket pruning keeps this a single-bucket scan."""
    return spark.table(post_table).filter(F.col("term") == term)


def suggest_lookup(
    spark: SparkSession, suggest_table: str, prefix: str, k: int = 10
) -> DataFrame:
    """Serving-side completion suggester over the A7 suggest table:
    top-k terms extending ``prefix``, ranked by document frequency
    (df desc, term asc tie-break — the ES completion ordering with a
    deterministic tie key).

    ``prefix`` must be >= 2 chars: the equality on the bucketed
    ``prefix2`` column is what bucket-prunes the scan to 1 of n files;
    the residual ``startswith`` handles longer prefixes within the
    pruned bucket (within-bucket rows are term-sorted, so parquet
    row-group stats skip non-matching ranges)."""
    if len(prefix) < 2:
        raise ValueError("suggest_lookup needs a prefix of >= 2 chars")
    return (
        spark.table(suggest_table)
        .filter(
            (F.col("prefix2") == prefix[:2])
            & F.col("term").startswith(prefix)
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select("term", "df")
    )


def write_jdbc_standin(
    df: DataFrame, out_dir: str, table: str, mode: str = "overwrite"
) -> str:
    """A8: PG sink stand-in — parquet payload + the DDL that would be
    issued over JDBC (offline env has no PG; ``df.write.jdbc(url,
    table, properties)`` is the production call)."""
    path = os.path.join(out_dir, table)
    df.write.mode(mode).parquet(path)
    ddl_cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    ddl = f"CREATE TABLE {table} (\n  {ddl_cols}\n);\n"
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_ddl.sql"), "w") as fh:
        fh.write(ddl)
    return path


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    mode: str = "overwrite",
) -> str:
    """Training-export sink: deterministic shard layout for a trainer.

    Shard = md5(id) mod n_shards — content-keyed, so the layout is
    reproducible across engines/re-runs and a trainer reading shard i
    always sees the same documents (no RNG, no row-position
    dependence).  Within a shard, rows are sorted by the same hash: a
    stable pseudo-shuffle, which is what sequence-level training wants
    (decorrelated neighbors, bit-identical every run).

    One repartition on the shard key (each output file written by one
    task), hive-partitioned by ``shard`` for pruning.  At 100 TB pick
    n_shards ≈ total_bytes / target_file_size.
    """
    hashed = df.withColumn(
        "_h", F.md5(F.col(id_col).cast("string"))
    ).withColumn(
        "shard",
        (F.conv(F.substring("_h", 1, 8), 16, 10).cast("long") % n_shards).cast(
            "int"
        ),
    )
    (
        hashed.repartition(n_shards, "shard")
        .sortWithinPartitions("_h", id_col)
        .drop("_h")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return out_dir


def foreach_batch_upsert(
    out_dir: str, key_cols: list[str], barrier: str = "local"
):
    """A10/K8: idempotent micro-batch upsert into a parquet serving dir.

    Returns a ``foreachBatch`` function: each micro-batch overwrites
    the keys it contains (read-merge-write on the serving copy) —
    the same upsert contract an ES/PG sink gives, exactly-once per
    micro-batch via the checkpoint's batch id.

    ``barrier`` picks how the merge is materialized before the
    overwrite clears the very files it read (VERDICT r12 #7):

    - ``"local"`` (default, the bench posture): one eager
      ``localCheckpoint`` — a single write job per batch, correct in
      local mode and on healthy executors, but the checkpoint blocks
      are executor-local and NON-recomputable.  On a cluster, an
      executor lost between the checkpoint and the overwrite aborts
      the batch after the serving dir may already be cleared; the
      batch retry then fails loudly (see the narrowed first-batch
      check below — a half-destroyed serving dir is NOT re-seeded).
    - ``"reliable"`` (cluster posture): stage the merged table to a
      per-batch dir and read it back before the overwrite — two write
      jobs and 2× the serving bytes per batch, but the barrier
      survives any executor loss because the staged files are durable
      and the read-back is re-plannable.  This is the r11 form, kept
      behind the knob instead of deleted.
    """
    if barrier not in ("local", "reliable"):
        raise ValueError(f"barrier must be 'local' or 'reliable': {barrier}")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        path = os.path.join(out_dir, "serving")
        new = batch_df.dropDuplicates(key_cols)
        # Only a MISSING serving dir means first batch (ADVICE r12:
        # the old bare `except Exception` treated ANY read failure —
        # including a serving dir half-destroyed by an aborted
        # overwrite — as first-batch and silently re-seeded the table
        # from one micro-batch; same narrowing as
        # foreach_batch_additive_merge).
        if os.path.isdir(path):
            current = spark.read.parquet(path)
            merged = current.join(
                new.select(*key_cols), key_cols, "left_anti"
            ).unionByName(new)
        else:
            merged = new
        # The merge reads the very files it is about to replace, so the
        # overwrite needs a barrier (selected above).  coalesce(1)
        # sizes the output for a key-bounded table (guide §6
        # small-files: the 8-shuffle-partition agg otherwise leaves
        # 8 tiny files per version for every later batch/reader to
        # re-open); a cluster serving a large key space would
        # repartition to a target file size here instead.
        merged = merged.coalesce(1)
        if barrier == "local":
            merged = merged.localCheckpoint()
        else:
            staging = os.path.join(out_dir, f"_staging_{batch_id}")
            merged.write.mode("overwrite").parquet(staging)
            merged = spark.read.parquet(staging)
        merged.write.mode("overwrite").parquet(path)
        if barrier == "reliable":
            import shutil

            shutil.rmtree(staging, ignore_errors=True)

    return upsert


def foreach_batch_additive_merge(
    out_dir: str, key_cols: list[str], add_cols: list[str]
):
    """A10/K8 depth: ADDITIVE micro-batch merge into a parquet MV —
    incremental materialized-view maintenance with the state in the
    SINK, not the streaming engine.

    Returns a ``foreachBatch`` function: each micro-batch arrives as
    RAW pre-aggregated partials (count / DECIMAL sums per key) and is
    merged by ADDING onto the serving copy (read-modify-write), so
    the engine keeps no aggregation state at all — the pattern that
    scales a 100 TB rollup without a 100 TB state store.  Unlike the
    overwrite upsert, an additive merge is NOT naturally idempotent,
    so exactly-once needs explicit batch-id fencing.

    Commit protocol (crash-safe): each batch writes its merged result
    to a fresh versioned dir ``serving_b{id}``, then atomically
    promotes it by ``os.replace``-ing a pointer file (``CURRENT``)
    that records BOTH the live dir and the highest applied batch id —
    one atomic rename commits the data and the fence together.  A
    crash before the rename leaves the old pointer (batch unapplied —
    redelivery re-merges from the OLD version, correct); a crash
    after leaves the new pointer (redelivery is fenced out).  The
    fence can be a single high-water-mark because Structured
    Streaming batch ids are monotonically increasing and only the
    last uncommitted batch is ever replayed.

    Failure posture: only a MISSING serving version is treated as
    first-batch; any other read error (transient IO, corruption)
    re-raises rather than silently re-initializing the MV from one
    batch's partials.
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import json

        spark = batch_df.sparkSession
        os.makedirs(out_dir, exist_ok=True)
        pointer = os.path.join(out_dir, "CURRENT")
        state: dict = {"dir": None, "last_applied": -1}
        if os.path.exists(pointer):
            with open(pointer) as fh:
                state = json.load(fh)
        if batch_id <= state["last_applied"]:
            return  # redelivery: already folded in
        if state["dir"] is None:
            merged = batch_df
        else:
            # Pointer exists => the version it names was fully written
            # before the pointer commit; a failure reading it is real.
            current = spark.read.parquet(os.path.join(out_dir, state["dir"]))
            merged = (
                current.unionByName(batch_df)
                .groupBy(*key_cols)
                .agg(*[F.sum(c).alias(c) for c in add_cols])
            )
        vdir = f"serving_b{batch_id}"
        # One file per MV version (guide §6 small-files): the merged
        # table is key-bounded (one row per rollup key), and every
        # later batch re-reads the live version — 8 shuffle-partition
        # shards per version were pure open overhead.  A cluster
        # serving a large key space repartitions to a target file
        # size here instead.
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, vdir)
        )
        tmp_ptr = os.path.join(out_dir, f"_ptr_{batch_id}")
        with open(tmp_ptr, "w") as fh:
            json.dump({"dir": vdir, "last_applied": batch_id}, fh)
        os.replace(tmp_ptr, pointer)  # the atomic commit point
        if state["dir"] is not None:  # GC the superseded version
            import shutil

            shutil.rmtree(os.path.join(out_dir, state["dir"]), ignore_errors=True)

    return merge


def read_additive_mv(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the live version of an additive-merge MV: resolve the
    ``CURRENT`` pointer written by :func:`foreach_batch_additive_merge`
    and scan only the committed serving dir.

    A missing pointer means NO batch ever committed (e.g. the stream
    drained zero micro-batches) — surfaced as a descriptive error
    rather than a bare FileNotFoundError, because "empty stream" and
    "wrong path" need different fixes and the raw errno can't tell
    them apart."""
    import json

    pointer = os.path.join(out_dir, "CURRENT")
    try:
        with open(pointer) as fh:
            state = json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"additive MV at {out_dir!r} has no CURRENT pointer: no "
            "micro-batch has ever committed (empty/failed stream, or "
            "wrong out_dir) — the MV read has nothing serveable yet"
        ) from None
    return spark.read.parquet(os.path.join(out_dir, state["dir"]))


def write_orc(
    df: DataFrame, path: str, partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (A-family).  Spark bundles the ORC datasource, so this
    is a first-class round-trippable format offline; Avro's external
    ``spark-avro`` module is NOT bundled and cannot be fetched in this
    container, so Avro remains an unsupported documented gap alongside
    the ES/JDBC connector stand-ins."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.orc(path)


#: Embedded Derby ships with Spark (metastore dependency) — a REAL JDBC
#: endpoint with zero extra deps.  Production PG swaps url + driver.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite") -> None:
    """A8 real JDBC sink: the actual ``df.write.jdbc`` path (executors
    open driver connections and batch INSERTs — the same code path a
    PostgreSQL serving layer uses, pointed at embedded Derby here)."""
    df.write.mode(mode).jdbc(url, table, properties={"driver": DERBY_DRIVER})


def read_jdbc(spark: SparkSession, url: str, table: str) -> DataFrame:
    """A8 read side: ``spark.read.jdbc`` — full-table scan through the
    JDBC driver (production adds partitionColumn/bounds for parallel
    reads; Derby embedded serves one JVM, so a single partition is the
    honest shape here)."""
    return spark.read.jdbc(url, table, properties={"driver": DERBY_DRIVER})
