package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators: multi-dimensional clustering so file- and
  * row-group-level min/max statistics prune scans on MORE than the
  * leading sort column — the lakehouse Z-ORDER technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as a plain Spark write pattern:
  * interleave the key bits (Morton curve), range-partition by the
  * interleaved value, sort within partitions.
  *
  * Why it matters at 100 TB: a table sorted by `user_id` alone prunes
  * `user_id` predicates but every file still spans the full `ts` range;
  * z-ordering gives every file a compact hyper-rectangle in
  * (user_id, ts) space, so either predicate (or both) skips most files
  * via footer stats alone — no index structures, no extra reads.
  */
object Layout {

  /** Contiguous global row numbers (0-based, ordered by `key`) WITHOUT
    * a global single-partition window — the scale-correct form of
    * `row_number() OVER (ORDER BY key)`. Three steps: range-partition
    * by the key (Spark samples boundaries, so partitions are
    * order-contiguous), compute each partition's row count and its
    * exclusive prefix-sum offset (a window over ≤ numPartitions
    * metadata rows — the ONLY single-partition step, and it touches
    * dozens of rows, not data), then per-partition row_number + offset
    * via a broadcast join. The data shuffles once (the range exchange);
    * at 100 TB this is a sort-scale job where the naive global window
    * is a one-executor wall.
    *
    * `key` must be a total order (unique) for a deterministic
    * numbering; equal keys stay in one partition (range partitioning
    * guarantees it) and break ties arbitrarily.
    *
    * The partition id is pinned by a `localCheckpoint` BEFORE being
    * read twice: `spark_partition_id()` is non-deterministic, and the
    * offsets subtree and the numbering subtree would otherwise each
    * re-evaluate it under their own (AQE-replanned) physical layout —
    * observed to disagree. The checkpoint costs one materialization
    * pass (executor storage); at extreme scale the storage-free
    * alternative is the RDD `zipWithIndex` formulation of the same
    * count-and-offset algorithm. */
  def globalRowNumber(df: DataFrame, key: Column, nParts: Int = 0,
                      keepTotal: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireTotalFree(df, keepTotal)
    val (parts, offsets) = rangeOffsets(df, key, nParts, count(lit(1)))
    val w = Window.partitionBy(col("__pid")).orderBy(key)
    val out = parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn("row_num",
        row_number().over(w).cast(LongType) + col("__offset") - 1L)
      .drop("__pid", "__offset")
    if (keepTotal) out.withColumnRenamed("__total", "total")
    else out.drop("__total")
  }

  /** `keepTotal = true` emits its grand total as column `total`; a
    * caller whose input already carries one would otherwise get a
    * silently ambiguous duplicate — fail fast instead (rename or drop
    * the input column, or take the total from [[rangeOffsets]]'
    * metadata yourself). */
  private def requireTotalFree(df: DataFrame, keepTotal: Boolean): Unit =
    require(!keepTotal || !df.columns.contains("total"),
      "keepTotal=true but the input already has a 'total' column; " +
        "rename it before numbering")

  /** Shared count-and-offset core of [[globalRowNumber]] and
    * [[globalPrefixSum]]: range-partition on `key`, pin the partition
    * id with a `localCheckpoint` (see globalRowNumber's scaladoc for
    * the AQE re-plan race this prevents), aggregate `perPid` per
    * partition, and derive each partition's EXCLUSIVE prefix offset —
    * plus the grand total, attached for free by a second window over
    * the same ≤ numPartitions metadata rows (callers that need the
    * total would otherwise pay a second pass over the checkpointed
    * data). Returns (checkpointed parts, broadcastable offsets with
    * __pid/__offset/__total). */
  private def rangeOffsets(df: DataFrame, key: Column, nParts: Int,
                           perPid: Column): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val n = if (nParts > 0) nParts
            else df.sparkSession.sparkContext.defaultParallelism
    val parts = df.repartitionByRange(n, key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val offsets = parts.groupBy(col("__pid"))
      .agg(perPid.as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total",
        sum(col("__n")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col("__pid"), col("__offset"), col("__total"))
    (parts, offsets)
  }

  /** Exact SQL `ntile(k)` semantics from a 0-based global row number
    * and the total row count — the scale-safe replacement for
    * `ntile(k) OVER (ORDER BY …)`, which plans as a single-partition
    * window over every data row. Standard ntile hands the remainder to
    * the FIRST buckets: with n = q·k + m, buckets 1..m hold q+1 rows
    * and buckets m+1..k hold q. (The tempting `floor(r·k/n)+1`
    * equi-width formula is NOT ntile — it spreads the remainder, e.g.
    * n=10, k=4 gives 3,2,3,2 instead of ntile's 3,3,2,2.)
    *
    * Pair with [[globalRowNumber]]: one range exchange + metadata
    * offsets instead of the one-executor sort wall. Requires n ≥ k for
    * parity with SQL ntile (below that, ntile numbers rows 1..n while
    * any closed formula over k buckets cannot). */
  def ntileFromRowNum(rowNum: Column, total: Column, k: Int): Column = {
    require(k >= 1, s"k out of range: $k")
    val r = rowNum.cast(LongType)
    val n = total.cast(LongType)
    // Column./ is DOUBLE division — every quotient here must be the
    // integer one, so floor+cast each
    def idiv(a: Column, b: Column): Column = floor(a / b).cast(LongType)
    val q = idiv(n, lit(k.toLong))  // base bucket size
    val m = n % k                   // first m buckets get q+1 rows
    val headRows = m * (q + 1L)
    // greatest(q,1): the otherwise-branch divisor is only reached when
    // q >= 1, but it must never be a literal 0 even in dead branches
    (when(r < headRows, idiv(r, q + 1L))
      .otherwise(m + idiv(r - headRows, greatest(q, lit(1L)))) + 1L)
      .cast(IntegerType)
  }

  /** Inclusive global prefix sum of `value` ordered by `key` WITHOUT a
    * single-partition window — `SUM(value) OVER (ORDER BY key ROWS
    * UNBOUNDED PRECEDING)` in the same count-and-offset shape as
    * [[globalRowNumber]]: range-partition on the key, per-partition
    * running sum, plus each partition's exclusive total-offset computed
    * over ≤ numPartitions metadata rows and broadcast back. Adds column
    * `cum` (LongType). Same key contract and `localCheckpoint`
    * partition-id pinning as globalRowNumber. */
  def globalPrefixSum(df: DataFrame, value: Column, key: Column,
                      nParts: Int = 0,
                      keepTotal: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireTotalFree(df, keepTotal)
    val (parts, offsets) =
      rangeOffsets(df, key, nParts, sum(value.cast(LongType)))
    val w = Window.partitionBy(col("__pid")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parts.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum", sum(value.cast(LongType)).over(w) + col("__offset"))
      .drop("__pid", "__offset")
    if (keepTotal) out.withColumnRenamed("__total", "total")
    else out.drop("__total")
  }

  /** Morton (Z-order) bit-interleave of two columns clamped to
    * `bits`-bit unsigned range: result bit 2i = bit i of `a`, bit
    * 2i+1 = bit i of `b`. Pure Catalyst fold over bit positions —
    * codegen'd, no UDF. Callers normalize dimensions into range first
    * (e.g. `pmod(x, 1 << bits)` or a rank/bucket transform). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val al = pmod(a.cast(LongType), lit(1L << bits))
    val bl = pmod(b.cast(LongType), lit(1L << bits))
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", al, i).bitwiseAND(lit(1L)), i * 2))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", bl, i).bitwiseAND(lit(1L)), i * 2 + 1)))
  }

  /** Z-order clustered parquet write: range-partition on the
    * interleaved key (each output file owns a contiguous z-range =
    * a compact rectangle in (c1, c2) space), sort within partitions
    * (row groups inside each file cluster further), drop the helper
    * column. `numFiles` sizes the output — at 100 TB pick it from
    * target file size, exactly like any partitioned-write sizing. */
  def zorderWrite(df: DataFrame, c1: Column, c2: Column, path: String,
                  numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue2(c1, c2, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Schema-driven per-row in-memory byte estimate, as a pure column
    * expression: fixed widths for numeric/temporal types, `length()`
    * for strings, `size()·eltWidth` for primitive arrays. An
    * ESTIMATE by design (no encoding/overhead modelling) — its job
    * is sizing shuffles and writes to the right order of magnitude,
    * not accounting. Fails fast on types it cannot price. */
  def rowBytes(df: DataFrame): Column =
    df.schema.fields.map { f =>
      f.dataType match {
        case LongType | DoubleType | TimestampType |
             TimestampNTZType => lit(8L)
        case IntegerType | DateType | FloatType => lit(4L)
        case ShortType => lit(2L)
        case BooleanType | ByteType => lit(1L)
        case StringType =>
          coalesce(length(col(f.name)).cast(LongType), lit(0L))
        case BinaryType =>
          coalesce(length(col(f.name)).cast(LongType), lit(0L))
        // explicit isNull branch, not coalesce(size(·)·w, 0): with
        // ANSI off, legacy size(NULL) = -1 — the coalesce form would
        // silently price null arrays at -4/-8 bytes there, diverging
        // from the documented "NULL prices as 0" contract (and from
        // the x108 oracle's COALESCE semantics). This form is
        // config-independent.
        case ArrayType(FloatType | IntegerType | DateType, _) =>
          when(col(f.name).isNull, lit(0L))
            .otherwise(size(col(f.name)).cast(LongType) * 4L)
        case ArrayType(DoubleType | LongType | TimestampType, _) =>
          when(col(f.name).isNull, lit(0L))
            .otherwise(size(col(f.name)).cast(LongType) * 8L)
        case other => throw new IllegalArgumentException(
          s"rowBytes: no width rule for column ${f.name}: $other")
      }
    }.reduce(_ + _)

  /** EXECUTABLE partition-sizing rule (the lgkFor/bandsFor pattern
    * applied to the shuffle itself): measure a relation's estimated
    * bytes and recommend `spark.sql.shuffle.partitions` for a
    * `shuffleMb` in-memory target and output file count for a
    * `fileMb` write target — the two numbers every 100 TB job must
    * set and usually guesses. One aggregation pass; ceil() done as
    * floor((b + t − 1)/t) on IEEE-identical doubles so an oracle
    * reproduces the recommendation bit-for-bit. Returns a 1-row
    * (tbl, n_rows, est_total_mb, rec_shuffle_partitions,
    * rec_write_files) pane. */
  def partitionAdvisor(df: DataFrame, table: String,
                       shuffleMb: Int = 128,
                       fileMb: Int = 512): DataFrame =
    partitionAdvisorBytes(df, table, shuffleMb.toLong * 1048576L,
      fileMb.toLong * 1048576L)

  /** Byte-grain form of [[partitionAdvisor]] — same pane, targets in
    * bytes. The MB form is the production interface; this one exists
    * so the advisor→write wiring ([[writeAdvised]], x108b) can
    * exercise a multi-file recommendation at test scales where every
    * table fits inside 1 MB targets. */
  def partitionAdvisorBytes(df: DataFrame, table: String,
                            shuffleBytes: Long,
                            fileBytes: Long): DataFrame = {
    require(shuffleBytes > 0L && fileBytes > 0L,
      s"targets must be positive: shuffle=$shuffleBytes file=$fileBytes")
    def ceilDiv(b: Column, t: Long): Column =
      greatest(lit(1L), floor((b + lit((t - 1).toDouble)) /
        lit(t.toDouble)).cast(LongType))
    df.agg(count(lit(1)).as("n_rows"),
        coalesce(sum(rowBytes(df).cast(DecimalType(38, 0))),
          lit(0L).cast(DecimalType(38, 0))).as("bytes"))
      .select(lit(table).as("tbl"), col("n_rows"),
        floor(col("bytes").cast(DoubleType) / lit(1048576.0d))
          .cast(LongType).as("est_total_mb"),
        ceilDiv(col("bytes").cast(DoubleType), shuffleBytes)
          .as("rec_shuffle_partitions"),
        // write files are clamped to the row count: round-robin
        // repartition above n_rows leaves EMPTY partitions, which
        // emit no parquet part files — an unclamped rec on a tiny
        // relation would recommend more files than any write can
        // realize, breaking writeAdvised's realized == recommended
        // contract. (Shuffle partitions stay unclamped: empty shuffle
        // tasks are benign, and the shuffle rec sizes reducers, not
        // artifacts.)
        least(ceilDiv(col("bytes").cast(DoubleType), fileBytes),
          greatest(lit(1L), col("n_rows"))).as("rec_write_files"))
  }

  /** The advisor DRIVING the write (the x109→saltedJoin "advisor
    * output is the action's input" discipline applied to x108): size
    * the relation, `repartition(rec_write_files)`, write parquet —
    * so the recommended file count is REALIZED, not just printed.
    * Returns (advisor pane, recommended files) after the write
    * completes; round-robin repartition of a non-empty relation
    * leaves no empty partitions, so the parquet file count equals
    * the recommendation exactly (x108b's pane re-reads the directory
    * and publishes the realized count next to the recommendation).
    * The 1-row pane collect is the admission-gate scalar idiom: the
    * decision is per-write, not per-row.
    *
    * repartition (one round-robin shuffle), NOT coalesce: the
    * advisor's contract is size-TARGETED files, and round-robin is
    * what makes every output file ≈ bytes/rec regardless of input
    * skew — coalesce merges adjacent input partitions as-is (no
    * shuffle, but file sizes inherit the skew) and is the right tool
    * only when cheap concatenation is the goal, which is
    * [[graft.sources.Lake.compact]]'s job, not this one's.
    *
    * Round-robin DESTROYS any pre-existing sort/cluster order: rows
    * are dealt across partitions regardless of key, so a relation
    * laid out by [[zorderWrite]] (b3) loses its file-level clustering
    * — and with it data-skipping min/max pruning — if passed through
    * here. Size-targeted AND clustered files want
    * `repartitionByRange(rec, keys…)` at the same file target (range
    * exchange preserves a total order across files); chain zorderWrite
    * AFTER sizing, never before. The recommendation is clamped to the
    * row count (see [[partitionAdvisorBytes]]) so realized ==
    * recommended holds even when the relation has fewer rows than the
    * byte arithmetic suggests files. */
  def writeAdvised(df: DataFrame, table: String, path: String,
                   fileBytes: Long): (DataFrame, Int) = {
    val row = partitionAdvisorBytes(df, table, shuffleBytes = fileBytes,
      fileBytes = fileBytes).localCheckpoint()
    val first = row.select(col("rec_write_files"), col("n_rows"))
      .collect()(0)
    val rec = first.getLong(0).toInt
    val nRows = first.getLong(1)
    // Round-robin repartition seeds each input partition's start
    // offset independently (a per-partition Random(index)), so when
    // rec approaches n_rows with rows spread across several input
    // partitions, start-offset collisions can leave target partitions
    // EMPTY and realized files < rec — the contract would hold only
    // by seed luck (ADVICE r8). In that regime (≈1-row files — only
    // reachable on tiny relations or pathological byte targets),
    // assign rows DETERMINISTICALLY instead: contiguous global row
    // numbers (scale-safe range-exchange numbering, no global window)
    // range-partitioned into exactly rec runs — with n_rows ≥ rec
    // contiguous keys, every target owns ≥ 1 row by construction.
    // Away from that regime (rows ≫ rec, every input partition holds
    // ≥ rec rows) round-robin provably fills every target and skips
    // the numbering pass.
    val canNumber = !df.columns.contains("row_num") &&
      !df.columns.contains("__mid") // numbering adds these two
    val out =
      if (rec > 1 && nRows < 4L * rec && canNumber) {
        globalRowNumber(
          df.withColumn("__mid", monotonically_increasing_id()),
          col("__mid"))
          .repartitionByRange(rec, col("row_num"))
          .drop("__mid", "row_num")
      } else df.repartition(rec)
    out.write.mode("overwrite").parquet(path)
    (row, rec)
  }
}
