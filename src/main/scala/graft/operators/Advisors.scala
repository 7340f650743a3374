package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The standing-state OPS CONSOLE — every maintenance advisor this
  * engine publishes, normalized to ONE action schema and unioned:
  * the single relation a maintenance scheduler polls instead of four
  * tier-specific panes with four shapes. Rows are
  * (tier, ledger, action, recommended, reason, detail):
  *
  *  - `ann/rebuild` — [[Similarity.indexGeometryDrift]]: the trained
  *    cell geometry has been outgrown by accretion.
  *  - `ann/compact` — [[Similarity.compactAdvisor]]: tombstone or
  *    small-file debt says physical maintenance is due.
  *  - `dsir/rebuild` — [[graft.streaming.Streams.dsirLedgerAdvisor]]:
  *    bucket occupancy has saturated the stamped feature width.
  *  - `boilerplate/rethreshold` —
  *    [[graft.streaming.Streams.boilerplateLedgerAdvisor]]: the
  *    frozen blacklist threshold now captures too much of the corpus.
  *
  * Every underlying advisor reads KB-grain standing state only (the
  * repo-wide advisor contract), so the console costs one small read
  * per registered ledger — pollable every few minutes against a
  * 100 TB estate. Each advisor's 1-row pane is collected (the
  * admission-gate scalar idiom: one decision per ledger per poll,
  * never data-grain) and re-emitted in the normalized schema; the
  * `reason` is the advisor's own witnessed value, never a parallel
  * re-derivation (the x118 rule). */
object Advisors {

  private val schema = StructType(Seq(
    StructField("tier", StringType, nullable = false),
    StructField("ledger", StringType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("recommended", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = false)))

  /** One console poll. `annBundles` = (name, path, version,
    * trainedNlist); `dsirLedgers` / `boilerplateLedgers` are
    * (name, path[, maxDocs]) of the standing text-tier ledgers. */
  def opsConsole(spark: SparkSession,
                 annBundles: Seq[(String, String, String, Int)] = Seq.empty,
                 dsirLedgers: Seq[(String, String)] = Seq.empty,
                 boilerplateLedgers: Seq[(String, String, Long)] = Seq.empty)
      : DataFrame = {
    val vs = graft.sources.VersionedState
    val st = graft.streaming.Streams
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    annBundles.foreach { case (name, path, version, trainedNlist) =>
      val enc = vs.read(spark, path, version, "encoded")
      val d = Similarity.indexGeometryDrift(enc, trainedNlist).head()
      rows += Row("ann", name, "rebuild",
        d.getAs[Boolean]("rebuild_recommended"),
        s"sized_nlist_now=${d.getAs[Long]("sized_nlist_now")} " +
          s"trained=${d.getAs[Long]("trained_nlist")} " +
          s"n_now=${d.getAs[Long]("n_now")}")
      val c = Similarity.compactAdvisor(spark, path, version).head()
      rows += Row("ann", name, "compact",
        c.getAs[Boolean]("compact_recommended"),
        s"${c.getAs[String]("reason")} " +
          s"ts_fraction=${c.getAs[Double]("ts_fraction")} " +
          s"advised_files=${c.getAs[Long]("advised_files")}")
    }
    dsirLedgers.foreach { case (name, path) =>
      val d = st.dsirLedgerAdvisor(spark, path).head()
      rows += Row("dsir", name, "rebuild",
        d.getAs[Boolean]("rebuild_recommended"),
        s"load_factor=${d.getAs[Double]("load_factor")} " +
          s"sized_nb_now=${d.getAs[Long]("sized_nb_now")} " +
          s"nb=${d.getAs[Long]("nb")}")
    }
    boilerplateLedgers.foreach { case (name, path, maxDocs) =>
      val b = st.boilerplateLedgerAdvisor(spark, path, maxDocs).head()
      rows += Row("boilerplate", name, "rethreshold",
        b.getAs[Boolean]("rethreshold_recommended"),
        s"blacklist_frac=${b.getAs[Double]("blacklist_frac")} " +
          s"n_blacklisted=${b.getAs[Long]("n_blacklisted")} " +
          s"max_docs=${b.getAs[Long]("max_docs")}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
