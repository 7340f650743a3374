package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Header-CSV blob reader with the two repairs real scraped blobs need
  * (the reference's actual `src_*.csv` files carry both; its pandas
  * reader applies them implicitly):
  *
  *  - a UTF-8 BOM glued to the first header cell (files written with
  *    `utf_8_sig`, e.g. the reference's `src_taipei.csv` and every
  *    `Normalization_*.csv` — `fb_scraper/normalization.py:85`) is
  *    stripped, so the first column's NAME is clean;
  *  - empty header cells (a trailing comma in the header row, e.g.
  *    `src_tripadvisor.csv`) get the pandas name `Unnamed: <i>` —
  *    the name the reference's cleaning chains drop by
  *    (`transfer_src_tripadvisor_to_ods_tripadvisor.py:70`), where
  *    Spark would otherwise invent `_c<i>`.
  *
  * Everything else is the stock Spark CSV source (pushdown, schema
  * inference off — blobs read as strings, coercion is the cleaning
  * chain's job, same as `pandas.read_csv` + `to_numeric`).
  */
object Csv {

  private val sparkAuto = "^_c\\d+$".r

  def readBlob(spark: SparkSession, path: String,
               multiLine: Boolean = false): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      // RFC-4180 doubled-quote escaping ("" inside a quoted field),
      // pandas' default. Spark's default escape is backslash, which
      // silently desyncs columns on real scraped rows that embed
      // doubled quotes (e.g. the fb_scraper post blobs).
      .option("escape", "\"")
      .csv(path)
    val cols = raw.columns.zipWithIndex.map { case (c0, i) =>
      val c = if (i == 0) c0.stripPrefix("\uFEFF") else c0
      if (c.isEmpty || sparkAuto.matches(c)) s"Unnamed: $i" else c
    }
    raw.toDF(cols.toIndexedSeq: _*)
  }
}
