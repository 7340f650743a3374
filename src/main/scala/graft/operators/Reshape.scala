package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators (SURVEY §2.8): melt/unpivot, split-explode,
  * small-table transpose, pivot.
  */
object Reshape {

  /** Wide→long melt (reference pandas `.melt`,
    * `transfer_src_taipei_to_ods_taipei.py:74`). */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String, valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)

  /** Split a delimited string column and explode to one row per element,
    * trimmed (reference `transfer_src_tripadvisor_to_ods_tripadvisor.py:75-76`,
    * split on `•`). */
  def explodeSplit(df: DataFrame, src: String, out: String,
                   delim: String): DataFrame =
    df.withColumn(out, explode(split(col(src), delim)))
      .withColumn(out, trim(col(out)))

  /** Transpose a small key→value table into a single wide row
    * (reference header-block transpose,
    * `transfer_src_taipei_to_ods_taipei.py:67-68`). Pure pivot —
    * key cardinality must be small (it becomes the column count). */
  def transposeSmall(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy().pivot(keyCol).agg(first(col(valCol)))

  /** Pivot matrix build (reference populartimes 7×24 accumulation,
    * `populartimes/crawler.py:215-269`). */
  def pivotMatrix(df: DataFrame, rowKey: Column, pivotCol: String,
                  agg: Column): DataFrame =
    df.groupBy(rowKey).pivot(pivotCol).agg(agg)
}
