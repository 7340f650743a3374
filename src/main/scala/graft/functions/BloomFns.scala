package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-filter sketch surface — the runtime-filter building block
  * Spark's AQE injects for shuffle joins (`InjectRuntimeFilter`),
  * exposed as explicit columns so a pipeline can build the sketch once
  * (e.g. over a dim's keys), persist or broadcast it, and pre-filter
  * arbitrarily many probe sides before their shuffles. The expressions
  * are Spark's own (`BloomFilterAggregate` / `BloomFilterMightContain`);
  * they are not in the public FunctionRegistry, so this module bridges
  * them to Columns. Keys are xxhash64-ed exactly like the built-in
  * runtime filter does. */
object BloomFns {

  /** Aggregate a key column into a serialized bloom filter (binary). */
  def bloomAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.toCol(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.toExpr(key))),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a materialized bloom sketch — false
    * positives possible (bounded by the sizing), false negatives never.
    * `might_contain` requires a constant bloom, so pass the serialized
    * bytes (the sketch is KBs — materializing it IS the broadcast step
    * the built-in runtime filter performs). */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.toCol(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(Bridge.toExpr(key)))))
}
