package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.functions.ColFns

/** Property-style vectors for the date-resolution functions (SURVEY §5:
  * the reference has no tests; these pin the calendar arithmetic that
  * hand-picked vectors can miss — month-end clamping, year boundaries,
  * large offsets). Vectors are drawn with a fixed seed (deterministic
  * reruns) and each batch drives the Catalyst expression through one
  * DataFrame, so what's tested is the compiled plan, in bulk. */
class DatePropertySpec extends GraftSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val lo = LocalDate.of(2000, 1, 1).toEpochDay
  private val hi = LocalDate.of(2030, 12, 31).toEpochDay
  private def randDate(): LocalDate =
    LocalDate.ofEpochDay(lo + rnd.nextLong(hi - lo))

  private def resolveBatch(rows: Seq[(String, String)]): Seq[Option[String]] =
    rows.toDF("p", "e")
      .select(date_format(
        ColFns.convertRelDate(col("p"), col("e").cast("timestamp")),
        "yyyy-MM-dd").as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("convertRelDate: N天前 is exact epoch-day subtraction (100 vectors)") {
    val cases = Seq.fill(100) { (randDate(), 1 + rnd.nextInt(400)) }
    val got = resolveBatch(cases.map { case (d, n) => (s"${n}天前", s"$d 12:00:00") })
    cases.zip(got).foreach { case ((d, n), g) =>
      assert(g === Some(d.minusDays(n.toLong).toString), s"$d minus $n days")
    }
  }

  test("convertRelDate: N個月前 matches java.time months incl clamping (100)") {
    val cases = Seq.fill(100) { (randDate(), 1 + rnd.nextInt(48)) }
    val got = resolveBatch(cases.map { case (d, n) => (s"${n}個月前", s"$d 12:00:00") })
    cases.zip(got).foreach { case ((d, n), g) =>
      assert(g === Some(d.minusMonths(n.toLong).toString), s"$d minus $n months")
    }
    // explicit month-end clamp vectors
    assert(resolveBatch(Seq(("1個月前", "2024-03-31 00:00:00"))).head
      === Some("2024-02-29"))
    assert(resolveBatch(Seq(("1個月前", "2023-03-31 00:00:00"))).head
      === Some("2023-02-28"))
  }

  test("convertRelDate: N年前 == 12N個月前 (50 vectors)") {
    val cases = Seq.fill(50) { (randDate(), 1 + rnd.nextInt(10)) }
    val a = resolveBatch(cases.map { case (d, n) => (s"${n}年前", s"$d 12:00:00") })
    val b = resolveBatch(cases.map { case (d, n) =>
      (s"${12 * n}個月前", s"$d 12:00:00") })
    assert(a === b)
  }

  test("fbDate: absolute Y年M月D日 round-trips any valid date (100)") {
    val dates = Seq.fill(100)(randDate())
    val got = dates.map(d => s"${d.getYear}年${d.getMonthValue}月${d.getDayOfMonth}日")
      .map(r => (r, "2024-05-10")).toDF("r", "ref")
      .select(date_format(
        ColFns.fbDate(col("r"), col("ref").cast("date")), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(got === dates.map(_.toString))
  }

  test("portableHash60: in [0, 2^60), stable, distinct inputs spread (200)") {
    val inputs = Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString)
    val out = (inputs ++ inputs).toDF("s")
      .select(ColFns.portableHash60(col("s"))).as[Long].collect()
    val (a, b) = out.splitAt(inputs.length)
    assert(a.toSeq === b.toSeq)                       // deterministic
    assert(a.forall(v => v >= 0L && v < (1L << 60)))  // 60-bit, sign-free
    assert(a.distinct.length >= inputs.distinct.length - 1) // no mass collisions
  }
}
