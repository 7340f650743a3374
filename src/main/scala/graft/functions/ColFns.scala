package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar column builders — the reference's per-row cleaning functions
  * re-expressed as pure Catalyst expression compositions (no UDFs, fully
  * codegen'd / pushdown-friendly; SURVEY §2.9, §7.3).
  */
object ColFns {

  /** md5 surrogate key of a utf-8 string (reference
    * `airflow/utils/common.py:8-19`). */
  def md5Key(c: Column): Column = md5(c.cast(StringType))

  /** Chinese relative-date resolution — reference `convertDate` TEMP
    * FUNCTION, `airflow/dags/gmaps/d_gmaps_reviews_src_to_ods.py:51-62`.
    *
    * "N分鐘前/小時前/天前/週前" resolve by timestamp arithmetic against the
    * extraction time; "N個月前/年前" resolve by *calendar* arithmetic on the
    * extraction date (a month is not 30 days); anything else → NULL.
    * Composed entirely from built-ins (`when`/`regexp_extract`/
    * `make_dt_interval`/`add_months`) so Catalyst can fold and codegen it.
    */
  def convertRelDate(published: Column, extractedAt: Column): Column = {
    val nStr = regexp_extract(published, "(\\d+)", 1)
    val n = when(nStr === "", lit(null)).otherwise(nStr).try_cast("long")
    val nInt = n.cast(IntegerType)
    val ts = extractedAt.cast(TimestampType)
    val d = ts.cast(DateType)
    when(n.isNull, lit(null).cast(DateType))
      .when(published.endsWith("分鐘前"),
        (ts - make_dt_interval(lit(0), lit(0), n, lit(0))).cast(DateType))
      .when(published.endsWith("小時前"),
        (ts - make_dt_interval(lit(0), n, lit(0), lit(0))).cast(DateType))
      .when(published.endsWith("天前"),
        (ts - make_dt_interval(n, lit(0), lit(0), lit(0))).cast(DateType))
      .when(published.endsWith("週前"),
        (ts - make_dt_interval(n * 7, lit(0), lit(0), lit(0))).cast(DateType))
      .when(published.endsWith("個月前"), add_months(d, -nInt))
      .when(published.endsWith("年前"), add_months(d, -nInt * 12))
      .otherwise(lit(null).cast(DateType))
  }

  /** Facebook Chinese date normalization — the pandas variant of relative-
    * date resolution (reference `fb_scraper/normalization.py:23-53`):
    *
    *  - "在線上" anywhere or a leading "+" → NULL (skipped rows);
    *  - "N天" → refDate − N days (garbage N → NULL, int() raise);
    *  - contains 小时/小時/分鐘 → refDate itself;
    *  - "YYYY年M月D日…" → that absolute date;
    *  - "M月D日…" (with optional 上午/下午 time suffix, stripped) → that
    *    day in refDate's year;
    *  - "M月" alone → NULL (the reference's strptime always fails on it);
    *  - anything else → NULL: the reference's fallthrough calls
    *    `ref_date.date()` on what is already a `date`
    *    (`normalization.py:53`), which always raises and lands in the
    *    except→None path — so unknown strings normalize to null, kept.
    *
    * Pure Catalyst composition; invalid calendar dates null out via
    * try_cast (pandas' exception→None). */
  def fbDate(raw: Column, refDate: Column): Column = {
    val ref = refDate.cast(DateType)
    val nullDate = lit(null).cast(DateType)
    def mkDate(y: Column, m: Column, d: Column): Column =
      concat_ws("-", y, lpad(m, 2, "0"), lpad(d, 2, "0")).try_cast("date")
    val dayN = regexp_extract(raw, "^(\\d+)天$", 1).try_cast("int")
    val stripped = regexp_replace(raw, "(上午|下午).*$", "")
    when(raw.isNull, nullDate)
      .when(raw.contains("在線上") || raw.startsWith("+"), nullDate)
      .when(raw.contains("天"),
        when(dayN.isNull, nullDate).otherwise(date_sub(ref, dayN)))
      .when(raw.contains("小时") || raw.contains("小時") || raw.contains("分鐘"), ref)
      .when(raw.contains("年"), mkDate(
        regexp_extract(stripped, "^(\\d{4})年", 1),
        regexp_extract(stripped, "年(\\d{1,2})月", 1),
        regexp_extract(stripped, "月(\\d{1,2})日", 1)))
      .when(raw.contains("月") && raw.contains("日"), mkDate(
        year(ref).cast(StringType),
        regexp_extract(stripped, "^(\\d{1,2})月", 1),
        regexp_extract(stripped, "月(\\d{1,2})日", 1)))
      .when(raw.contains("月"), nullDate)
      .otherwise(nullDate)
  }

  /** Rating parse `"4.0 分 (共 5 分)"` → 4.0, null on garbage (reference
    * `tripadvisor/d_tripadvisor_src_to_ods.py:74-81`, pandas
    * `errors="coerce"` semantics via try_cast). */
  def parseRating(c: Column): Column =
    split(c, " ").getItem(0).try_cast("double")

  /** ROC-formatted year `"104(2015)"` → 2015 (reference
    * `transfer_src_taipei_to_ods_taipei.py:72`). */
  def rocYear(c: Column): Column =
    regexp_extract(c, "\\((\\d+)\\)", 1).try_cast("int")

  /** City / region split of a zh address state — `"台北市信義區"` →
    * ("台北市", "信義區") (reference `gmaps/d_gmaps_dim_places.py:40-41`). */
  def cityOf(state: Column): Column = regexp_extract(state, "^(.*?[市縣])", 1)
  def regionOf(state: Column): Column = regexp_extract(state, "[市縣](.*)$", 1)

  /** CASE-based quarter, exact reference semantics
    * (`gmaps/d_gmaps_dim_time.py:39-47`). */
  def quarterCase(monthCol: Column): Column =
    when(monthCol.between(1, 3), 1)
      .when(monthCol.between(4, 6), 2)
      .when(monthCol.between(7, 9), 3)
      .when(monthCol.between(10, 12), 4)

  // ---- text analysis (LLM-pipeline surface; BASELINE.json north star) ----

  /** Latin accent folding + control-char strip — the text
    * normalization pass ahead of dedup hashing and tokenizer
    * training (café/cafe must collide). An explicit `translate`
    * table (both engines ship translate with identical semantics)
    * rather than locale-sensitive Normalizer calls: deterministic,
    * codegen'd, engine-portable. Covers the Latin-1 supplement
    * letters; extend the table, not the mechanism, for more. */
  private val accented =
    "àáâãäåÀÁÂÃÄÅçÇèéêëÈÉÊËìíîïÌÍÎÏñÑòóôõöÒÓÔÕÖùúûüÙÚÛÜýÿÝ"
  private val folded =
    "aaaaaaAAAAAAcCeeeeEEEEiiiiIIIInNoooooOOOOOuuuuUUUUyyY"
  def foldAccents(text: Column): Column =
    translate(regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),
      accented, folded)

  /** Full text normalization for dedup keys and tokenizer input:
    * lowercase → accent fold + control strip ([[foldAccents]]) →
    * whitespace collapse → trim. Idempotent (normalize ∘ normalize =
    * normalize, property-tested), so re-normalizing already-clean
    * data is safe — the invariant that lets ingest stages apply it
    * unconditionally. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(foldAccents(lower(text)), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: word pieces + digits + punctuation as
    * separate tokens (GPT-2-style pre-tokenizer regex, simplified to
    * what both Spark's and DuckDB's RE2-family engines support). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character ratio (0 when empty). */
  def punctRatio(text: Column): Column = {
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val len = length(text)
    when(len === 0, 0.0d).otherwise(punct.cast(DoubleType) / len.cast(DoubleType))
  }

  /** English stopword hit ratio over whitespace tokens. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  def stopwordRatio(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val hits = size(filter(toks, t => array_contains(
      array(stopwords.map(lit): _*), t)))
    when(size(toks) === 0, 0.0d)
      .otherwise(hits.cast(DoubleType) / size(toks).cast(DoubleType))
  }

  /** Document fingerprint: md5 of whitespace-normalized, lowercased text
    * (canonical-form exact-dup key). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Portable 60-bit integer hash: the first 15 hex digits of md5,
    * parsed base-16. Unlike xxhash64 this reproduces bit-for-bit in any
    * engine with an md5() (DuckDB/Trino/BigQuery: `CAST('0x' ||
    * substring(md5(x),1,15) AS BIGINT)`), which is what you want for
    * cross-system dedup audits and lineage fingerprints. 60 bits keeps
    * it positive in a signed int64, so modulo/shift arithmetic downstream
    * is sign-free. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** Great-circle (haversine) distance in km. The degree→radian factor
    * is inlined as a literal so an oracle engine writes the SAME
    * constant (π/180 to full double precision); `sin·sin` instead of
    * `pow` keeps both engines on the same libm entry points. */
  def haversineKm(lat1: Column, lng1: Column,
                  lat2: Column, lng2: Column): Column = {
    val rad = lit(0.017453292519943295d) // π/180
    val dlat = (lat2 - lat1) * rad / 2.0d
    val dlng = (lng2 - lng1) * rad / 2.0d
    val a = sin(dlat) * sin(dlat) +
      cos(lat1 * rad) * cos(lat2 * rad) * sin(dlng) * sin(dlng)
    lit(12742.0176d) * asin(sqrt(a)) // 2 × mean earth radius 6371.0088
  }
}
