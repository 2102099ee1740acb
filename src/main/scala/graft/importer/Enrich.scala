package graft.importer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-enrichment / array-parse semantics of the reference importer,
  * re-expressed as native Catalyst expressions instead of the reference's four
  * opaque Scala UDFs (reference: package.scala:46-70, 103-106) — so the columns
  * stay prunable, predicates stay pushable, and the whole stage codegens.
  *
  * Observable semantics preserved exactly, including the `""` sentinel on
  * null / non-matching input and the `"[]"` → `[""]` parse quirk.
  */
object Enrich {

  /** Reference regex (package.scala:47): `yyyy-MM-dd HH:mm` validator. Anchored
    * both ends because Scala's `case regex(...)` match is a whole-string match
    * (`Matcher.matches`), while Spark's `regexp_extract` substring-matches —
    * without anchors "2015-03-04 05:06:30" would wrongly yield year=2015 here
    * where the reference returns "".
    */
  private val DatePattern = "^([0-9]{4})-([0-9]{2})-([0-9]{2}) ([0-9]{2}):([0-9]{2})$"

  /** package.scala:48 — date part = everything before the first space; null → "".
    * No regex validation, matching the reference's asymmetry vs year/month.
    */
  def extractDate(c: Column): Column = coalesce(substring_index(c, " ", 1), lit(""))

  /** package.scala:49-57 — year = regex group 1; non-match or null → "". */
  def extractYear(c: Column): Column = coalesce(regexp_extract(c, DatePattern, 1), lit(""))

  /** package.scala:58-66 — month = regex group 2; non-match or null → "". */
  def extractMonth(c: Column): Column = coalesce(regexp_extract(c, DatePattern, 2), lit(""))

  /** package.scala:46-70 applied at 137-141 — appends `date`,`year`,`month`
    * StringType columns derived from a `yyyy-MM-dd HH:mm` string column.
    */
  def dateEnrich(srcCol: String, df: DataFrame): DataFrame =
    df.withColumns(Map(
      "date"  -> extractDate(col(srcCol)),
      "year"  -> extractYear(col(srcCol)),
      "month" -> extractMonth(col(srcCol))))

  /** package.scala:103-106 — `"[a, b]"` string → array: strip brackets, split
    * on ",", trim each element. null/"" → empty array; `"[]"` → `[""]` (the
    * reference's substring/split quirk, pinned by FIXTURES.md A.3).
    */
  def parseArray(c: Column): Column = {
    val stripped = regexp_replace(c, "^\\[|\\]$", "")
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(transform(split(stripped, ","), t => trim(t)))
  }

  /** package.scala:103-106 — appends `<src>_array`; unlike the reference (which
    * accepts and ignores `removeSrc`), the flag is honored — documented
    * divergence per SURVEY.md §2.1 R13.
    */
  def parseAndAppendArrayCol(srcCol: String, df: DataFrame, removeSrc: Boolean = false): DataFrame = {
    val out = df.withColumn(s"${srcCol}_array", parseArray(col(srcCol)))
    if (removeSrc) out.drop(srcCol) else out
  }
}
