package graft.importer

import org.apache.spark.sql.types._
import scala.io.Source

/** Positional `name=Type` schema-file parser (reference package.scala:20-37,
  * README.md:66-70): one column per line, order must match the CSV, `#` starts
  * a comment line, blank lines ignored.
  *
  * The reference's six types are kept verbatim; `Timestamp`/`Date`/`Decimal`
  * are documented extensions. Unsupported types raise (the reference threw a
  * bare MatchError — package.scala:33-34; we raise a named error instead).
  */
object SchemaFile {

  def parseType(tpe: String): DataType = tpe match {
    case "String"    => StringType
    case "Long"      => LongType
    case "Int"       => IntegerType
    case "Double"    => DoubleType
    case "Float"     => FloatType
    case "Boolean"   => BooleanType
    case "Timestamp" => TimestampType
    case "Date"      => DateType
    case "Decimal"   => DecimalType(18, 4)
    case other => throw new IllegalArgumentException(
      s"Unsupported schema type '$other' (supported: String, Long, Int, Double, Float, Boolean, Timestamp, Date, Decimal)")
  }

  def parseLines(lines: Iterator[String]): StructType = {
    val fields = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        line.split("=").map(_.trim) match {
          case Array(name, tpe) => StructField(name, parseType(tpe), nullable = true)
          case _ => throw new IllegalArgumentException(s"Malformed schema line '$line' (expected name=Type)")
        }
      }.toArray
    StructType(fields)
  }

  def parse(path: String): StructType = {
    val src = Source.fromFile(path, "UTF-8")
    try parseLines(src.getLines()) finally src.close()
  }
}
