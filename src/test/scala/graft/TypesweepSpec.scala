package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._

/** Wires the oracle output-type gate (tools/typesweep.py) into `sbt
  * test` so it can never again be skipped by hand — the round-5 and
  * round-9 incident class (DuckDB widens sum(BIGINT) to HUGEINT, the
  * driver hash is type-sensitive, rows+schema+values all "match" while
  * hash_match fails) shipped twice precisely because the gate was a
  * manual tool.
  *
  * Two tiers, both DESCRIBE-only (no oracle execution):
  *   1. allowlist — every oracle output column must use a type Spark
  *      writes to parquet identically (no HUGEINT/unsigned/UUID/...)
  *   2. parity    — every oracle column type must EQUAL the Spark
  *      query's analysis-time output type (catches int32-vs-BIGINT:
  *      rank()/grouping() are int in Spark, BIGINT in DuckDB)
  *
  * The Spark side comes from `df.schema` only — plan analysis, no job
  * runs. The DuckDB side shells out to python3 (the driver's oracle
  * stack); if that stack is absent the test is canceled, not passed,
  * so a green suite never silently means "gate skipped".
  */
class TypesweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // JSON string escape — same contract as Verify.main's exporter.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Canonical type name matching typesweep.py's canon() of DuckDB
    * DESCRIBE output. DECIMAL carries scale only (precision widening
    * rules differ while values render identically). */
  private def duckName(dt: DataType): String = dt match {
    case BooleanType      => "BOOLEAN"
    case ByteType         => "TINYINT"
    case ShortType        => "SMALLINT"
    case IntegerType      => "INTEGER"
    case LongType         => "BIGINT"
    case FloatType        => "FLOAT"
    case DoubleType       => "DOUBLE"
    case _: StringType    => "VARCHAR"
    case DateType         => "DATE"
    case TimestampType    => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case BinaryType       => "BLOB"
    case d: DecimalType   => s"DECIMAL(*,${d.scale})"
    case a: ArrayType     => duckName(a.elementType) + "[]"
    case _: MapType       => "MAP"
    case _: StructType    => "STRUCT"
    case other            => s"UNSUPPORTED(${other.sql})"
  }

  private def haveOracleStack: Boolean =
    scala.util.Try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .start().waitFor() == 0
    }.getOrElse(false)

  test("oracle output types are Spark-exact (typesweep + schema parity)") {
    assume(haveOracleStack,
      "python3+duckdb (driver oracle stack) unavailable in this env")
    val tmp = Files.createTempDirectory("graft_typesweep").toString
    val oracleJson = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$tmp/oracle_sql.json"), oracleJson)
    // Analysis-only Spark output schemas for every oracle-gated query.
    val schemaJson = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .map { case (name, fn) =>
        val fields = fn(spark, TestSpark.sf).schema.fields
          .map(f => s"[${q(f.name)}, ${q(duckName(f.dataType))}]")
          .mkString("[", ",", "]")
        s"${q(name)}: $fields"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$tmp/spark_schema.json"), schemaJson)
    val proc = new ProcessBuilder(
      "python3", "tools/typesweep.py", TestSpark.sf, tmp,
      "--schemas", s"$tmp/spark_schema.json")
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    assert(code == 0,
      s"typesweep flagged non-Spark-exact oracle columns:\n" +
        out.linesIterator.filter(_.startsWith("BAD")).mkString("\n"))
  }
}
