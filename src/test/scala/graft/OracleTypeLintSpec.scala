package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.types._

/** Lints every `SparkEntry.oracleSql` entry against the Spark result
  * schema for the numeric-type-class trap that broke the correctness
  * gate twice (text01 round 3, text10 round 4): DuckDB's windowed /
  * list SUM over BIGINT yields HUGEINT, which pandas materializes as
  * float64, so the driver hashes `23.0` against Spark's `23` and fails
  * even though the values agree. The fix is always a CAST in the
  * oracle SQL; this spec makes dropping one of those CASTs (or writing
  * a new oracle without it) a test failure instead of a red gate row.
  *
  * DuckDB is only reachable from Python in this environment, so the
  * spec shells out to scripts/oracle_type_lint.py, which DESCRIBEs
  * each statement (bind only — nothing executes) and reports the
  * DuckDB column types. The spec is cancelled, not failed, where
  * python3/duckdb are absent.
  */
class OracleTypeLintSpec extends SparkSpec {

  /** Numeric type classes whose cross-pairings are hash-fatal. */
  private sealed trait NumClass
  private case object Integral extends NumClass
  private case object Floating extends NumClass
  private case object Fixed extends NumClass // decimal

  private def sparkClass(dt: DataType): Option[NumClass] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(Integral)
    case FloatType | DoubleType                        => Some(Floating)
    case _: DecimalType                                => Some(Fixed)
    case _                                             => None
  }

  /** DuckDB `DESCRIBE` column_type string -> class. HUGEINT is
    * deliberately NOT Integral: pandas has no int128, so it
    * materializes as float64 — the exact trap this spec exists for.
    */
  private def duckClass(t: String): Option[NumClass] = {
    val u = t.toUpperCase
    if (u == "HUGEINT" || u == "UHUGEINT") Some(Floating)
    else if (u.endsWith("INT")) Some(Integral)
    else if (u == "DOUBLE" || u == "FLOAT" || u == "REAL") Some(Floating)
    else if (u.startsWith("DECIMAL")) Some(Fixed)
    else None
  }

  test("every oracle's numeric columns match the Spark type class") {
    val python = Seq("python3", "-c", "import duckdb").! == 0
    assume(python, "python3+duckdb not on PATH — lint runs driver-side")

    val tmp = Files.createTempDirectory("oracle-lint")
    // Reuse Verify's escaping rules: control chars in SQL would break
    // json.load on the python side just as they would for the driver.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case '\n'           => "\\n"
      case '\r'           => "\\r"
      case '\t'           => "\\t"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""
    val sqlJson = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val sqlPath = tmp.resolve("oracle_sql.json")
    val outPath = tmp.resolve("duck_types.json")
    Files.writeString(sqlPath, sqlJson)

    val script = {
      val local = Paths.get(sys.props("user.dir"), "scripts", "oracle_type_lint.py")
      if (Files.exists(local)) local
      else Paths.get("/root/repo/scripts/oracle_type_lint.py")
    }
    val rc = Seq("python3", script.toString, sfDir, sqlPath.toString, outPath.toString).!
    assert(rc == 0, s"oracle_type_lint.py exited $rc")

    val duckTypes = parseTypes(Files.readString(outPath))
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql) {
      val duck = duckTypes.getOrElse(name, Map.empty)
      duck.get("__error__").foreach(e => violations += s"$name: DuckDB bind error: $e")
      // Schema resolution only — the query never runs.
      val sparkSchema = SparkEntry.queries(name)(spark, sfDir).schema
      for (f <- sparkSchema.fields; dt <- duck.get(f.name)) {
        (sparkClass(f.dataType), duckClass(dt)) match {
          case (Some(s), Some(d)) if s != d =>
            violations += s"$name.${f.name}: Spark ${f.dataType.simpleString} ($s) vs DuckDB $dt ($d) — add a CAST in the oracle SQL"
          case _ => ()
        }
      }
      // A column the oracle doesn't produce at all is a rows/schema
      // failure the gate already catches loudly; not re-checked here.
      val _ = sql
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  /** Minimal parser for the {"name": {"col": "TYPE", ...}, ...} JSON the
    * helper emits (keys/values are plain strings with no escapes beyond
    * what json.dumps produces for SQL identifiers).
    */
  private def parseTypes(json: String): Map[String, Map[String, String]] = {
    // The helper controls the format: json.dumps with indent=1, string
    // keys/values only. Parse with a tiny recursive-descent reader so
    // the test doesn't need a JSON library on the classpath.
    var i = 0
    def ws(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(json(i) == c, s"at $i: expected $c got ${json(i)}"); i += 1 }
    def str(): String = {
      ws(); require(json(i) == '"'); i += 1
      val sb = new StringBuilder
      while (json(i) != '"') {
        if (json(i) == '\\') { i += 1; json(i) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'u' => sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar; i += 4
          case c   => sb += c
        } } else sb += json(i)
        i += 1
      }
      i += 1
      sb.result()
    }
    def inner(): Map[String, String] = {
      expect('{'); ws()
      val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
      if (json(i) != '}') {
        var more = true
        while (more) {
          val k = str(); expect(':'); val v = str()
          m(k) = v
          ws()
          if (json(i) == ',') { i += 1 } else more = false
        }
      }
      expect('}')
      m.toMap
    }
    expect('{'); ws()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    if (json(i) != '}') {
      var more = true
      while (more) {
        val k = str(); expect(':'); val v = inner()
        out(k) = v
        ws()
        if (json(i) == ',') { i += 1 } else more = false
      }
    }
    out.toMap
  }
}
