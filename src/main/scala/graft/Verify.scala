package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional: verify a subset while iterating
    val spark = GraftSession.builder("graft-verify", cores = "4")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Fixture-path substitution (r14 ADVICE): the registry oracle SQL
    // interpolates the sf0.01 fixture dir (the driver's verify SF) as a
    // static default, but THIS run wrote its fixtures under
    // fixtureDir(sfDir) — rewrite the emitted SQL to the actual dir so a
    // verify at any SF hands DuckDB the fixture this run produced, never
    // a missing path or a stale prior run's file. Both strings come from
    // the same in-process fixtureDir (same runId), so the token matches
    // the interpolation exactly; at sfDir == sf0.01 this is the identity.
    val fixtureToken = graft.entry.EntryKit.fixtureDir("/root/testdata/sf0.01")
    val fixtureActual = graft.entry.EntryKit.fixtureDir(sfDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(fixtureToken, fixtureActual))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
