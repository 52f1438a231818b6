package graft

/** Regenerates OPERATORS.md from the live catalog, so the human-facing
  * operator index can never drift from `SparkEntry.ops` (run per round:
  * `sbt "runMain graft.CatalogDump"`). */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("OPERATORS.md")
    val ops = SparkEntry.ops.sortBy(_.name)
    val (oracle, rowsOnly) = ops.partition(_.oracle.isDefined)
    val sb = new StringBuilder
    sb ++= "# OPERATORS — the declared query catalog\n\n"
    sb ++= "Generated from `SparkEntry.ops` by `graft.CatalogDump`; do not edit.\n"
    sb ++= s"${ops.size} queries: ${oracle.size} DuckDB-oracle-checked " +
      s"(hash-exact at sf0.001/sf0.01/sf0.1), ${rowsOnly.size} rows-only + " +
      "spec-gated (engine-specific hashing/sketches).\n\n"
    sb ++= "| query | check | what it does |\n|---|---|---|\n"
    ops.foreach { op =>
      val check = if (op.oracle.isDefined) "oracle" else "rows+spec"
      sb ++= s"| ${op.name} | $check | ${op.doc} |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[catalog] wrote ${ops.size} ops to $out")
  }
}
