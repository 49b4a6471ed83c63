package graft

/** Contract guards for the driver interface: every query analyzes against the
  * smallest corpus, and the queries↔oracle maps stay in sync. */
class EntryWiringSpec extends SparkSpec {

  // every query is oracle-checked as of round 5: bpe_merges replays the
  // 8-round merge trajectory in SQL (bracket-encoded replace = greedy fold)
  // and compression_quality derives its gate from staged engine ratios
  private val rowsOnly = Set.empty[String]

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query except the declared rows-only set has an oracle") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet).diff(rowsOnly)
    assert(missing.isEmpty, s"query without oracle: $missing")
  }

  test("every query plan analyzes against sf0.001 (no wiring/typo failures)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(80)}") }
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("entry() targets sf0.001 and is analyzable") {
    assert(SparkEntry.entry(spark).schema.fieldNames.contains("ngd"))
  }

  test("every query is documented in SURVEY.md §2 (the graded checklist)") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val undocumented = SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(undocumented.isEmpty, s"queries missing from SURVEY §2: $undocumented")
  }
}
