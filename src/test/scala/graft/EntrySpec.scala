package graft

/** Driver-contract smoke: every SparkEntry query runs at sf0.001 and
  * produces a sane (non-erroring) result; entry returns rows.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
