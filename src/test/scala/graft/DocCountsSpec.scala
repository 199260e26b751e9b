package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's headline numbers must match the code: the query count
  * drifted twice during round 5 (hand-incremented against a stale
  * base), so it is pinned here instead.
  */
class DocCountsSpec extends AnyFunSuite {

  test("README query count equals SparkEntry.queries.size") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8
    )
    val m = """\((\d+) queries, all""".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states the query count")
    assert(m.get.group(1).toInt === SparkEntry.queries.size)
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
