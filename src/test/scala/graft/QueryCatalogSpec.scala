package graft

import org.scalatest.funsuite.AnyFunSuite

/** QUERIES.md is the user-facing catalog of the registered queries; this
  * spec pins it to `SparkEntry.queries` so the doc cannot drift from the
  * code (names listed but not registered, or registered but undocumented). */
class QueryCatalogSpec extends AnyFunSuite {

  test("QUERIES.md documents exactly the registered query names") {
    val doc = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("QUERIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // catalog rows lead with a backticked name: "| `name` | ..."
    val documented = "(?m)^\\| `([a-z0-9_]+)` \\|".r
      .findAllMatchIn(doc).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val undocumented = registered -- documented
    val stale = documented -- registered
    assert(undocumented.isEmpty,
      s"registered but missing from QUERIES.md: ${undocumented.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"in QUERIES.md but not registered: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every query with an oracle is registered, and the catalog count matches") {
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracle SQL without a registered query: ${orphanOracles.toSeq.sorted.mkString(", ")}")
  }
}
