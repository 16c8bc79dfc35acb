package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins BASELINE_BENCH.json's machine-readable provenance (r13 verdict
  * What's-wrong #3: the audit trail had accreted into a ~5k-char prose
  * blob): every frozen minimum carries a per-query
  * {frozen_at_round, method, note[, rebased_at_round, prior, loadavg1]}
  * record, so the next re-base is a one-record diff. This spec makes the
  * structure load-bearing — provenance that drifts from the minima, or a
  * baseline for a query that no longer exists, fails the build. */
class BaselineProvenanceSpec extends AnyFunSuite {

  private val root = new ObjectMapper().readTree(
    java.nio.file.Files.readString(java.nio.file.Paths.get("BASELINE_BENCH.json")))

  private def names(node: com.fasterxml.jackson.databind.JsonNode): Set[String] = {
    import scala.jdk.CollectionConverters._
    node.fieldNames().asScala.toSet
  }

  test("every frozen minimum has exactly one provenance record") {
    val qs = names(root.get("queries"))
    val pv = names(root.get("provenance"))
    assert((qs diff pv).isEmpty, s"minima without provenance: ${qs diff pv}")
    assert((pv diff qs).isEmpty, s"provenance without a minimum: ${pv diff qs}")
  }

  test("every baselined query is still registered") {
    val stale = names(root.get("queries")) diff SparkEntry.queries.keySet
    assert(stale.isEmpty, s"baselines for unregistered queries: $stale")
  }

  test("provenance records are well-formed") {
    import scala.jdk.CollectionConverters._
    val pv = root.get("provenance")
    pv.fieldNames().asScala.foreach { q =>
      val r = pv.get(q)
      val fr = r.get("frozen_at_round")
      assert(fr != null && fr.isInt && fr.asInt >= 5,
        s"$q: frozen_at_round must be an int >= 5 (the original freeze)")
      assert(r.get("method") != null && r.get("method").asText.nonEmpty,
        s"$q: method required")
      assert(r.get("note") != null && r.get("note").asText.nonEmpty,
        s"$q: note required")
      if (r.has("rebased_at_round")) {
        assert(r.get("prior") != null && r.get("prior").asDouble > 0,
          s"$q: a re-base must record the prior minimum it replaced")
        assert(r.get("rebased_at_round").asInt >= fr.asInt,
          s"$q: re-base round precedes the freeze round")
      }
    }
  }
}
