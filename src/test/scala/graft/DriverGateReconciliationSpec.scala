package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reconcile COVERAGE.md against the DRIVER's correctness artifact —
  * VERDICT r11 #2/#4, executable.
  *
  * Round 11 sealed on the LOCAL gate's word ("229/229 green") while the
  * driver's artifact recorded 224/229; the authoritative record is
  * `CORRECTNESS_r{N}.json`, so the ledger must (a) cite the latest driver
  * artifact BY NAME with its true tally, and (b) flag every red query as
  * red wherever the round is summarized — a ledger claiming green over a
  * driver red is a build failure, not a judge finding.
  *
  * Pure file check — no SparkSession. The artifact's JSON is regex-walked
  * (flat `"qname": { flags }` objects) so the spec needs no JSON library.
  */
class DriverGateReconciliationSpec extends AnyFunSuite {

  /** (queryName -> fully green?) from a CORRECTNESS_r*.json body. */
  def parseArtifact(json: String): Map[String, Boolean] = {
    val entry = "\"(q[^\"]+)\"\\s*:\\s*\\{([^}]*)\\}".r
    entry.findAllMatchIn(json).map { m =>
      val flags = m.group(2)
      def flag(k: String) = s""""$k"\\s*:\\s*true""".r
        .findFirstIn(flags).isDefined
      val noErr = """"err"\s*:\s*null""".r.findFirstIn(flags).isDefined
      m.group(1) ->
        (flag("rows_match") && flag("schema_match") && flag("hash_match")
          && noErr)
    }.toMap
  }

  /** Violations of the reconciliation contract; empty = ledger faithful. */
  def reconcile(artifactName: String, perQuery: Map[String, Boolean],
                ledger: String): Seq[String] = {
    val green = perQuery.count(_._2)
    val cite = s"$artifactName: $green/${perQuery.size}"
    val missingCite =
      if (ledger.contains(cite)) Nil
      else Seq(s"ledger must cite the driver artifact verbatim: '$cite'")
    val unflaggedReds = perQuery.collect { case (q, false) => q }.toSeq.sorted
      .filter { q =>
        val prefix = q.takeWhile(_ != '_')
        // the query id (or its qNN prefix not extended by more digits)
        // must appear on a line that calls it red/failed
        !ledger.linesIterator.exists { l =>
          val lc = l.toLowerCase
          (lc.contains("red") || lc.contains("fail")) &&
            s"$prefix(?![0-9A-Za-z])".r.findFirstIn(l).isDefined
        }
      }
      .map(q => s"$q is red in $artifactName but the ledger does not flag it")
    missingCite ++ unflaggedReds
  }

  test("checker flags a planted green-claiming ledger over a driver red") {
    val artifact =
      """{"q01_x": {"rows_match": true, "schema_match": true,
        |          "hash_match": true, "err": null},
        | "q02_y": {"rows_match": true, "schema_match": true,
        |          "hash_match": false, "err": null}}""".stripMargin
    val perQuery = parseArtifact(artifact)
    assert(perQuery === Map("q01_x" -> true, "q02_y" -> false))
    // a ledger that claims all-green: both the tally cite and the red flag
    // are missing
    val lying = "closing state: 2/2 green, q01 and q02 both oracled"
    val v = reconcile("CORRECTNESS_r99.json", perQuery, lying)
    assert(v.size === 2, v)
    // a faithful ledger passes
    val faithful =
      """CORRECTNESS_r99.json: 1/2.
        |q02_y (red): hash mismatch under investigation""".stripMargin
    assert(reconcile("CORRECTNESS_r99.json", perQuery, faithful).isEmpty)
    // q2 flagged red does NOT cover q02 (prefix must match exactly),
    // and a red mention of a LONGER id does not cover a shorter one
    val wrongId = "CORRECTNESS_r99.json: 1/2.\nq02x_y is red"
    assert(reconcile("CORRECTNESS_r99.json", perQuery, wrongId).nonEmpty)
  }

  test("an errored query (err non-null) counts as red even if flags are absent") {
    val artifact = """{"q03_z": {"rows_match": false, "schema_match": false,
                     | "hash_match": false, "err": "boom"}}""".stripMargin
    assert(parseArtifact(artifact) === Map("q03_z" -> false))
  }

  test("COVERAGE.md reconciles with the latest driver artifact") {
    val root = java.nio.file.Paths.get(".")
    val artifacts = java.nio.file.Files.list(root).iterator().asScala
      .map(_.getFileName.toString)
      .flatMap { n =>
        "CORRECTNESS_r(\\d+)\\.json".r.findFirstMatchIn(n)
          .map(m => (m.group(1).toInt, n))
      }.toSeq
    assert(artifacts.nonEmpty, "no CORRECTNESS_r*.json artifact found")
    val (_, latest) = artifacts.maxBy(_._1)
    val perQuery = parseArtifact(new String(
      java.nio.file.Files.readAllBytes(root.resolve(latest)),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(perQuery.nonEmpty, s"$latest parsed to zero query entries")
    val ledger = new String(
      java.nio.file.Files.readAllBytes(root.resolve("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val v = reconcile(latest, perQuery, ledger)
    assert(v.isEmpty, v.mkString("\n"))
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
}
