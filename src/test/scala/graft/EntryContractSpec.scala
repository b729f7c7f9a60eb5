package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing SparkEntry maps: every oracle key has a
  * query, and no key literal is duplicated inside either Map literal — Scala Map
  * literals silently keep the LAST binding, so a duplicated key would silently
  * swap an oracle (this exact footgun bit twice in round 1).
  */
class EntryContractSpec extends AnyFunSuite {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without a query: $missing")
  }

  test("no key literal bound more than once per map in SparkEntry source") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
    val keyRe = """"(q\w+)"\s*->""".r
    val counts = keyRe.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // each key may appear at most twice: once in queries, once in oracleSql
    val dups = counts.filter(_._2 > 2)
    assert(dups.isEmpty, s"key literals bound more than twice (duplicate Map binding): $dups")
  }
}
