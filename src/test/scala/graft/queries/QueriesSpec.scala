package graft.queries

import graft.SparkSpec

/** Cross-cutting invariants of the registered driver-contract queries. */
class QueriesSpec extends SparkSpec {

  test("every query has a matching oracle — no rows-only queries remain") {
    // the former rows-only pair (sketch_profile, sketch_incremental) now
    // gates its sketches' theorems as deterministic booleans, so every
    // registered query carries a full DuckDB hash oracle
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert(qs == os, s"queries without oracles: ${qs -- os}")
  }

  test("sessionize invariants at the smoke SF: events partitioned, gaps respected") {
    val sfDir = "/root/testdata/sf0.001"
    val out = CdcQueries.queries("events_sessionize")(spark, sfDir)
    val sessions = out.collect()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    // every event is in exactly one session
    assert(sessions.map(_.getLong(2)).sum == ev.count())
    // sessions of one user don't overlap in time and are gap-separated
    val byUser = sessions.groupBy(_.getLong(0))
    byUser.values.foreach { ss =>
      val ordered = ss.sortBy(_.getLong(3)) // start_ms
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) < b.getLong(3), "sessions overlap")
          assert(b.getLong(3) - a.getLong(4) > 30 * 60 * 1000,
            "gap between sessions must exceed the threshold")
        case _ => ()
      }
    }
  }
}
