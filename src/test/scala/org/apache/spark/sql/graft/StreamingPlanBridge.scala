/*
 * Test-only bridge: the executed plan of a streaming query's last
 * micro-batch lives behind sql-private wrappers
 * (StreamingQueryWrapper -> StreamExecution.lastExecution). Specs use it
 * to pin plan-level properties (column pruning, partition counts) that
 * the public streaming API does not expose.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.streaming.StreamingQuery

object StreamingPlanBridge {
  /** The physical plan string of `q`'s most recent micro-batch. */
  def lastExecutedPlan(q: StreamingQuery): String = q match {
    case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution)
        .map(_.executedPlan.toString).getOrElse("")
    case other =>
      throw new IllegalArgumentException(
        s"not a wrapped streaming query: ${other.getClass}")
  }
}
