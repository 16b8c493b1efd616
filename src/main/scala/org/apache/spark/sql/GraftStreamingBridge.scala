package org.apache.spark.sql

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQuery

/** Bridge into the classic streaming internals: a drained query's last
  * micro-batch QueryExecution (IncrementalExecution), so the plan-lint
  * gate can audit STREAMING physical plans too — micro-batch executions
  * never flow through QueryExecutionListener, which is why the
  * executed-plan capture alone can't see them. Same pattern as
  * GraftColumnBridge. */
object GraftStreamingBridge {
  def lastExecution(q: StreamingQuery): Option[QueryExecution] = q match {
    case w: execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution)
    case _ => None
  }
}
