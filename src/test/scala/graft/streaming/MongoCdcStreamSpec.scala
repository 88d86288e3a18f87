package graft.streaming

import graft.SparkSpec
import graft.cdc._
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class MongoCdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def event(op: String, id: String, extra: String, ts: Long): String = {
    val d = s"""{\\"_id\\": {\\"$$oid\\": \\"$id\\"}$extra}"""
    val after = if (op == "d") "null" else s""""$d""""
    val before = if (op == "d") s""""$d"""" else "null"
    s"""{"payload":{"before":$before,"after":$after,"source":{"connector":"mongodb"},"op":"$op","ts_ms":$ts}}"""
  }

  private def tmp() = Files.createTempDirectory("mstream").toString

  test("mongo memory-stream end to end with schema conformance across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val store = new SnapshotStore(tmp(), spark)
    val stream = new MongoCdcStream(spark, ms.toDF(), store, "_id",
      checkpointDir = tmp(), trigger = Trigger.ProcessingTime(0))
    val q = stream.start()
    try {
      ms.addData(
        event("c", "a1", """, \"name\": \"ada\"""", 100),
        event("c", "b2", """, \"name\": \"bob\"""", 100))
      q.processAllAvailable()
      assert(store.read().get.columns.toSeq == Seq("_id", "name", "last_ts"))

      ms.addData(
        event("u", "a1", """, \"name\": \"ada2\", \"new_col\": \"added\"""", 200),
        event("d", "b2", """, \"name\": \"bob\"""", 200))
      q.processAllAvailable()
      // default mode evolves additively: the drifted field appends
      val rows = store.read().get.select("_id", "name", "new_col").collect().toSet
      assert(rows == Set(Row("a1", "ada2", "added")))
    } finally stream.stopGracefully(q)
  }
}
