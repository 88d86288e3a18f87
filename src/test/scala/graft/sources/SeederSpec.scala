package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class SeederSpec extends SparkSpec {
  import spark.implicits._

  test("csv read: header + schema inference") {
    val dir = Files.createTempDirectory("csv")
    Files.writeString(Paths.get(dir.toString, "data.csv"),
      "id,name,bal\n1,ada,10.5\n2,bob,20.0\n")
    val df = Seeder.readCsv(spark, dir.toString)
    assert(df.columns.toSeq == Seq("id", "name", "bal"))
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.count() == 2)
  }

  test("shuffle is deterministic for a fixed seed and preserves rows") {
    val df = (1 to 20).map(i => (i, s"r$i")).toDF("id", "v")
    val a = Seeder.shuffled(df, seed = 7).select("id").as[Int].collect().toSeq
    val b = Seeder.shuffled(df, seed = 7).select("id").as[Int].collect().toSeq
    assert(a == b)
    assert(a.sorted == (1 to 20))
    assert(a != (1 to 20)) // actually shuffled
  }

  test("batch ids slice rows into stable batch-sized groups") {
    val df = (1 to 10).map(i => (i, s"r$i")).toDF("id", "v")
    val batched = Seeder.withBatchId(df, batchSize = 4, orderCol = "id")
    val sizes = batched.groupBy("_batch_id").count()
      .orderBy("_batch_id").select("count").as[Long].collect().toSeq
    assert(sizes == Seq(4L, 4L, 2L)) // full batches except the tail
  }

  test("batch sizing holds under duplicate order-column values") {
    val df = (1 to 12).map(i => (i % 3, s"r$i")).toDF("k", "v") // 3 distinct keys
    val sizes = Seeder.withBatchId(df, batchSize = 5, orderCol = "k")
      .groupBy("_batch_id").count()
      .orderBy("_batch_id").select("count").as[Long].collect().toSeq
    assert(sizes == Seq(5L, 5L, 2L)) // row_number, not dense_rank
  }
}
