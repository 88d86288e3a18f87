package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import java.nio.file.Files

/** S7/K7 against embedded Derby — the same Spark JDBC relation a server
  * database uses, with the engine running in-process (no external service).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl() = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("K7 write then S7 read round-trips rows and schema") {
    val url = derbyUrl()
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", -1.0))
      .toDF("id", "name", "bal")
    Jdbc.write(df, url, "t_round", mode = "overwrite", batchSize = 2)
    val back = Jdbc.read(spark, url, "t_round")
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("bal", "id", "name"))
    assert(back.select("id", "name", "bal").collect().toSet ==
      Set(Row(1L, "a", 10.5), Row(2L, "b", 20.25), Row(3L, "c", -1.0)))
  }

  test("append mode accumulates; overwrite replaces") {
    val url = derbyUrl()
    val df = Seq((1L, "x")).toDF("id", "v")
    Jdbc.write(df, url, "t_mode", mode = "overwrite")
    Jdbc.write(Seq((2L, "y")).toDF("id", "v"), url, "t_mode", mode = "append")
    assert(Jdbc.read(spark, url, "t_mode").count() == 2)
    Jdbc.write(Seq((9L, "z")).toDF("id", "v"), url, "t_mode", mode = "overwrite")
    assert(Jdbc.read(spark, url, "t_mode").select("id").as[Long].collect().toSeq
      == Seq(9L))
  }

  test("S7 partitioned read splits the scan into parallel range stripes") {
    val url = derbyUrl()
    val df = spark.range(100).selectExpr("id", "id * 2 AS v")
    Jdbc.write(df, url, "t_part", mode = "overwrite")
    val back = Jdbc.readPartitioned(spark, url, "t_part",
      partitionColumn = "id", lowerBound = 0, upperBound = 100, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.selectExpr("sum(v)").as[Long].head() == 9900L)
  }

  test("maxConnections caps writer parallelism") {
    val url = derbyUrl()
    val df = spark.range(64).repartition(16).selectExpr("id")
    // 16 partitions but at most 2 connections; content must be intact
    Jdbc.write(df, url, "t_cap", mode = "overwrite", maxConnections = Some(2))
    assert(Jdbc.read(spark, url, "t_cap").count() == 64)
  }
}
