package graft.scale

import graft.SparkTestBase
import graft.gen.{InputGen, InputTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HostStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("salted two-phase host stats ≡ plain aggregate; hot host is visible") {
    val input = InputTable.generate(spark, 400L, seed = 5L).cache()
    val a = HostStats.salted(input).orderBy("host").collect()
    val b = HostStats.plain(input).orderBy("host").collect()
    assert(a.toSeq == b.toSeq)
    val hot = a.find(_.getAs[String]("host") == s"${InputGen.HotHost}.example")
    assert(hot.isDefined)
    val hotShare = hot.get.getAs[Long]("n_docs").toDouble / 400
    assert(hotShare > 0.2 && hotShare < 0.4, s"hot-host share $hotShare")
  }
}
