package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.schema.Codecs

/** §1.2 codec compatibility + typed Dataset round-trip through the store. */
class CodecsSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  test("YearDay codec: yyyy_d round-trip, matches reference format") {
    val df = Seq("2011-01-01", "2011-06-05", "2012-12-31", "2016-02-29")
      .map(Date.valueOf).toDF("d")
    val enc = df.select(col("d"), Codecs.yearday_encode(col("d")).as("s"))
    val strs = enc.collect().map(_.getString(1))
    assert(strs(0) == "2011_1")    // not zero-padded (reference "yyyy_d")
    assert(strs(1) == "2011_156")
    assert(strs(3) == "2016_60")   // leap year
    val back = enc.select(col("d"), Codecs.yearday_decode(col("s")).as("d2"))
      .where(col("d") =!= col("d2"))
    assert(back.count() == 0)
  }

  test("CommaSet codec: set semantics, empty handling") {
    val df = Seq(
      (Seq("b", "a", "b"), "a,b"),
      (Seq("x"), "x"),
      (Seq.empty[String], "")).toDF("arr", "want")
    df.select(Codecs.commaset_encode(col("arr")).as("got"), col("want")).collect()
      .foreach(r => assert(r.getString(0) == r.getString(1)))
    val decoded = df.select(Codecs.commaset_decode(Codecs.commaset_encode(col("arr"))).as("back"),
      col("arr")).collect()
    decoded.foreach(r =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet))
  }

  test("typed Dataset round-trip through the keyed store (Kitten analogue)") {
    // the reference's custom complex type (ExampleSchema.scala:36) is just a
    // case class + Encoder here — no hand-written codecs
    val dir = java.nio.file.Files.createTempDirectory("graft_kit").resolve("t").toString
    val kittens = Seq(
      KittenRow("r1", Kitten("tommy", 3, 15.0)),
      KittenRow("r2", Kitten("juno", 1, 8.5)))
    val ds = kittens.toDS()
    graft.store.KeyedStore.write(ds.toDF(), dir)
    val back = graft.store.KeyedStore.read(spark, dir).as[KittenRow]
      .collect().sortBy(_.key)
    assert(back.toSeq == kittens)
    assert(back.head.kitten.height == 15.0) // compile-time typed field access
  }
}

case class Kitten(name: String, age: Int, height: Double)
case class KittenRow(key: String, kitten: Kitten)
