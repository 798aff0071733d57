package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed counts equal the batch equivalent") {
    val dir = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStream.windowedCounts(spark, dir, queryName = "ec_spec")
      .orderBy("win_start", "event_type")
    val batch = EventStream.windowedCountsBatch(spark, dir)
      .orderBy("win_start", "event_type")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
