package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Exact-byte contracts from /root/reference/tests/MofkaDataSelectionTest.cpp:42-176
 * (fixture reproduced in /root/repo/FIXTURES.md §2).
 */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  val payload: String = "abcdefghijklmnopqrstuvwxyz" + "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  private def select(view: DataView): String = {
    val df = Seq(payload.getBytes("UTF-8")).toDF("data")
    val out = df.select(view.toColumn(col("data")).as("sel"))
      .collect()(0).getAs[Array[Byte]]("sel")
    new String(out, "UTF-8")
  }

  test("null descriptor selects nothing") {
    assert(select(DataView.Empty) === "")
  }

  test("full descriptor selects all 52 bytes") {
    assert(select(DataView.Full) === payload)
  }

  test("makeSubView(13, 26)") {
    assert(select(DataView.Full.makeSubView(13, 26)) === "nopqrstuvwxyzABCDEFGHIJKLM")
  }

  test("makeStridedView(13, 3, 4, 2)") {
    assert(select(DataView.Full.makeStridedView(13, 3, 4, 2)) === "nopqtuvwzABC")
  }

  test("makeUnstructuredView({(3,6),(15,4),(27,8)})") {
    assert(select(DataView.Full.makeUnstructuredView(Seq((3L, 6L), (15L, 4L), (27L, 8L))))
      === "defghipqrsBCDEFGHI")
  }

  test("views compose: sub of strided addresses selected bytes") {
    // strided selects "nopqtuvwzABC" (12 bytes); sub(4, 5) of that = "tuvwz"
    val v = DataView.Full.makeStridedView(13, 3, 4, 2).makeSubView(4, 5)
    assert(select(v) === "tuvwz")
  }

  test("flatten merges contiguous segments") {
    val v = DataView.Full.makeUnstructuredView(Seq((0L, 5L), (5L, 5L), (12L, 3L)))
    assert(v.flatten === Some(Seq((0L, 10L), (12L, 3L))))
  }

  test("out-of-bounds nested view fails") {
    val v = DataView.Full.makeSubView(0, 10).makeSubView(5, 6)
    intercept[IllegalArgumentException](v.flatten)
  }

  test("strided view on string column") {
    val df = Seq(payload).toDF("data")
    val got = df.select(DataView.Full.makeStridedView(13, 3, 4, 2).toColumn(col("data")))
      .as[String].collect()(0)
    assert(got === "nopqtuvwzABC")
  }

  test("size is statically known for explicit views") {
    assert(DataView.Full.makeSubView(13, 26).selectedSize === Some(26L))
    assert(DataView.Full.makeStridedView(13, 3, 4, 2).selectedSize === Some(12L))
    assert(DataView.Empty.selectedSize === Some(0L))
    assert(DataView.Full.selectedSize === None)
  }
}
