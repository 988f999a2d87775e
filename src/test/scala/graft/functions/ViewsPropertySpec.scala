package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property check (SURVEY §5): for ANY nested view tree, the compiled
 * byte-slice expression equals a direct Scala evaluation of the view
 * semantics over the same payload — flatten normalization is semantics-
 * preserving by construction, not just on the reference fixtures.
 * (Deterministic seeds; plain ScalaCheck generators — the scalatest bridge
 * artifact is not in the offline cache.)
 */
class ViewsPropertySpec extends SparkSpec {

  private val payload: String =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString // 62 bytes

  /** Reference evaluator: apply the view layer-by-layer on a byte string. */
  private def evalView(v: DataView, data: String): Option[String] = v match {
    case DataView.Full => Some(data)
    case DataView.Empty => Some("")
    case DataView.Sub(base, off, size) =>
      evalView(base, data).flatMap { s =>
        if (off + size <= s.length) Some(s.substring(off.toInt, (off + size).toInt))
        else None // out of bounds of the base selection
      }
    case DataView.Strided(base, off, n, bs, gap) =>
      evalView(base, data).flatMap { s =>
        val segs = (0L until n).map(i => (off + i * (bs + gap), bs))
        if (segs.forall { case (o, sz) => o + sz <= s.length })
          Some(segs.map { case (o, sz) => s.substring(o.toInt, (o + sz).toInt) }.mkString)
        else None
      }
    case DataView.Unstructured(base, segs) =>
      evalView(base, data).flatMap { s =>
        if (segs.forall { case (o, sz) => o + sz <= s.length })
          Some(segs.map { case (o, sz) => s.substring(o.toInt, (o + sz).toInt) }.mkString)
        else None
      }
  }

  private val genLayer: Gen[DataView => DataView] = Gen.oneOf(
    for { off <- Gen.choose(0L, 20L); size <- Gen.choose(0L, 20L) }
      yield (b: DataView) => b.makeSubView(off, size),
    for {
      off <- Gen.choose(0L, 10L); n <- Gen.choose(1L, 4L)
      bs <- Gen.choose(1L, 5L); gap <- Gen.choose(0L, 4L)
    } yield (b: DataView) => b.makeStridedView(off, n, bs, gap),
    for {
      nSegs <- Gen.choose(1, 3)
      segs <- Gen.listOfN(nSegs, for {
        o <- Gen.choose(0L, 15L); sz <- Gen.choose(0L, 8L)
      } yield (o, sz))
    } yield (b: DataView) => b.makeUnstructuredView(segs))

  private val genView: Gen[DataView] = for {
    depth <- Gen.choose(0, 3)
    layers <- Gen.listOfN(depth, genLayer)
  } yield layers.foldLeft(DataView.Full: DataView)((v, f) => f(v))

  test("compiled view == direct evaluation, for random nested views") {
    import spark.implicits._
    val views = (0 until 150).flatMap { i =>
      genView.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(views.size >= 120, "generator should rarely fail")
    // evaluate compiled slices in one Spark pass for the in-bounds views
    val evaluable = views.zipWithIndex.flatMap { case (v, i) =>
      evalView(v, payload).map(exp => (i, v, exp))
    }
    val compiled = Seq(payload).toDF("data")
      .select(evaluable.map { case (i, v, _) => v.toColumn($"data").as(s"v$i") }: _*)
      .collect()(0)
    evaluable.zipWithIndex.foreach { case ((_, v, expected), k) =>
      assert(compiled.getString(k) == expected, s"view=$v")
      v.selectedSize.foreach(sz => assert(sz == expected.length, s"size of $v"))
    }
    // out-of-bounds views must be rejected at flatten/compile time
    views.filter(v => evalView(v, payload).isEmpty).foreach { v =>
      intercept[IllegalArgumentException] { v.flatten }
    }
  }
}
