package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's DataDescriptor "view algebra" (sub / strided / unstructured
 * byte views over a stored payload, arbitrarily nested), re-expressed as
 * Catalyst byte-slice expressions over a `BinaryType` (or `StringType`)
 * column.
 *
 * Reference semantics (exercised in
 * `/root/reference/tests/MofkaDataSelectionTest.cpp:42-176`, consumed by the
 * stores at `/root/reference/src/DefaultPartitionManager.cpp:536-551`):
 *  - `makeSubView(offset, size)`: contiguous byte range
 *  - `makeStridedView(offset, numblocks, blocksize, gap)`: `numblocks` blocks
 *    of `blocksize` bytes starting at `offset`, separated by `gap` bytes
 *  - `makeUnstructuredView([(offset, size)...])`: arbitrary scatter/gather
 *  - views compose: a view built on a view addresses the *selected* bytes of
 *    its base; `flatten()` normalizes to disjoint segments of the root data
 *  - the null descriptor selects nothing
 *
 * `flatten` happens at compile time here, so the emitted plan is just
 * `concat(substring(data, o1, s1), substring(data, o2, s2), ...)` — fully
 * codegen'd, no UDF, and (crucially for the 100 TB case) evaluated only on
 * rows that survive pushed-down metadata predicates, after Parquet column
 * pruning has decided whether the payload column is read at all.
 */
sealed trait DataView {

  /** Normalize to (offset, size) segments of the root payload; None = whole payload. */
  def flatten: Option[Seq[(Long, Long)]] = this match {
    case DataView.Full      => None
    case DataView.Empty     => Some(Nil)
    case DataView.Sub(base, off, size) =>
      remap(base.flatten, Seq((off, size)))
    case DataView.Strided(base, off, n, bs, gap) =>
      // One (offset,size) pair — and later one substring expression — is
      // materialized per block; bound it before building an enormous Seq.
      require(n >= 0 && n <= DataView.MaxSegments,
        s"strided view with $n blocks exceeds the ${DataView.MaxSegments} segment bound")
      require(off >= 0 && bs >= 0 && gap >= 0,
        s"strided view parameters must be non-negative: ($off, $n, $bs, $gap)")
      val segs = (0L until n).map(i => (off + i * (bs + gap), bs))
      remap(base.flatten, segs)
    case DataView.Unstructured(base, segs) =>
      remap(base.flatten, segs)
  }

  /** Map `segs` (relative to the base view's selected bytes) onto root coords. */
  private def remap(baseSegs: Option[Seq[(Long, Long)]],
                    segs: Seq[(Long, Long)]): Option[Seq[(Long, Long)]] =
    baseSegs match {
      case None       => Some(DataView.mergeContiguous(segs))
      case Some(base) => Some(DataView.mergeContiguous(segs.flatMap { case (o, s) =>
        DataView.sliceSegments(base, o, s)
      }))
    }

  /** Total selected size, if statically known (Full is data-dependent). */
  def selectedSize: Option[Long] = flatten.map(_.map(_._2).sum)

  /** Compile against a BinaryType/StringType column. */
  def toColumn(data: Column): Column = flatten match {
    case None       => data
    case Some(Nil)  => lit(Array.empty[Byte])
    case Some(segs) =>
      val slices = segs.map { case (off, sz) =>
        require(off >= 0 && sz >= 0 && off + sz <= Int.MaxValue,
          s"view segment ($off,$sz) exceeds the 2 GiB per-cell binary limit")
        substring(data, off.toInt + 1, sz.toInt)
      }
      if (slices.size == 1) slices.head else concat(slices: _*)
  }

  // fluent constructors mirroring the reference API
  def makeSubView(offset: Long, size: Long): DataView =
    DataView.Sub(this, offset, size)
  def makeStridedView(offset: Long, numBlocks: Long, blockSize: Long, gap: Long): DataView =
    DataView.Strided(this, offset, numBlocks, blockSize, gap)
  def makeUnstructuredView(segments: Seq[(Long, Long)]): DataView =
    DataView.Unstructured(this, segments)
}

/**
 * A per-event view: what a reference DataSelector *returns* for one event
 * (`/root/reference/src/MofkaConsumer.cpp:240-259` — an arbitrary function
 * `(metadata, descriptor) → descriptor`). Either a static [[DataView]]
 * (offsets fixed at plan time — the common, fully mergeable case) or a view
 * whose offsets are themselves expressions over the event's metadata, which
 * the reference's arbitrary-lambda selector permits and no static view can
 * express.
 */
sealed trait EventView {
  /** Compile against the (metadata, data) columns of one event. */
  def toColumn(metadata: Column, data: Column): Column
  /** True iff this view provably selects no bytes for every event. */
  def isStaticallyEmpty: Boolean
}

object EventView {
  /** A plan-time-constant view (the usual case — stays fully mergeable). */
  final case class Static(view: DataView) extends EventView {
    override def toColumn(metadata: Column, data: Column): Column =
      view.flatten match {
        case Some(Nil) => lit(Array.empty[Byte])
        case _ => view.toColumn(data)
      }
    override def isStaticallyEmpty: Boolean = view.flatten.contains(Nil)
  }

  /** `makeSubView(offset, size)` where offset/size are computed FROM the
    * event's metadata (e.g. `get_json_object(m, "$.off")`). Compiles to a
    * per-row `substr` — still codegen'd, still column-pruning friendly. */
  final case class DynamicSub(
      offset: Column => Column, size: Column => Column) extends EventView {
    override def toColumn(metadata: Column, data: Column): Column =
      data.substr(offset(metadata).cast("int") + lit(1), size(metadata).cast("int"))
    override def isStaticallyEmpty: Boolean = false
  }

  /** Scatter/gather with metadata-driven segments. Each (offset, size) pair
    * is a pair of expressions over the metadata column. */
  final case class DynamicUnstructured(
      segments: Seq[(Column => Column, Column => Column)]) extends EventView {
    require(segments.nonEmpty, "dynamic unstructured view needs >= 1 segment")
    override def toColumn(metadata: Column, data: Column): Column = {
      val slices = segments.map { case (off, sz) =>
        data.substr(off(metadata).cast("int") + lit(1), sz(metadata).cast("int"))
      }
      if (slices.size == 1) slices.head else concat(slices: _*)
    }
    override def isStaticallyEmpty: Boolean = false
  }

  /** Lets call sites pass a plain [[DataView]] wherever an EventView is
    * expected (ordered selector cases, defaults). */
  implicit def fromDataView(view: DataView): EventView = Static(view)
}

object DataView {
  /** The whole stored payload (a freshly received DataDescriptor). */
  case object Full extends DataView
  /** The null descriptor: selects no bytes. */
  case object Empty extends DataView
  final case class Sub(base: DataView, offset: Long, size: Long) extends DataView
  final case class Strided(base: DataView, offset: Long, numBlocks: Long,
                           blockSize: Long, gap: Long) extends DataView
  final case class Unstructured(base: DataView, segments: Seq[(Long, Long)]) extends DataView

  /** Cap on materialized segments per view — each becomes a `substring` in
    * the compiled expression, so an unbounded count would blow up the plan. */
  val MaxSegments: Long = 65536L

  /** Take bytes [off, off+size) of the concatenation of `base` segments. */
  private[functions] def sliceSegments(base: Seq[(Long, Long)], off: Long,
                                       size: Long): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var logical = 0L   // offset within the concatenated base selection
    var want = size
    var start = off
    base.foreach { case (bOff, bSz) =>
      if (want > 0) {
        val segStart = logical
        val segEnd = logical + bSz
        if (start < segEnd && segStart < start + want) {
          val from = math.max(start, segStart)
          val until = math.min(segEnd, start + want)
          out += ((bOff + (from - segStart), until - from))
          want -= (until - from)
          start = until
        }
        logical = segEnd
      }
    }
    require(want == 0,
      s"view ($off,$size) out of bounds of base selection of ${base.map(_._2).sum} bytes")
    out.result()
  }

  /** Merge adjacent contiguous segments (keeps the emitted expression small). */
  private[functions] def mergeContiguous(segs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    segs.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((po, ps)), (o, s)) if po + ps == o => acc :+ ((po, ps + s))
      case (acc, seg)                                  => acc :+ seg
    }
}
