package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score desc, id asc): a binary
  * min-heap keyed by "goodness" whose root is the weakest kept entry.
  * Holds at most k (score, id) pairs regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a-better-than-b under (score desc, id asc). */
  @inline private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      // min-heap on goodness: child must not be WORSE than parent
      if (better(scores(parent), ids(parent), scores(pos), ids(pos))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var worst = pos
      if (l < size && better(scores(worst), ids(worst), scores(l), ids(l))) worst = l
      if (r < size && better(scores(worst), ids(worst), scores(r), ids(r))) worst = r
      if (worst == pos) return
      swap(pos, worst); pos = worst
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (better(score, id, scores(0), ids(0))) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** [[add]] that treats `id` as a key: a duplicate id never occupies a
    * second slot (it would evict a genuine k-th entry), it only upgrades
    * the kept score. Linear membership scan — k is a small constant
    * (neighbor-list / beam widths), so this stays cheaper than the
    * extra dedupe shuffle it replaces. */
  def addDistinct(score: Double, id: Long): Unit = {
    var j = 0
    while (j < size) {
      if (ids(j) == id) {
        if (score > scores(j)) {
          scores(j) = score
          // goodness increased: the element may now beat its children
          // in the min-heap-on-goodness, so restore downward
          siftDown(j)
        }
        return
      }
      j += 1
    }
    add(score, id)
  }

  /** Entries sorted best-first. */
  def sorted: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    arr.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }
}

/** topk_by(score, id, k): bounded-heap top-k aggregate. Because it is a
  * TypedImperativeAggregate, Spark runs it with *partial aggregation*:
  * each map task reduces its partition to ≤k entries per group before
  * the shuffle, so a grouped top-k moves k·partitions rows per group
  * instead of the whole scored set — the property the two-phase window
  * prune only approximates with an extra shuffle+sort.
  *
  * Deterministic: ordering is (score desc, id asc). Ref: the bounded
  * heap in experiments/auto_run_tests.py:126-140 (offline_search),
  * distributed.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(score, id)
  // declared input types let the analyzer insert casts (or raise an
  // analysis error) instead of a ClassCastException on the executor
  // when the SQL form graft_topk_by is called with e.g. a string score
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(DoubleType, LongType)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      if (distinct) buf.addDistinct(s.asInstanceOf[Double], i.asInstanceOf[Long])
      else buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      if (distinct) buf.addDistinct(other.scores(i), other.ids(i))
      else buf.add(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Per-group state for [[FrontierTopK]]: the id→score map of every
  * UNEXPANDED visited node plus the set of already-expanded ids. The
  * map mirrors [[TopKBuffer.addDistinct]]'s keep-first-unless-strictly-
  * better rule (revisits rescore identically, so this is a dedupe, not
  * a choice); an expansion marker removes its id for good — a later
  * re-discovery of an expanded node must NOT re-enter the frontier
  * (ef-search's pop-at-most-once), regardless of the order rows reach
  * the aggregate. Size is the per-group distinct visited set — exactly
  * the rows the anti-join formulation shuffled anyway. */
final class FrontierBuffer {
  import scala.collection.mutable
  val cand = mutable.LongMap.empty[Double]
  val expanded = mutable.LongMap.empty[Unit]

  def visit(id: Long, score: Double): Unit =
    if (!expanded.contains(id) &&
        (!cand.contains(id) || score > cand(id)))
      cand.update(id, score)

  def expand(id: Long): Unit = {
    expanded.update(id, ())
    cand.subtractOne(id)
  }
}

/** frontier_topk(score, id, x, k): the beam-search frontier in ONE
  * aggregation — the k best visited-but-not-yet-expanded nodes per
  * group, fed directly by the walk's tagged state frame (visited rows
  * x=false carry scores, expansion markers x=true carry null). Replaces
  * the anti-join formulation
  * `visited.join(markers, Seq(q_id,id), "left_anti").groupBy(q_id).agg(topKByDistinct)`
  * — which shuffled BOTH state splits on (q_id,id) and then shuffled
  * the survivors again on q_id — with one partial-aggregated pass over
  * the state (no pre-join, one exchange). Output type and ordering are
  * identical to [[TopKAgg.topKByDistinct]] over the anti-joined pool
  * (asserted bit-equal in KnnGraphSpec).
  */
case class FrontierTopK(
    score: Expression,
    id: Expression,
    x: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FrontierBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(score, id, x)
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(DoubleType, LongType, BooleanType)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): FrontierBuffer = new FrontierBuffer

  override def update(buf: FrontierBuffer, input: InternalRow): FrontierBuffer = {
    val xi = x.eval(input)
    val ii = id.eval(input)
    if (xi != null && ii != null) {
      if (xi.asInstanceOf[Boolean]) buf.expand(ii.asInstanceOf[Long])
      else {
        val s = score.eval(input)
        if (s != null) buf.visit(ii.asInstanceOf[Long], s.asInstanceOf[Double])
      }
    }
    buf
  }

  override def merge(buf: FrontierBuffer, other: FrontierBuffer): FrontierBuffer = {
    other.expanded.foreachKey(buf.expand)
    other.cand.foreachEntry((i, s) => buf.visit(i, s))
    buf
  }

  override def eval(buf: FrontierBuffer): Any = {
    val heap = new TopKBuffer(k)
    buf.cand.foreachEntry((i, s) => heap.add(s, i))
    new GenericArrayData(heap.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: FrontierBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.expanded.size)
    buf.expanded.foreachKey(out.writeLong)
    out.writeInt(buf.cand.size)
    buf.cand.foreachEntry { (i, s) => out.writeLong(i); out.writeDouble(s) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FrontierBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FrontierBuffer
    var n = in.readInt()
    while (n > 0) { buf.expand(in.readLong()); n -= 1 }
    n = in.readInt()
    while (n > 0) { buf.visit(in.readLong(), in.readDouble()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrontierTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrontierTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FrontierTopK =
    copy(score = newChildren(0), id = newChildren(1), x = newChildren(2))
}

/** Per-group state for [[PoolTopK]] — [[FrontierBuffer]] with scores
  * retained on the expanded side: the incremental-pool walk keeps the
  * expanded set in the RESULT pool (expanded nodes stay final-top-k
  * candidates), so expansion rows carry their scores instead of null
  * markers. Same order-independence: expand wins over visit for the
  * same id regardless of arrival order, and a (q, id) score is
  * deterministic so duplicate visits/expands agree. */
final class PoolBuffer {
  import scala.collection.mutable
  val cand = mutable.LongMap.empty[Double]
  val expScore = mutable.LongMap.empty[Double]

  def visit(id: Long, score: Double): Unit =
    if (!expScore.contains(id) &&
        (!cand.contains(id) || score > cand(id)))
      cand.update(id, score)

  def expand(id: Long, score: Double): Unit = {
    if (!expScore.contains(id)) expScore.update(id, score)
    cand.subtractOne(id)
  }
}

/** pool_topk(score, id, x, c): ONE aggregation emitting the walk's
  * whole bounded per-query state — struct(exp, pool) where `exp` is
  * every expanded (score, id) sorted best-first and `pool` is the c
  * best UNEXPANDED visited, same (score desc, id asc) order as
  * [[FrontierTopK]]. The incremental-pool walk
  * ([[graft.operators.KnnGraph.graphSearch]]) slices its next frontier
  * from `pool`'s sorted prefix instead of re-aggregating a cumulative
  * state frame, so per-hop aggregation input and checkpoint volume are
  * O(pool + scored) rather than O(all rows ever visited). */
case class PoolTopK(
    score: Expression,
    id: Expression,
    x: Expression,
    c: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PoolBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(score, id, x)
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(DoubleType, LongType, BooleanType)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (c < 1) TypeCheckResult.TypeCheckFailure(s"c must be >= 1, got $c")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  private val entry = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def dataType: DataType = StructType(Seq(
    StructField("exp", entry), StructField("pool", entry)))

  override def createAggregationBuffer(): PoolBuffer = new PoolBuffer

  override def update(buf: PoolBuffer, input: InternalRow): PoolBuffer = {
    val xi = x.eval(input)
    val ii = id.eval(input)
    val s = score.eval(input)
    if (xi != null && ii != null && s != null) {
      if (xi.asInstanceOf[Boolean])
        buf.expand(ii.asInstanceOf[Long], s.asInstanceOf[Double])
      else buf.visit(ii.asInstanceOf[Long], s.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: PoolBuffer, other: PoolBuffer): PoolBuffer = {
    other.expScore.foreachEntry((i, s) => buf.expand(i, s))
    other.cand.foreachEntry((i, s) => buf.visit(i, s))
    buf
  }

  override def eval(buf: PoolBuffer): Any = {
    val heap = new TopKBuffer(c)
    buf.cand.foreachEntry((i, s) => heap.add(s, i))
    val pool = new GenericArrayData(heap.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
    val expArr = new Array[(Double, Long)](buf.expScore.size)
    var n = 0
    buf.expScore.foreachEntry { (i, s) => expArr(n) = (s, i); n += 1 }
    val expSorted = expArr.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    val exp = new GenericArrayData(expSorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
    InternalRow(exp, pool)
  }

  override def serialize(buf: PoolBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.expScore.size)
    buf.expScore.foreachEntry { (i, s) => out.writeLong(i); out.writeDouble(s) }
    out.writeInt(buf.cand.size)
    buf.cand.foreachEntry { (i, s) => out.writeLong(i); out.writeDouble(s) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PoolBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new PoolBuffer
    var n = in.readInt()
    while (n > 0) { buf.expand(in.readLong(), in.readDouble()); n -= 1 }
    n = in.readInt()
    while (n > 0) { buf.visit(in.readLong(), in.readDouble()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PoolTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PoolTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PoolTopK =
    copy(score = newChildren(0), id = newChildren(1), x = newChildren(2))
}

object TopKAgg {
  /** Column form: array<struct<score,id>> of the k best rows per group. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())

  /** [[topKBy]] with id-distinct slots: duplicate candidate rows (same
    * id, equal-or-worse score) collapse inside the heap instead of
    * needing a `groupBy(id).max(score)` dedupe shuffle *before* the
    * top-k shuffle — one aggregation pass where the naive plan takes
    * two. The workhorse of the NN-Descent merge and beam-search keeps
    * ([[graft.operators.KnnGraph]]). */
  def topKByDistinct(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k,
        distinct = true)
        .toAggregateExpression())

  /** Column form of [[FrontierTopK]]: the k best (score desc, id asc)
    * visited-and-not-expanded ids per group, straight off the walk's
    * tagged state frame — the anti-join + distinct-top-k pair fused
    * into one aggregation pass. */
  def frontierTopK(score: Column, id: Column, x: Column, k: Int): Column =
    Bridge.column(
      FrontierTopK(Bridge.expression(score), Bridge.expression(id),
        Bridge.expression(x), k)
        .toAggregateExpression())

  /** Column form of [[PoolTopK]]: struct(exp, pool) — the expanded set
    * (scores kept) plus the c best unexpanded visited, both sorted
    * (score desc, id asc). */
  def poolTopK(score: Column, id: Column, x: Column, c: Int): Column =
    Bridge.column(
      PoolTopK(Bridge.expression(score), Bridge.expression(id),
        Bridge.expression(x), c)
        .toAggregateExpression())
}
