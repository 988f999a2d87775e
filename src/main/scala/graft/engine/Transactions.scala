package graft.engine

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Transactional + idempotent produce — the exactly-once write surface.
 *
 * The reference linearizes each client's appends server-side under the
 * partition write-queue lock (`/root/reference/src/DefaultPartitionManager
 * .cpp:398-409`) but offers no atomic multi-batch commit; this engine adds
 * the log-store industry's two standard strengthenings on top of the same
 * dense-id log:
 *
 *  - [[TransactionalProducer]] (Kafka transactions analog): a named
 *    transaction groups any number of produces; its events become visible
 *    to `read_committed` readers atomically at commit, or never (abort).
 *    Events are NOT buffered — they land in the log immediately (dense ids,
 *    interleaved with other producers' events, exactly like Kafka's log) and
 *    visibility is a metadata-only filter over the transaction's recorded
 *    id ranges.
 *  - [[IdempotentProducer]] (Kafka `enable.idempotence` analog): a producer
 *    identity + per-batch sequence number make produce retries safe — a
 *    retried batch whose original actually committed is recognized and
 *    skipped (its recorded ranges are returned), a sequence gap fails
 *    loudly, and a stale epoch is fenced (zombie producers).
 *
 * == Crash contract (both surfaces) ==
 *
 * Membership/sequence state is written as an INTENT (under the produce
 * lock) after this produce's id ranges are determined but BEFORE any data
 * or watermark write. The watermark commit is atomic, so on recovery the
 * intent is decidable against the watermark itself:
 *
 *  - intent ranges at/above the watermark ⇒ the produce died before its id
 *    commit ⇒ those ids were never issued (its orphan files are purged by
 *    the standard produce-start hygiene) and WILL be re-issued — the intent
 *    is truncated/discarded;
 *  - intent ranges fully below the watermark ⇒ the produce committed ⇒ the
 *    intent is promoted (transaction keeps the ranges; idempotent pending
 *    sequence becomes committed).
 *
 * Reconciliation runs at the start of EVERY produce-path entry (under the
 * produce lock, before new ids can be assigned), so a stale intent can
 * never survive past the moment its ids become reusable
 * ([[Catalog.reconcileProduceState]]).
 */
final case class TxnRange(partition: Int, first: Long, count: Long)

object TxnRange {
  def toRanges(m: Map[Int, (Long, Long)]): Vector[TxnRange] =
    m.toVector.sortBy(_._1).map { case (p, (f, c)) => TxnRange(p, f, c) }

  def toMap(rs: Vector[TxnRange]): Map[Int, (Long, Long)] =
    rs.map(r => r.partition -> (r.first, r.count)).toMap

  private[engine] def toJValue(rs: Vector[TxnRange]): JValue =
    JArray(rs.toList.map(r => JObject(
      "p" -> JInt(r.partition), "first" -> JLong(r.first), "count" -> JLong(r.count))))

  private[engine] def long(j: JValue, what: String): Long = j match {
    case JInt(v) => v.toLong
    case JLong(v) => v
    case other => throw new IllegalStateException(
      s"bad $what: ${JsonMethods.compact(other)}")
  }

  private[engine] def fromJValue(j: JValue): Vector[TxnRange] = j match {
    case JArray(xs) => xs.map {
      case o: JObject => TxnRange(long(o \ "p", "txn partition").toInt,
        long(o \ "first", "txn first"), long(o \ "count", "txn count"))
      case other => throw new IllegalStateException(
        s"bad txn range: ${JsonMethods.compact(other)}")
    }.toVector
    case other => throw new IllegalStateException(
      s"bad txn ranges: ${JsonMethods.compact(other)}")
  }
}

/**
 * One in-transaction DELETE statement's staged deletion vector: the matched
 * `(partition, event_id)` relation sits as a never-listed `txn-<suffix>`
 * directory under `_deletes/` until the transaction commits
 * ([[Catalog.stageTxnDelete]]), when it is promoted to a committed `d-*`
 * root ([[Catalog.commitTxn]]). `plannedVersion` is the snapshot version
 * the statement matched against — the commit re-runs the optimistic
 * conflict check ([[Catalog.failOnRowRemovalSince]]) so rows removed by
 * anyone else since the match refuse the commit loudly instead of
 * double-deleting.
 */
final case class TxnDelete(staged: String, suffix: String, count: Long,
                           plannedVersion: Long) {
  private[engine] def toJValue: JValue = JObject(
    "staged" -> JString(staged), "suffix" -> JString(suffix),
    "count" -> JLong(count), "plannedVersion" -> JLong(plannedVersion))
}

object TxnDelete {
  private[engine] def fromJValue(j: JValue): TxnDelete = j match {
    case o: JObject =>
      val str = (field: String) => o \ field match {
        case JString(s) => s
        case other => throw new IllegalStateException(
          s"bad txn delete $field: ${JsonMethods.compact(other)}")
      }
      TxnDelete(str("staged"), str("suffix"),
        TxnRange.long(o \ "count", "txn delete count"),
        TxnRange.long(o \ "plannedVersion", "txn delete plannedVersion"))
    case other => throw new IllegalStateException(
      s"bad txn delete: ${JsonMethods.compact(other)}")
  }
}

/**
 * Consumer-cursor floors a transaction carries (the Kafka
 * `sendOffsetsToTransaction` analog — the exactly-once
 * consume-transform-produce loop): at commit, `consumer`'s cursor on
 * `topic` advances to at least `floors` (last-PROCESSED event id per
 * partition, same convention as [[Catalog.acknowledge]]) — atomically
 * with the transaction's produces and deletes. The floors live HERE (the
 * transaction state is the single source of truth); a small pointer file
 * under the source topic's `_cursors/_txnpend/` makes them discoverable
 * from the cursor-read side (see [[Catalog.cursor]]).
 */
final case class TxnOffsets(topic: String, consumer: String,
                            floors: Map[Int, Long]) {
  private[engine] def toJValue: JValue = JObject(
    "topic" -> JString(topic), "consumer" -> JString(consumer),
    "floors" -> JObject(floors.toList.sortBy(_._1).map {
      case (p, id) => p.toString -> (JLong(id): JValue)
    }))
}

object TxnOffsets {
  private[engine] def fromJValue(j: JValue): TxnOffsets = j match {
    case o: JObject =>
      val str = (field: String) => o \ field match {
        case JString(s) => s
        case other => throw new IllegalStateException(
          s"bad txn offsets $field: ${JsonMethods.compact(other)}")
      }
      val floors = o \ "floors" match {
        case JObject(fs) => fs.map { case (k, v) =>
          k.toInt -> TxnRange.long(v, s"txn offset floor $k") }.toMap
        case other => throw new IllegalStateException(
          s"bad txn offset floors: ${JsonMethods.compact(other)}")
      }
      TxnOffsets(str("topic"), str("consumer"), floors)
    case other => throw new IllegalStateException(
      s"bad txn offsets: ${JsonMethods.compact(other)}")
  }
}

/**
 * A FOREIGN topic's share of a transaction (the cross-topic produce —
 * [[TransactionalProducer.produceTo]]): the id ranges this topic's log
 * holds for a transaction whose record (and commit/abort decision) lives
 * on `coordTopic`. Stored under THIS topic's `_txns_remote/`; readers
 * resolve visibility against the coordinator's state
 * ([[Catalog.uncommittedTxnRanges]]), so one state flip on the
 * coordinator publishes every participating topic's rows together.
 * Ranges are recorded pre-commit (the [[PidState.pending]] watermark
 * contract), so a crashed produce's phantom tail truncates at the next
 * write-path entry while the coordinator is still open.
 */
final case class RemoteTxn(coordTopic: String, txnId: String,
                           ranges: Vector[TxnRange]) {
  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "coordTopic" -> JString(coordTopic), "txnId" -> JString(txnId),
    "ranges" -> TxnRange.toJValue(ranges))))
}

object RemoteTxn {
  def fromJson(json: String): RemoteTxn = JsonMethods.parse(json) match {
    case o: JObject =>
      val str = (field: String) => o \ field match {
        case JString(s) => s
        case other => throw new IllegalStateException(
          s"bad remote txn $field: ${JsonMethods.compact(other)}")
      }
      RemoteTxn(str("coordTopic"), str("txnId"),
        TxnRange.fromJValue(o \ "ranges"))
    case other => throw new IllegalStateException(
      s"remote txn must be a JSON object: ${JsonMethods.compact(other)}")
  }
}

/** A transaction's persisted state: `open` | `committed` | `aborted`, the
  * per-produce id ranges recorded so far, the staged in-transaction
  * deletes awaiting the commit's vector promotion ([[TxnDelete]]), and
  * the consumer-cursor floors committing with it ([[TxnOffsets]]). */
final case class TxnState(state: String, ranges: Vector[TxnRange],
                          deletes: Vector[TxnDelete] = Vector.empty,
                          offsets: Vector[TxnOffsets] = Vector.empty) {
  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "state" -> JString(state), "ranges" -> TxnRange.toJValue(ranges),
    "deletes" -> JArray(deletes.toList.map(_.toJValue)),
    "offsets" -> JArray(offsets.toList.map(_.toJValue)))))
}

object TxnState {
  def fromJson(json: String): TxnState = JsonMethods.parse(json) match {
    case o: JObject =>
      val state = o \ "state" match {
        case JString(s) => s
        case other => throw new IllegalStateException(
          s"bad txn state: ${JsonMethods.compact(other)}")
      }
      // absent `deletes`/`offsets` = a state file written before
      // multi-statement transactions existed — empty, not an error
      val deletes = o \ "deletes" match {
        case JArray(xs) => xs.map(TxnDelete.fromJValue).toVector
        case JNothing | JNull => Vector.empty[TxnDelete]
        case other => throw new IllegalStateException(
          s"bad txn deletes: ${JsonMethods.compact(other)}")
      }
      val offsets = o \ "offsets" match {
        case JArray(xs) => xs.map(TxnOffsets.fromJValue).toVector
        case JNothing | JNull => Vector.empty[TxnOffsets]
        case other => throw new IllegalStateException(
          s"bad txn offsets: ${JsonMethods.compact(other)}")
      }
      TxnState(state, TxnRange.fromJValue(o \ "ranges"), deletes, offsets)
    case other => throw new IllegalStateException(
      s"txn state must be a JSON object: ${JsonMethods.compact(other)}")
  }
}

/** An idempotent producer's persisted state: current epoch, last committed
  * sequence (+ its ranges, for retry dedup), and the in-flight pending
  * intent awaiting watermark confirmation. `committedSeq = -1` means no
  * batch committed yet at this epoch. */
final case class PidState(
    epoch: Long, committedSeq: Long, committedRanges: Vector[TxnRange],
    pending: Option[(Long, Vector[TxnRange])]) {
  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "epoch" -> JLong(epoch),
    "committedSeq" -> JLong(committedSeq),
    "committedRanges" -> TxnRange.toJValue(committedRanges),
    "pending" -> pending.map { case (seq, rs) => JObject(
      "seq" -> JLong(seq), "ranges" -> TxnRange.toJValue(rs)): JValue
    }.getOrElse(JNothing))))
}

object PidState {
  def fromJson(json: String): PidState = JsonMethods.parse(json) match {
    case o: JObject =>
      val pending = o \ "pending" match {
        case p: JObject =>
          Some(TxnRange.long(p \ "seq", "pending seq") -> TxnRange.fromJValue(p \ "ranges"))
        case _ => None
      }
      PidState(TxnRange.long(o \ "epoch", "pid epoch"),
        TxnRange.long(o \ "committedSeq", "pid committedSeq"),
        TxnRange.fromJValue(o \ "committedRanges"), pending)
    case other => throw new IllegalStateException(
      s"producer state must be a JSON object: ${JsonMethods.compact(other)}")
  }
}

/**
 * A SQL MERGE's cross-commit crash intent (see [[MergeCommit]]): written
 * under the produce lock before the merge's produce commit, removed after
 * its vector-delete commit, and decided by
 * [[Catalog.reconcileProduceState]] on recovery. `produceRanges` follows
 * the same watermark-decidable contract as [[PidState.pending]]: ranges
 * fully below the id watermark prove the produce committed (→ roll the
 * delete forward); anything else proves it died pre-commit (→ roll back).
 */
final case class MergeIntent(
    stagingDir: String, files: Vector[String],
    deletes: Long, inserts: Long,
    produceRanges: Option[Vector[TxnRange]]) {

  /** THE decision predicate of the crash protocol — ranges fixed before
    * any write + atomic watermark commit make this exact. One definition,
    * shared by commit-time rollback and recovery-time roll-forward: the
    * two sides must never disagree on whether the same intent committed. */
  def produceCommitted(wm: Map[Int, Long]): Boolean =
    produceRanges.exists(rs =>
      rs.forall(r => wm.getOrElse(r.partition, 0L) >= r.first + r.count))

  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "stagingDir" -> JString(stagingDir),
    "files" -> JArray(files.toList.map(JString(_))),
    "deletes" -> JLong(deletes),
    "inserts" -> JLong(inserts),
    "produceRanges" -> produceRanges.map(TxnRange.toJValue)
      .getOrElse(JNothing: JValue))))
}

object MergeIntent {
  def fromJson(json: String): MergeIntent = JsonMethods.parse(json) match {
    case o: JObject =>
      val stagingDir = o \ "stagingDir" match {
        case JString(s) => s
        case other => throw new IllegalStateException(
          s"bad merge stagingDir: ${JsonMethods.compact(other)}")
      }
      val files = o \ "files" match {
        case JArray(xs) => xs.collect { case JString(f) => f }.toVector
        case other => throw new IllegalStateException(
          s"bad merge files: ${JsonMethods.compact(other)}")
      }
      val ranges = o \ "produceRanges" match {
        case JNothing | JNull => None
        case v => Some(TxnRange.fromJValue(v))
      }
      MergeIntent(stagingDir, files,
        TxnRange.long(o \ "deletes", "merge deletes"),
        TxnRange.long(o \ "inserts", "merge inserts"), ranges)
    case other => throw new IllegalStateException(
      s"merge intent must be a JSON object: ${JsonMethods.compact(other)}")
  }
}

/**
 * Kafka-transactions analog over the graft log — obtain via
 * [[TopicHandle.beginTransaction]] (new) or [[TopicHandle.transaction]]
 * (resume an open one). Every [[produce]] lands its events in the log
 * immediately and records their id ranges against the transaction; commit
 * and abort are one atomic metadata write. `read_committed` readers
 * ([[TopicHandle.events(isolation:String)*]]) exclude the ranges of every
 * transaction that is not committed; aborted events stay in the log
 * (filtered, like Kafka's) until [[TopicHandle.purgeAborted]] reclaims them.
 */
final class TransactionalProducer private[engine] (
    catalog: Catalog, topic: String, val txnId: String, inner: Producer) {

  /** Produce under the transaction. Atomicity of the BATCH itself is the
    * normal produce contract; atomicity of the transaction (all batches
    * visible together or not at all) is the commit's. */
  def produce(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long)] = {
    // draining acquisition: this statement holds the lock across its data
    // write and commits a watermark jump — concurrent plain-produce
    // reservations must be empty first (see Catalog's intent protocol)
    catalog.acquireProduceLockDraining(topic)
    try {
      catalog.reconcileProduceState(topic): Unit
      val st = catalog.txnState(topic, txnId).getOrElse(throw new IllegalStateException(
        s"unknown transaction '$txnId' on topic '$topic'"))
      if (st.state != "open") throw new IllegalStateException(
        s"transaction '$txnId' on topic '$topic' is ${st.state}, not open")
      val res = inner.produceHeld(df, ranges =>
        catalog.appendTxnRanges(topic, txnId, ranges))
      // lease refresh AFTER the data write: the range intent above lands
      // before it, so a produce whose Spark job outlives
      // spark.graft.txn.timeoutMs must not leave a stale lease behind an
      // active client (idle time is what expires, not statement duration)
      catalog.touchTxnHeld(topic, txnId)
      res
    } finally catalog.releaseProduceLock(topic)
  }

  /**
   * Delete under the transaction — the multi-statement surface (produce +
   * delete under ONE visibility point): rows matching `cond` (evaluated
   * NOW, against committed rows plus this transaction's own produced
   * rows) are staged as a deletion vector that becomes visible atomically
   * at [[commit]], together with every produced batch — the upsert-txn
   * shape (produce the corrected rows, delete the stale ones, commit once).
   * `cond` sees the decoded event columns (`partition`, `event_id`,
   * `metadata`, `data`). Same NULL rule as [[Catalog.deleteWhereVectored]]:
   * only rows where `cond` is definitively TRUE are deleted.
   *
   * Snapshot semantics: the match is point-in-time — rows produced (by
   * anyone) AFTER this statement are not deleted. Rows removed by anyone
   * ELSE between this statement and [[commit]] refuse the commit loudly
   * (optimistic conflict check); abort and re-run the transaction.
   *
   * @return the number of rows staged for deletion (0 stages nothing)
   */
  def deleteWhere(cond: org.apache.spark.sql.Column): Long =
    catalog.stageTxnDelete(topic, txnId, cond)

  /**
   * Produce to ANOTHER topic under this transaction — cross-topic
   * atomicity (Kafka transactions span topics): the rows land in
   * `target`'s log immediately (dense ids, `target`'s own validator and
   * partition selector apply) but stay invisible to `target`'s
   * read_committed readers until THIS transaction's one commit — the
   * coordinator state flip publishes every participating topic's rows
   * together, or an abort hides them everywhere (reclaim per topic via
   * its [[TopicHandle.purgeAborted]]). The target must live in the same
   * warehouse.
   */
  def produceTo(target: String,
                df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long)] =
    if (target == topic) produce(df)
    else catalog.produceRemote(topic, txnId, target, df)

  /**
   * Commit consumer-cursor floors WITH the transaction — Kafka's
   * `sendOffsetsToTransaction`, the exactly-once consume-transform-produce
   * loop: pull from `sourceTopic` as `consumer`, transform, [[produce]]
   * here, record the processed floors, [[commit]] once. The cursor
   * advance becomes visible atomically with the transaction's produces
   * and deletes (cursor reads resolve the pending floors against this
   * transaction's state); an abort discards them, so a crashed loop
   * re-reads exactly the rows whose outputs never became visible.
   *
   * `floors` = last PROCESSED event id per partition (the
   * [[Catalog.acknowledge]] convention; the stored cursor is id+1).
   * Repeated calls merge (floors only advance). The source topic must
   * live in the same warehouse.
   */
  def sendOffsets(sourceTopic: String, consumer: String,
                  floors: Map[Int, Long]): Unit =
    catalog.stageTxnOffsets(topic, txnId, sourceTopic, consumer, floors)

  /**
   * Extend the transaction's liveness lease. An OPEN transaction whose
   * state has not been written for `spark.graft.txn.timeoutMs` (default
   * 15 min) is ABANDONED and auto-aborted by the next write-path entry or
   * `maintainTopic` pass — Kafka's `transaction.timeout.ms`, here
   * measured on the state file's mtime. Every statement already extends
   * the lease ([[produce]]'s range intent, [[deleteWhere]]'s adoption,
   * [[sendOffsets]]); call this only when a long gap between statements
   * (a slow upstream job) would otherwise outlive the horizon.
   */
  def heartbeat(): Unit = catalog.touchTxn(topic, txnId)

  /** Atomically make every produced event, every staged delete, AND every
    * recorded cursor floor visible — one visibility point for the whole
    * transaction (staged deletes are promoted to gated vector roots
    * first, then the state flip publishes everything together). */
  def commit(): Unit = catalog.commitTxn(topic, txnId)

  /** Atomically discard the transaction: its events stay in the log but are
    * never visible to read_committed ([[TopicHandle.purgeAborted]] reclaims
    * the storage). */
  def abort(): Unit = catalog.abortTxn(topic, txnId)

  def state: TxnState = catalog.txnState(topic, txnId).getOrElse(
    throw new IllegalStateException(s"unknown transaction '$txnId' on topic '$topic'"))
}

/**
 * Kafka `enable.idempotence` analog — obtain via
 * [[TopicHandle.idempotentProducer]]. Each batch carries a sequence number;
 * the engine commits a given (producerId, epoch, sequence) at most once:
 *
 *  - retry of the LAST committed sequence → no-op, returns the original
 *    ranges (the retried batch is assumed identical — same as Kafka, which
 *    dedups by sequence number, not content);
 *  - sequence ≤ an older committed one → duplicate error (loud, like
 *    Kafka's DuplicateSequenceNumber);
 *  - sequence gap → out-of-order error (OutOfOrderSequenceException);
 *  - epoch below the persisted one → fenced (zombie producer); a HIGHER
 *    epoch takes over and resets the sequence space (Kafka epoch bump).
 */
final class IdempotentProducer private[engine] (
    catalog: Catalog, topic: String, val producerId: String, val epoch: Long,
    inner: Producer) {

  def produce(df: org.apache.spark.sql.DataFrame, sequence: Long): Map[Int, (Long, Long)] = {
    require(sequence >= 0, s"sequence must be >= 0, got $sequence")
    // draining acquisition: holds the lock across the data write and
    // commits a watermark jump (see Catalog's intent protocol)
    catalog.acquireProduceLockDraining(topic)
    try {
      catalog.reconcileProduceState(topic): Unit
      val st = catalog.producerState(topic, producerId)
        .getOrElse(PidState(epoch, -1L, Vector.empty, None))
      if (epoch < st.epoch) throw new IllegalStateException(
        s"producer '$producerId' fenced on topic '$topic': " +
          s"epoch $epoch < current ${st.epoch}")
      // an epoch bump takes over the id and resets the sequence space
      val cur = if (epoch > st.epoch) PidState(epoch, -1L, Vector.empty, None) else st
      if (sequence <= cur.committedSeq) {
        if (sequence == cur.committedSeq) return TxnRange.toMap(cur.committedRanges)
        throw new IllegalStateException(
          s"duplicate sequence $sequence for producer '$producerId' " +
            s"(last committed = ${cur.committedSeq})")
      }
      if (sequence != cur.committedSeq + 1) throw new IllegalStateException(
        s"out-of-order sequence $sequence for producer '$producerId' " +
          s"(expected ${cur.committedSeq + 1})")
      val res = inner.produceHeld(df, ranges =>
        catalog.writeProducerState(topic, producerId,
          cur.copy(pending = Some(sequence -> TxnRange.toRanges(ranges)))))
      catalog.writeProducerState(topic, producerId,
        cur.copy(committedSeq = sequence,
          committedRanges = TxnRange.toRanges(res), pending = None))
      res
    } finally catalog.releaseProduceLock(topic)
  }
}
