package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.Catalog

/**
 * Maintenance ops as SQL stored procedures — `CALL cat.system.compact('t')`
 * and friends, the Iceberg `CALL catalog.system.…` shape over the engine's
 * lock-guarded lifecycle operations (each is the same op the handle API
 * exposes; the procedure adds nothing but the SQL entry point and a
 * summary result row):
 *
 *  - `compact(topic)`            → [[Catalog.compactTopic]]
 *  - `vacuum(topic)`             → [[Catalog.vacuumTopic]] (report row)
 *  - `maintain(topic, max_files_per_partition)` → [[Catalog.maintainTopic]]
 *  - `expire(topic, before_id)`  → [[Catalog.expireTopic]]
 *  - `restore(topic, version)`   → `TopicHandle.restoreTo` (rollback)
 *  - `rebuild_manifest(topic)`   → [[Catalog.rebuildManifest]] (self-heal)
 *  - `transactions(topic)`       → `TopicHandle.transactions` (admin listing)
 *  - `remote_shares(topic)`      → `TopicHandle.remoteShares` (cross-topic)
 *
 * All side-effecting (`isDeterministic = false`), all driver-coordinated
 * by design — these are the operations that REWRITE the corpus, the one
 * place O(corpus) work is inherent.
 */
private[sql] object GraftProcedures {

  val Namespace = "system"

  def names: Seq[String] =
    Seq("clone", "compact", "expire", "history", "locks", "maintain",
      "produce_intents", "rebuild_manifest", "remote_shares", "restore",
      "transactions", "vacuum")

  def load(engine: Catalog, name: String): Option[UnboundProcedure] = {
    def topicOf(in: InternalRow): String = {
      val t = in.getUTF8String(0).toString
      if (!engine.topicExists(t))
        throw new IllegalArgumentException(s"no such topic: '$t'")
      t
    }
    def liveFiles(topic: String): Long =
      engine.readManifest(topic)
        .map(m => engine.manifestFileCounts(topic, m).values.sum).getOrElse(0L)
    def handle(topic: String): graft.engine.TopicHandle =
      new graft.engine.GraftDriver(org.apache.spark.sql.SparkSession.active,
        engine.warehouse).openTopic(topic)
    name match {
      case "compact" => Some(procedure("compact",
        "rewrite the hot log into few chunk files per partition",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("topic", StringType, nullable = false),
          StructField("live_files", LongType, nullable = false)))) { in =>
        val t = topicOf(in)
        engine.compactTopic(t)
        Seq(t, liveFiles(t))
      })
      case "clone" => Some(procedure("clone",
        "shallow-clone a topic: new topic referencing the source's files (zero data copied)",
        Seq(ProcedureParameter.in("source", StringType).build(),
          ProcedureParameter.in("target", StringType).build()),
        StructType(Seq(StructField("source", StringType, nullable = false),
          StructField("target", StringType, nullable = false),
          StructField("events", LongType, nullable = false)))) { in =>
        val srcT = topicOf(in)
        val dstT = in.getUTF8String(1).toString
        engine.cloneTopic(srcT, dstT)
        Seq(srcT, dstT, engine.nextIds(dstT).values.sum)
      })
      case "vacuum" => Some(procedure("vacuum",
        "remove crashed-operation debris (uncommitted chunks, swap leftovers, temp files)",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("uncommitted_chunks", LongType, nullable = false),
          StructField("swap_leftovers", LongType, nullable = false),
          StructField("tmp_files", LongType, nullable = false),
          StructField("bytes_reclaimed", LongType, nullable = false)))) { in =>
        val r = engine.vacuumTopic(topicOf(in))
        Seq(r.uncommittedChunks.toLong, r.swapLeftovers.toLong,
          r.tmpFiles.toLong, r.bytesReclaimed)
      })
      case "maintain" => Some(procedure("maintain",
        "compact-if-needed, vacuum, refresh every index",
        Seq(ProcedureParameter.in("topic", StringType).build(),
          ProcedureParameter.in("max_files_per_partition", IntegerType)
            .defaultValue("16").build()),
        StructType(Seq(StructField("compacted", BooleanType, nullable = false),
          StructField("bytes_reclaimed", LongType, nullable = false),
          StructField("files_indexed", LongType, nullable = false)))) { in =>
        val (compacted, vac, indexed) =
          engine.maintainTopic(topicOf(in), in.getInt(1))
        Seq(compacted, vac.bytesReclaimed, indexed.toLong)
      })
      case "expire" => Some(procedure("expire",
        "drop whole chunk files below the id cutoff (retention by offset)",
        Seq(ProcedureParameter.in("topic", StringType).build(),
          ProcedureParameter.in("before_id", LongType).build()),
        StructType(Seq(StructField("topic", StringType, nullable = false),
          StructField("live_files", LongType, nullable = false)))) { in =>
        val t = topicOf(in)
        engine.expireTopic(t, in.getLong(1))
        Seq(t, liveFiles(t))
      })
      case "restore" => Some(procedure("restore",
        "roll the topic back to a retained commit (tail purge; ids never regress)",
        Seq(ProcedureParameter.in("topic", StringType).build(),
          ProcedureParameter.in("version", LongType).build()),
        StructType(Seq(StructField("topic", StringType, nullable = false),
          StructField("restored_to", LongType, nullable = false)))) { in =>
        val t = topicOf(in)
        val v = in.getLong(1)
        handle(t).restoreTo(v)
        Seq(t, v)
      })
      case "history" => Some(procedureRows("history",
        "the topic's retained commit history (DESCRIBE HISTORY analog), oldest first",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("commit_time", TimestampType, nullable = false),
          StructField("n_events", LongType, nullable = false)))) { in =>
        engine.versionHistory(topicOf(in)).map(v =>
          Seq(v.version, v.kind, v.commitTimeMs * 1000L,
            v.watermarks.valuesIterator.sum))
      })
      case "transactions" => Some(procedureRows("transactions",
        "transaction admin listing (kafka-transactions.sh list/describe analog)",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("txn_id", StringType, nullable = false),
          StructField("state", StringType, nullable = false),
          StructField("n_events", LongType, nullable = false),
          StructField("n_ranges", LongType, nullable = false),
          StructField("n_staged_deletes", LongType, nullable = false),
          StructField("n_offset_entries", LongType, nullable = false),
          StructField("idle_ms", LongType, nullable = false)))) { in =>
        // the SQL answer to "what is wedging my read_committed stream" —
        // metadata-only, no Scala shell needed
        handle(topicOf(in)).transactionRows().map(r =>
          Seq(r._1, r._2, r._3, r._4, r._5, r._6, r._7))
      })
      case "produce_intents" => Some(procedureRows("produce_intents",
        "live concurrent-produce reservation intents (the produce-side " +
        "mirror of system.transactions)",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("intent_id", StringType, nullable = false),
          StructField("n_events", LongType, nullable = false),
          StructField("n_ranges", LongType, nullable = false),
          StructField("staged_files", LongType, nullable = false),
          StructField("staged_bytes", LongType, nullable = false),
          StructField("idle_ms", LongType, nullable = false)))) { in =>
        // the SQL answer to "which producer is blocking my exclusive
        // statement / queued commit" — metadata-only, no Scala shell needed
        handle(topicOf(in)).produceIntentRows().map(r =>
          Seq(r._1, r._2, r._3, r._4, r._5, r._6))
      })
      case "locks" => Some(procedureRows("locks",
        "held produce/compact lock files: owner, age, heartbeat mode, " +
        "pending reclaim (the third blocker view, after transactions " +
        "and produce_intents)",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("lock", StringType, nullable = false),
          StructField("owner", StringType, nullable = false),
          StructField("age_ms", LongType, nullable = false),
          StructField("heartbeat", StringType, nullable = false),
          StructField("reclaim_pending", BooleanType, nullable = false)))) { in =>
        // the SQL answer to "what is my statement blocked on and is its
        // holder alive" — metadata-only, no Scala shell needed
        handle(topicOf(in)).lockRows().map(r =>
          Seq(r._1, r._2, r._3, r._4, r._5))
      })
      case "remote_shares" => Some(procedureRows("remote_shares",
        "cross-topic transaction shares with resolved coordinator state",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("coord_topic", StringType, nullable = false),
          StructField("txn_id", StringType, nullable = false),
          StructField("coord_state", StringType, nullable = false),
          StructField("n_events", LongType, nullable = false),
          StructField("n_ranges", LongType, nullable = false)))) { in =>
        handle(topicOf(in)).remoteShareRows().map(r =>
          Seq(r._1, r._2, r._3, r._4, r._5))
      })
      case "rebuild_manifest" => Some(procedure("rebuild_manifest",
        "re-derive the manifest from the log (self-heal after metadata loss)",
        Seq(ProcedureParameter.in("topic", StringType).build()),
        StructType(Seq(StructField("topic", StringType, nullable = false),
          StructField("live_files", LongType, nullable = false)))) { in =>
        val t = topicOf(in)
        engine.rebuildManifest(t)
        Seq(t, liveFiles(t))
      })
      case _ => None
    }
  }

  /** One-row-result side-effecting procedure. `body` returns the output
    * row's values in schema order (Strings converted to UTF8String here). */
  private def procedure(procName: String, procDescription: String,
                        params: Seq[ProcedureParameter], outSchema: StructType)(
      body: InternalRow => Seq[Any]): UnboundProcedure =
    procedureRows(procName, procDescription, params, outSchema)(
      in => Seq(body(in)))

  /** Multi-row variant (read-only reports like `history`). */
  private def procedureRows(procName: String, procDescription: String,
                            params: Seq[ProcedureParameter], outSchema: StructType)(
      body: InternalRow => Seq[Seq[Any]]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = procDescription
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = procDescription
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val out: Array[InternalRow] = body(input).map { values =>
            new GenericInternalRow(values.map {
              case s: String => UTF8String.fromString(s)
              case x => x
            }.toArray[Any]): InternalRow
          }.toArray
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = out
            override def readSchema(): StructType = outSchema
            override def description(): String = s"graft.$procName result"
          }).iterator()
        }
      }
    }
}
