package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DataView, EventBridge}
import Q._

/**
 * The reference's two query languages as registered, oracle-checked queries:
 *
 *  - the EventBridge pattern validator (F3,
 *    `/root/reference/tests/MofkaEventbridgeTest.cpp:35-141`) compiled to
 *    Catalyst predicates over JSON metadata — the oracle re-states each
 *    pattern as plain SQL over the raw columns, so the compiler is checked
 *    against an independent formulation, not against itself;
 *  - the DataDescriptor view algebra (P2-P5,
 *    `/root/reference/tests/MofkaDataSelectionTest.cpp:98-176`) as byte-slice
 *    projections — the oracle SQL is GENERATED from `DataView.flatten`, so
 *    the flatten normalization is what DuckDB actually cross-checks;
 *  - the consumer DataSelector (F4, `/root/reference/src/MofkaConsumer.cpp:240-259`):
 *    per-event predicate decides whether the payload slice ships or an empty
 *    payload does.
 */
object EventPack extends QueryPack {

  /** DuckDB mirror of a compiled view over a string column. */
  private def viewOracle(v: DataView, col: String): String = v.flatten match {
    case None => col
    case Some(Nil) => "''"
    case Some(segs) =>
      segs.map { case (o, sz) => s"substr($col, ${o + 1}, $sz)" }.mkString(" || ")
  }

  // Views under test — small offsets so every doc (min 48 chars) covers them.
  private val subView = DataView.Full.makeSubView(5, 30)
  private val stridedView = DataView.Full.makeStridedView(13, 3, 4, 2)
  private val unstructuredView =
    DataView.Full.makeUnstructuredView(Seq((2L, 5L), (10L, 1L), (20L, 8L)))
  // Nested composition: sub-of-strided-of-sub — exercises the remap path.
  private val nestedView = DataView.Full
    .makeSubView(2, 40)
    .makeStridedView(1, 4, 6, 3)
    .makeSubView(3, 15)

  private val ebExactPattern = """{"k": [5, 17, 42]}"""
  private val ebNumericPattern = """{"k": [{"numeric": [">=", 10, "<", 20]}]}"""
  private val ebStringPattern =
    """{"type": [{"prefix": "c"}, "error", {"suffix": "up"}],
      | "uid": [{"numeric": ["<", 100]}]}""".stripMargin
  private val ebComplexPattern =
    """{"info": {"t": [{"equals-ignore-case": "CLICK"}, {"wildcard": "*up"}, {"prefix": "err"}]},
      | "$or": [{"uid": [{"numeric": [">=", 120]}]}, {"v": [{"numeric": ["<", 50]}]}],
      | "uid": [{"exists": true}]}""".stripMargin
  private val ebAnythingButPattern =
    """{"type": [{"anything-but": ["view", "click"]}], "k": [{"numeric": [">=", 0]}]}"""
  private val selectorPattern = """{"k": [{"numeric": ["<", 50]}]}"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eb_exact" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .filter(EventBridge.matches($"props", ebExactPattern))
        .select($"event_id", $"user_id")
        .orderBy($"event_id")
    },
    "q_eb_numeric" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .filter(EventBridge.matches($"props", ebNumericPattern))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    "q_eb_string" -> { (s, dir) =>
      import s.implicits._
      // Metadata document derived from the event columns; the oracle states
      // the same predicate over the raw columns — an independent formulation.
      t(s, dir, "events")
        .withColumn("md", to_json(struct($"event_type".as("type"), $"user_id".as("uid"))))
        .filter(EventBridge.matches($"md", ebStringPattern))
        .select($"event_id", $"event_type")
        .orderBy($"event_id")
    },
    "q_eb_complex" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .withColumn("md", to_json(struct(
          struct($"event_type".as("t")).as("info"),
          $"user_id".as("uid"), $"value".as("v"))))
        .filter(EventBridge.matches($"md", ebComplexPattern))
        .select($"event_id", $"event_type", $"user_id")
        .orderBy($"event_id")
    },
    "q_eb_anything_but" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .withColumn("md", to_json(struct(
          $"event_type".as("type"),
          get_json_object($"props", "$.k").cast("double").as("k"))))
        .filter(EventBridge.matches($"md", ebAnythingButPattern))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    },

    "q_eb_struct" -> { (s, dir) =>
      import s.implicits._
      // single-parse fast path: from_json once per row against the
      // pattern-derived schema, predicate over the parsed struct
      t(s, dir, "events")
        .withColumn("md", to_json(struct(
          struct($"event_type".as("t")).as("info"),
          $"user_id".as("uid"), $"value".as("v"))))
        .transform(df => EventBridge.filterFast(df, "md", ebComplexPattern))
        .select($"event_id", $"event_type", $"user_id")
        .orderBy($"event_id")
    },

    "q_view_sub" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", subView.toColumn($"text").as("slice"))
        .orderBy($"doc_id")
    },
    "q_view_strided" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", stridedView.toColumn($"text").as("slice"))
        .orderBy($"doc_id")
    },
    "q_view_unstructured" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", unstructuredView.toColumn($"text").as("slice"))
        .orderBy($"doc_id")
    },
    "q_view_nested" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", nestedView.toColumn($"text").as("slice"))
        .orderBy($"doc_id")
    },

    "q_selector" -> { (s, dir) =>
      import s.implicits._
      // DataSelector semantics: the predicate is evaluated on metadata; only
      // matching events ship payload bytes (here: a 4-byte sub-view), others
      // ship an empty payload.
      val slice = DataView.Full.makeSubView(0, 4).toColumn($"props")
      t(s, dir, "events")
        .select($"event_id",
          when(EventBridge.matches($"props", selectorPattern), slice)
            .otherwise(lit("")).as("payload"))
        .orderBy($"event_id")
    },

    "q_selector_cases" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.Column
      import graft.engine.DataSelector
      import graft.functions.EventView
      // F4 generalized: the reference's three-way dynamic selector
      // (`/root/reference/example/consumer.cpp:38-49` — full / subview /
      // nothing, decided per event) through the ordered-cases API, plus a
      // view whose offset is computed from a metadata field.
      val k = (md: Column) => get_json_object(md, "$.k").cast("long")
      val sel = DataSelector.Cases(Seq(
        ((md: Column) => k(md) % 2 === 0 && k(md) < 70) ->
          EventView.Static(DataView.Full),
        ((md: Column) => k(md) % 2 === 0) ->
          EventView.Static(DataView.Full.makeSubView(2, 4))))
      val dyn = EventView.DynamicSub(md => k(md) % 3, _ => lit(4))
      t(s, dir, "events")
        .select($"event_id",
          sel.dataColumn($"props", $"props".cast("binary")).cast("string").as("payload"),
          dyn.toColumn($"props", $"props").as("payload_dyn"))
        .orderBy($"event_id")
    },
  )

  override def oracles: Map[String, String] = Map(
    "q_eb_exact" ->
      """SELECT event_id, user_id FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) IN (5, 17, 42)
        |ORDER BY event_id""".stripMargin,
    "q_eb_numeric" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 10
        |  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) < 20
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_eb_string" ->
      """SELECT event_id, event_type FROM events
        |WHERE (event_type LIKE 'c%' OR event_type = 'error' OR event_type LIKE '%up')
        |  AND user_id < 100
        |ORDER BY event_id""".stripMargin,
    "q_eb_complex" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE (lower(event_type) = 'click' OR event_type LIKE '%up' OR event_type LIKE 'err%')
        |  AND (user_id >= 120 OR value < 50)
        |ORDER BY event_id""".stripMargin,
    "q_eb_anything_but" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type NOT IN ('view', 'click')
        |  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_eb_struct" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE (lower(event_type) = 'click' OR event_type LIKE '%up' OR event_type LIKE 'err%')
        |  AND (user_id >= 120 OR value < 50)
        |ORDER BY event_id""".stripMargin,
    "q_view_sub" ->
      s"""SELECT doc_id, ${viewOracle(subView, "text")} AS slice
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_view_strided" ->
      s"""SELECT doc_id, ${viewOracle(stridedView, "text")} AS slice
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_view_unstructured" ->
      s"""SELECT doc_id, ${viewOracle(unstructuredView, "text")} AS slice
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_view_nested" ->
      s"""SELECT doc_id, ${viewOracle(nestedView, "text")} AS slice
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_selector" ->
      """SELECT event_id,
        | CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) < 50
        |      THEN substr(props, 1, 4) ELSE '' END AS payload
        |FROM events ORDER BY event_id""".stripMargin,
    "q_selector_cases" ->
      """SELECT event_id,
        | CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
        |       AND CAST(json_extract_string(props, '$.k') AS BIGINT) < 70
        |      THEN props
        |      WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
        |      THEN substr(props, 3, 4)
        |      ELSE '' END AS payload,
        | substr(props,
        |   CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS INT) + 1,
        |   4) AS payload_dyn
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
