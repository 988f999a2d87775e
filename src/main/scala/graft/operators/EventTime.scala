package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Typed event-time convenience layer over the engine's integer time domain.
 *
 * The engine computes on LONG epoch-nanos everywhere (exact integer
 * arithmetic, engine-independent — see [[graft.queries.Q.t]]), but
 * user-facing time queries often want Spark's native TIMESTAMP operators:
 * `window($"t", "10 minutes")`, INTERVAL arithmetic, `date_trunc`,
 * watermarks. These converters bridge the two domains EXACTLY at
 * microsecond resolution (Spark timestamps are micros; sub-microsecond
 * nanos truncate toward negative infinity, i.e. FLOOR — the same value
 * `epoch_ns(ts) // 1000` yields in DuckDB). Floor is the deliberate
 * convention: it buckets pre-1970 instants into the correct earlier
 * microsecond. Note SQL's integer `div` truncates toward ZERO instead, so
 * `ts div 1000` agrees with [[nanosToMicros]] only for ts >= 0 — the whole
 * testdata domain, where EventTimeSpec pins the equivalence; a negative
 * epoch-nano with a sub-microsecond remainder lands one micro apart.
 *
 * Precision note: an epoch-nano value (~1.7e18) exceeds a double's 52-bit
 * mantissa, so `tsNanos / 1000` in double arithmetic would be LOSSY —
 * the conversion goes through decimal division + floor, which is exact
 * and still a codegen-friendly expression chain.
 */
object EventTime {

  private val NanosPerMicro = 1000L

  /** Long epoch-micros of a long epoch-nanos column — exact floor division
    * (decimal, not double: see the precision note above). */
  def nanosToMicros(tsNanos: Column): Column =
    floor(tsNanos.cast(DecimalType(20, 0)) / NanosPerMicro).cast("long")

  /** Native TIMESTAMP view of a long epoch-nanos column (UTC session zone;
    * sub-microsecond truncated). */
  def toTimestamp(tsNanos: Column): Column = timestamp_micros(nanosToMicros(tsNanos))

  /** Long epoch-nanos of a native TIMESTAMP column (micros resolution —
    * the inverse of [[toTimestamp]] on any micros-aligned value). */
  def toNanos(ts: Column): Column = unix_micros(ts) * NanosPerMicro

  /** Tumbling event-time window over a long-nanos column via the native
    * `window()` operator — `tumble($"ts", "10 minutes")` gives the usual
    * struct<start,end> the streaming and batch window family expects. */
  def tumble(tsNanos: Column, width: String): Column =
    window(toTimestamp(tsNanos), width)
}
