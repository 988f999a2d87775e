package graft.engine

/**
 * A ROUTINE, TRANSIENT mutual-exclusion conflict: somebody else's live
 * lock (produce, compaction) or a live concurrent row-level statement is
 * in the way, and the correct reaction is to wait and retry — nothing is
 * corrupt and no answer is wrong.
 *
 * Typed so retry/skip policies match by TYPE, never by message substring
 * (a reworded message must not silently disable a retry):
 * [[MergeCommit]]'s phase-2 patience and statement-level patience, and
 * [[Catalog.maintainTopic]]'s quiet busy-skip all catch exactly this.
 * Extends IllegalStateException so pre-existing catch sites and user code
 * keep working unchanged.
 *
 * Reference analog: the reference serializes concurrent writers in a
 * server-side queue (clients block, `/root/reference/src/
 * ActiveProducerBatchQueue.hpp`); this engine serializes through locks,
 * and this type is what lets waiting paths rebuild that blocking behavior
 * cooperatively.
 */
class LockConflictException(message: String) extends IllegalStateException(message)

/** A concurrent MERGE/UPDATE/DELETE is mid-commit (its intent is live):
  * row-level statements serialize, so the right reaction is bounded
  * patience, same as a lock conflict — hence the subtyping. */
final class ConcurrentMergeException(message: String)
  extends LockConflictException(message)
