package graft.table

/** Typed logical-conflict taxonomy for multi-writer commits (the public
  * Delta concurrency-exception surface; semantics per the Delta Lake VLDB
  * 2020 paper §3.2 — the machinery running beneath the reference's
  * concurrent gunicorn workers, docker-compose.yml:4-13 / api.py:102,107).
  *
  * Every class extends `java.util.ConcurrentModificationException` (as
  * Delta's do) so pre-existing catch sites keep working; the subtype tells
  * the caller WHAT logically conflicted:
  *
  *  - [[ConcurrentAppendException]]       — the winner added files this
  *    transaction's read (predicate or whole-table) should have seen.
  *  - [[ConcurrentDeleteReadException]]   — the winner removed files this
  *    transaction read.
  *  - [[ConcurrentDeleteDeleteException]] — the winner removed files this
  *    transaction also removes.
  *  - [[MetadataChangedException]]        — the winner changed table
  *    metadata (schema / partitioning / properties).
  *  - [[ProtocolChangedException]]        — the winner upgraded the
  *    protocol.
  *
  * A lost race whose winners trigger NONE of these classifications is not
  * a logical conflict at all: the transaction rebases onto the new head and
  * retries the same actions (disjoint-file DML + appends all land).
  */
class GraftConcurrentWriteException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

final class ConcurrentAppendException(msg: String)
    extends GraftConcurrentWriteException(msg)

final class ConcurrentDeleteReadException(msg: String)
    extends GraftConcurrentWriteException(msg)

final class ConcurrentDeleteDeleteException(msg: String)
    extends GraftConcurrentWriteException(msg)

final class MetadataChangedException(msg: String)
    extends GraftConcurrentWriteException(msg)

final class ProtocolChangedException(msg: String)
    extends GraftConcurrentWriteException(msg)

/** What a transaction READ and intends to REMOVE — the inputs to conflict
  * classification after a lost commit race.
  *
  *  - `readWholeTable`: the txn's result depends on every row (a MERGE
  *    with no source-key pruning, an INSERT OVERWRITE, a RESTORE) — any
  *    concurrent append invalidates it.
  *  - `readPredicate`: file-level predicate scoping the read (a DELETE's
  *    WHERE, a pruned MERGE's source-key range). Appends whose stats may
  *    match it conflict; provably-disjoint appends do not.
  *  - `readFiles`: paths whose CONTENT the txn read (pruned candidates,
  *    rewrite inputs). A winner removing one invalidates what we read.
  *  - `removes`: paths this txn's commit removes. Two writers removing the
  *    same file are two conflicting row-level operations.
  *
  * OPTIMIZE-style reorganizations pass `readWholeTable = false` and no
  * predicate: they reorganize exactly `readFiles`, so appends never
  * conflict with them (Delta's dataChange=false leniency).
  */
private[table] final case class TxnInfo(
    readWholeTable: Boolean,
    readPredicate: Option[org.apache.spark.sql.Column],
    readFiles: Set[String],
    removes: Set[String])
