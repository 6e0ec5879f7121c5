package graft.queries

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming parity queries: the streaming engine must reproduce the batch
  * answer on a finite replay of the events table. q80 runs a real
  * Structured Streaming query (file source → tumbling event-time agg →
  * memory sink) and is oracle-checked against the same SQL as the batch
  * tumbling window — streaming vs DuckDB batch equality.
  */
object Streaming {
  import Exact.sqlSumExact

  val all: Seq[(String, Q)] = Seq(

    "q80_stream_tumbling" -> Q(
      (s, dir) => {
        import s.implicits._
        val streamed = EventStreams.tumblingCounts(EventStreams.readEventStream(s, dir))
        EventStreams.runToMemory(s, streamed)
          .orderBy($"w_start", $"event_type")
          .limit(500)
      },
      s"""SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type LIMIT 500""".stripMargin),
  )
}
