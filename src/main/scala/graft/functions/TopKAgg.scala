package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (sort-value, id) candidate for the bounded top-k aggregate. */
case class KeyVal(cents: Long, id: Long)

/** Bounded top-k as a typed `Aggregator` — the engine face the window
  * form cannot offer: `row_number() OVER (PARTITION BY g ORDER BY …)
  * <= k` shuffles EVERY row to its group's task and sorts the whole
  * group there (on a low-cardinality group key that is exactly the
  * hot-key straggler SurfaceWindowLintSpec bans), while this aggregate
  * keeps a k-bounded buffer per group per PARTITION and merges buffers
  * — map-side partial aggregation caps the shuffle at k rows per group
  * per input partition, and no task ever sorts more than the buffers
  * it merges. This is also the registry's one typed-Aggregator
  * (`functions.udaf`) face — the (b) rung of the custom-function
  * ladder (compose > Expression/TypedColumn > plan rule > RDD).
  *
  * Determinism: the buffer order (cents desc, id asc) is total, and
  * merge is associative + commutative over it, so the result is
  * independent of partitioning — the prerequisite for hash-gating the
  * output against the oracle's window form.
  *
  * The buffer stays a sorted Seq: k is small and fixed (the top-N
  * dashboard read), so the O(k) insert beats heap bookkeeping at this
  * size; a large-k variant would switch to a bounded priority queue.
  */
class TopKAgg(k: Int) extends Aggregator[KeyVal, Seq[KeyVal], Seq[KeyVal]] {

  // construction-time guard: reduce() dereferences b.last under a
  // b.size >= k check, which an accidental k <= 0 turns into .last on
  // an empty Seq at runtime, deep inside a task
  require(k > 0, s"TopKAgg requires k > 0 (got $k)")

  private def ord(kv: KeyVal): (Long, Long) = (-kv.cents, kv.id)
  private val O = Ordering[(Long, Long)]

  override def zero: Seq[KeyVal] = Seq.empty

  override def reduce(b: Seq[KeyVal], a: KeyVal): Seq[KeyVal] =
    // skip the sort when the candidate can't displace anything
    if (b.size >= k && O.gteq(ord(a), ord(b.last))) b
    else ((a +: b).sortBy(ord)).take(k)

  override def merge(b1: Seq[KeyVal], b2: Seq[KeyVal]): Seq[KeyVal] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(r: Seq[KeyVal]): Seq[KeyVal] = r

  override def bufferEncoder: Encoder[Seq[KeyVal]] =
    ExpressionEncoder[Seq[KeyVal]]()

  override def outputEncoder: Encoder[Seq[KeyVal]] =
    ExpressionEncoder[Seq[KeyVal]]()
}

object TopKAgg {
  /** Untyped column form: `topk(k)(struct(cents, id))`. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[KeyVal])
}
