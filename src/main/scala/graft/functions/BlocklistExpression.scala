package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist counting via Aho-Corasick — the curation
  * primitive behind banned-term filtering (C4-style word blocklists,
  * contamination canaries, policy phrase lists). Returns a
  * pattern-indexed array of occurrence counts in ONE pass over the
  * text, independent of the pattern count — the naive spelling is |P|
  * separate `instr`/`replace` scans, which is the difference between
  * O(n) and O(n·|P|) per row when the blocklist has thousands of
  * entries.
  *
  * Count semantics are contractually identical to SQL's
  * `(length(t) - length(replace(t, p, ''))) / length(p)` per pattern:
  * greedy left-to-right NON-overlapping occurrences, each pattern
  * counted independently (patterns may overlap each other freely).
  * That makes the whole result DuckDB-replayable, so the t32 gate
  * hash-compares every count. The automaton reports every match
  * (overlapping included); the greedy filter is one `lastEnd`
  * comparison per match because fixed-length matches arrive in start
  * order.
  *
  * The automaton (goto trie + BFS failure links + flattened dictionary-
  * suffix outputs) is built lazily per deserialized instance — bounded
  * driver/executor state of O(Σ|p|) like the PQ LUTs, amortized over
  * every row the task scans. Matching walks UTF-16 code units; counts
  * agree with any engine for patterns without surrogate-split edges
  * (the gated fixture is ASCII).
  *
  * Codegen: one virtual call per row on a plan-referenced machine (the
  * Morton `addReferenceObj` shape) — no boxing, stays inside
  * whole-stage codegen.
  */
case class BlocklistCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "blocklist needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "blocklist patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_blocklist"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")

  @transient private lazy val machine = new AhoCorasick(patterns.toArray)

  /** One-pass count of every pattern; called from both eval paths. */
  def count(text: UTF8String): ArrayData =
    new GenericArrayData(machine.countGreedy(text.toString))

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklist", this, classOf[BlocklistCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Classic Aho-Corasick automaton over UTF-16 code units with greedy
  * non-overlapping counting (the `replace()` contract — see
  * [[BlocklistCounts]]). Thread-safe after construction (matching is
  * read-only); construction is single-threaded per instance.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  // trie: children as per-node hash maps (arbitrary alphabet), failure
  // links, and the flattened dictionary-suffix output list per node so
  // matching never walks the failure chain
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val nodePattern = scala.collection.mutable.ArrayBuffer(-1)

  for (p <- 0 until patterns.length) {
    var node = 0
    var i = 0
    while (i < patterns(p).length) {
      val c = patterns(p).charAt(i)
      val next = children(node).get(c)
      if (next == null) {
        children += new java.util.HashMap[Character, Integer]()
        nodePattern += -1
        children(node).put(c, children.length - 1)
        node = children.length - 1
      } else node = next
      i += 1
    }
    require(nodePattern(node) < 0,
      s"duplicate blocklist pattern: '${patterns(p)}'")
    nodePattern(node) = p
  }

  private val n = children.length
  private val fail = new Array[Int](n)
  // outputs(node) = pattern ids ending at node (own + dict-suffix chain)
  private val outputs: Array[Array[Int]] = {
    val out = Array.fill(n)(Array.empty[Int])
    val queue = new java.util.ArrayDeque[Int]()
    val rootIt = children(0).entrySet().iterator()
    while (rootIt.hasNext) queue.add(rootIt.next().getValue)
    if (nodePattern(0) >= 0) out(0) = Array(nodePattern(0))
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (!queue.isEmpty) {
      val u = queue.poll()
      order += u
      val it = children(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        // fail(v): longest proper suffix of path(v) that is a trie path
        var f = fail(u)
        var hop = children(f).get(e.getKey)
        while (hop == null && f != 0) { f = fail(f); hop = children(f).get(e.getKey) }
        fail(e.getValue) = if (hop == null || hop == e.getValue) 0 else hop
        queue.add(e.getValue)
      }
    }
    // BFS order guarantees fail(u) is finalized before u
    for (u <- order) {
      val own = if (nodePattern(u) >= 0) Array(nodePattern(u)) else Array.empty[Int]
      out(u) = own ++ out(fail(u))
    }
    out
  }

  /** Greedy non-overlapping per-pattern counts (see class doc). */
  def countGreedy(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    val lastEnd = new Array[Int](patterns.length)
    java.util.Arrays.fill(lastEnd, 0)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var next = children(node).get(c)
      while (next == null && node != 0) { node = fail(node); next = children(node).get(c) }
      node = if (next == null) 0 else next
      val out = outputs(node)
      var k = 0
      while (k < out.length) {
        val p = out(k)
        val start = i - patterns(p).length + 1
        if (start >= lastEnd(p)) { counts(p) += 1; lastEnd(p) = i + 1 }
        k += 1
      }
      i += 1
    }
    counts
  }
}
