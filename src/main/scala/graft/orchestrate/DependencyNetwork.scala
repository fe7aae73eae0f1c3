package graft.orchestrate

import scala.collection.mutable

/** Dependency DAG over migration ids — reference
  * /root/reference/dependency_network.go:14-162 (Add/Resolve/All/Network/
  * AddGroup/GetGroup) with `Validate()` = undefined-dependency check +
  * Tarjan strongly-connected-components cycle detection (the reference pulls
  * in github.com/looplab/tarjan for this; we implement Tarjan directly).
  *
  * This is driver-side orchestration state, deliberately NOT a Catalyst
  * concern (SURVEY.md §4): it orders whole Spark actions, each of which is
  * already distributed.
  */
final class DependencyNetwork {
  private val edges = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
  private val groups = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]

  /** Add `name` depending on `deps` — reference dependency_network.go:24-38. */
  def add(name: String, deps: Seq[String]): Unit = {
    val s = edges.getOrElseUpdate(name, mutable.LinkedHashSet.empty)
    s ++= deps
  }

  /** reference dependency_network.go:40-49. */
  def resolve(name: String): Seq[String] =
    edges.get(name).map(_.toSeq).getOrElse(Nil)

  def all(): Seq[String] = edges.keys.toSeq

  def network(): Map[String, Seq[String]] =
    edges.map { case (k, v) => k -> v.toSeq }.toMap

  /** reference dependency_network.go:124-143 (AddGroup/GetGroup). */
  def addGroup(group: String, jobIds: Seq[String]): Unit =
    groups.getOrElseUpdate(group, mutable.LinkedHashSet.empty) ++= jobIds

  def getGroup(group: String): Seq[String] =
    groups.get(group).map(_.toSeq).getOrElse(Nil)

  /** Undefined-dep + cycle check — reference dependency_network.go:94-122. */
  def validate(): Either[Seq[String], Unit] = {
    val errs = mutable.ListBuffer.empty[String]
    val defined = edges.keySet
    for ((node, deps) <- edges; d <- deps if !defined.contains(d))
      errs += s"dependency $d of $node is not defined"
    for (scc <- tarjanSCCs() if scc.size > 1)
      errs += s"cycle detected: ${scc.mkString(" -> ")}"
    // self-loop = 1-element SCC with a self edge
    for ((n, deps) <- edges if deps.contains(n)) errs += s"cycle detected: $n -> $n"
    if (errs.isEmpty) Right(()) else Left(errs.toSeq)
  }

  /** Topological layers: every id in layer i depends only on ids in layers
    * < i. Drives the two-phase barrier execution (anser.go:86-129 analog):
    * each layer is a batch of independent Spark actions. */
  def topoLayers(): Seq[Seq[String]] = {
    validate().left.foreach(errs =>
      throw new IllegalStateException(errs.mkString("; ")))
    val remaining = mutable.LinkedHashMap(
      edges.toSeq.map { case (k, v) => k -> mutable.Set(v.toSeq: _*) }: _*)
    val layers = mutable.ListBuffer.empty[Seq[String]]
    while (remaining.nonEmpty) {
      val ready = remaining.collect { case (k, v) if v.isEmpty => k }.toSeq
      if (ready.isEmpty) throw new IllegalStateException(
        s"deadlock among: ${remaining.keys.mkString(", ")}")
      layers += ready
      ready.foreach(remaining.remove)
      remaining.values.foreach(_ --= ready)
    }
    layers.toSeq
  }

  /** Iterative Tarjan SCC (recursion-free so deep chains can't blow the
    * driver stack). */
  private def tarjanSCCs(): Seq[Seq[String]] = {
    val index = mutable.Map.empty[String, Int]
    val low = mutable.Map.empty[String, Int]
    val onStack = mutable.Set.empty[String]
    val stack = mutable.Stack.empty[String]
    val sccs = mutable.ListBuffer.empty[Seq[String]]
    var counter = 0

    for (root <- edges.keys if !index.contains(root)) {
      // explicit work stack: (node, iterator over remaining deps)
      val work = mutable.Stack.empty[(String, Iterator[String])]
      def push(n: String): Unit = {
        index(n) = counter; low(n) = counter; counter += 1
        stack.push(n); onStack += n
        work.push((n, edges.getOrElse(n, mutable.LinkedHashSet.empty)
          .iterator.filter(edges.contains)))
      }
      push(root)
      while (work.nonEmpty) {
        val (n, it) = work.top
        if (it.hasNext) {
          val m = it.next()
          if (!index.contains(m)) push(m)
          else if (onStack(m)) low(n) = math.min(low(n), index(m))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val parent = work.top._1
            low(parent) = math.min(low(parent), low(n))
          }
          if (low(n) == index(n)) {
            val scc = mutable.ListBuffer.empty[String]
            var m = ""
            while ({ m = stack.pop(); onStack -= m; scc += m; m != n }) ()
            sccs += scc.toSeq
          }
        }
      }
    }
    sccs.toSeq
  }
}
