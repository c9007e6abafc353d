package graft.core

/** Driver-side union-find whose root is always the MINIMUM id of the
  * component (`parent(maxRoot) := minRoot` on every link), so `find(x)`
  * equals the min-label the distributed connected-components loop
  * converges to — the two paths of `Dedup.clusterCandidates` and
  * `Dbscan.dbscan` are spec-pinned equal through this invariant.
  *
  * Ids are compared through [[Comparable]] — every Spark external atomic
  * type (java.lang numbers, String, Timestamp, BigDecimal) qualifies, and
  * the ordering matches Spark's `min`/`least` on those types.
  */
final class MinRootUnionFind {
  private val parent = new java.util.HashMap[Any, Any]()

  private def lt(a: Any, b: Any): Boolean =
    a.asInstanceOf[Comparable[Any]].compareTo(b) < 0

  def min(a: Any, b: Any): Any = if (lt(a, b)) a else b

  /** Root of x's component (path halving). x must have been union'd. */
  def find(x: Any): Any = {
    var r = x
    while (parent.get(r) != r) { parent.put(r, parent.get(parent.get(r))); r = parent.get(r) }
    r
  }

  def union(a: Any, b: Any): Unit = {
    if (parent.get(a) == null) parent.put(a, a)
    if (parent.get(b) == null) parent.put(b, b)
    val (ra, rb) = (find(a), find(b))
    if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
  }

  def contains(x: Any): Boolean = parent.containsKey(x)
  def ids: java.util.Set[Any] = parent.keySet()
}
