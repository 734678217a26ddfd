package graft.core

/** Driver-side union-find over a BOUNDED collected edge list — the
  * small-graph fast path shared by the dedup cluster assignment
  * ([[graft.dedup.Dedup.nearDupClusters]]) and the co-purchase
  * connected components ([[graft.graph.Components]]): below
  * [[LocalMaxEdges]] the distributed min-label loop's per-round job
  * scheduling (3+ jobs × diameter rounds) costs orders of magnitude
  * more than one O(E·α) local pass, and the collected list is ≈16 MB
  * at the bound. The distributed loop stays behind the gate and
  * engages past it — the threshold is a scheduling trade, never a
  * correctness cap.
  */
object UnionFind {

  /** Edge-count bound under which connected components run locally. */
  val LocalMaxEdges = 1000000L

  /** Path-halving union-find with min-label roots: returns
    * `(member, root)` for every PARTICIPANT, where the root is the
    * component's minimum member id — identical labels to the
    * distributed min-label fixpoint. */
  def components(es: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins = min-member component labels
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    val members = es.flatMap(e => Seq(e._1, e._2)).distinct
    members.map(m => (m, find(m)))
  }
}
