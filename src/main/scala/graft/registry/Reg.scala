package graft.registry

/** Duplicate-key-safe constructor for the per-domain registries.
  *
  * A Scala `Map(...)` literal silently keeps the LAST binding for a
  * repeated key — in round 9 two repeated names (`text_source_overlap`,
  * `events_decay_score`) shadowed the older operators' query/oracle
  * rows without any compile- or test-time signal (VERDICT r9 #1). Every
  * registry map is now built through `strict`, which fails object
  * initialization (and therefore every test and both driver mains) the
  * moment a key appears twice, naming the offenders.
  */
object Reg {
  def strict[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty,
      s"duplicate registry keys would silently shadow: ${dups.toSeq.sorted.mkString(", ")}")
    pairs.toMap
  }
}
