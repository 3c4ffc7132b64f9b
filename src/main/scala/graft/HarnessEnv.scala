package graft

/** Shared case-subset parsing for the spike/bench harness mains: a
  * comma-separated env selection validated against the known names,
  * with unknown names and empty selections refused loudly (the ADVICE
  * r18 rule) — one implementation instead of the three per-harness
  * copies TextSpike/LevelsBench/TreeBench had grown (round-19
  * self-review).
  */
object HarnessEnv {

  /** The names `envVar` selects (None = env unset, caller runs all).
    * Unknown names and empty selections (including an env set to
    * whitespace) throw with the full known-name list in the message.
    */
  def selectedNames(
      envVar: String, known: Seq[String]): Option[Set[String]] =
    sys.env.get(envVar).map { raw =>
      val sel = raw.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(sel.nonEmpty,
        s"$envVar selected no cases — unset it or name at least one " +
          s"of: ${known.mkString(", ")}")
      val unknown = sel -- known.toSet
      require(unknown.isEmpty,
        s"unknown $envVar entries: $unknown (known: " +
          s"${known.mkString(", ")})")
      sel
    }

  /** Filter (name, case) pairs by [[selectedNames]]; order preserved. */
  def selectCases[T](
      envVar: String, all: Seq[(String, T)]): Seq[(String, T)] =
    selectedNames(envVar, all.map(_._1)) match {
      case Some(sel) => all.filter(c => sel(c._1))
      case None => all
    }
}
