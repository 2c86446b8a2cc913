package graft.util

/** Prop-gated (graft.bench.stages) stage timer for operator-internal
  * segments — the shared form of `VersionedTable.opStage` /
  * `VersionedQueries.stage` for the text/dedup pipelines: prints
  * `bench-stage <group> <seg> <sec>` so a composition regression names
  * its SEGMENT (shingle pass vs candidate join vs verification), not
  * just the query total. Zero cost when the property is unset; plain
  * text above the bench machine line, never in the JSON. */
object Stages {
  @inline def on: Boolean =
    sys.props.get("graft.bench.stages").contains("true")

  def time[T](group: String, seg: String)(body: => T): T =
    if (on) {
      val t0 = System.nanoTime()
      try body finally println("bench-stage " + group + " " + seg + " " +
        Fmt.fmt("%.3f", (System.nanoTime() - t0) / 1e9))
    } else body
}
