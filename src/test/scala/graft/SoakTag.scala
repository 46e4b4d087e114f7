package graft

/** Tag for long-running randomized/racing soak tests: exclude for the
  * quick iteration tier (`sbt "testOnly * -- -l graft.Soak"`); the
  * FULL suite (no exclusion) remains the gate. */
object SoakTag extends org.scalatest.Tag("graft.Soak")
