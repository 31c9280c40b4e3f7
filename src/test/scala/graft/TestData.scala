package graft

/** Locates the driver-generated testdata parquet root for specs that
  * read the gate corpus (mirrors how Verify/Bench take the dir from
  * the command line / env rather than a baked-in path). Overridable
  * via sysprop `graft.testdata` or env `GRAFT_TESTDATA`; specs
  * `assume(TestData.available(...))` so the suite cancels cleanly —
  * instead of failing or silently testing the wrong corpus — on a
  * machine without this layout.
  */
object TestData {
  val root: String =
    sys.props.get("graft.testdata")
      .orElse(sys.env.get("GRAFT_TESTDATA"))
      .getOrElse("/root/testdata")

  /** Directory for scale factor `s`, e.g. `sf("0.01")`. */
  def sf(s: String): String = s"$root/sf$s"

  def available(s: String): Boolean =
    new java.io.File(sf(s)).isDirectory
}
