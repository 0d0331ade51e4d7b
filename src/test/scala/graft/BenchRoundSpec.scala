package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.resolveRound]]'s source precedence — the round-slot
  * selection that twice claimed the NEXT round's BENCH_r slot at the
  * round boundary (r13/r14 recurrences). The invariant: any rerun
  * within one round, including the boundary bench that fires after the
  * judge writes the closing round's verdict, resolves the SAME slot.
  */
class BenchRoundSpec extends AnyFunSuite {

  private val progress13 = Seq(
    """{"ts": 1.0, "round": 12, "turns": 4}""",
    """{"ts": 2.0, "round": 13, "turns": 0}""",
    """{"ts": 3.0, "round": 13, "turns": 9}""")
  private val verdict13 = Some("# VERDICT — Round 13\n\n**Headline**")
  private val files = Seq("BENCH_r12.json", "BENCH_r13.json", "README.md")

  test("driver-exported SPARK_GRAFT_ROUND is authoritative") {
    assert(Bench.resolveRound(Some("7"), progress13, verdict13, files)
      == Some(7))
    assert(Bench.resolveRound(Some(" 7 "), Nil, None, Nil) == Some(7))
  }

  test("the boundary bench run resolves the CLOSING round: PROGRESS's " +
      "last entry outranks the already-written verdict header") {
    // The exact r14-early recurrence: the judge has written 'Round 13',
    // so verdict+1 says 14 — but PROGRESS still ends in a round-13
    // entry, and the record being written belongs to round 13.
    assert(Bench.resolveRound(None, progress13, verdict13, files)
      == Some(13))
  }

  test("mid-round rerun is slot-stable under every source") {
    // Mid round 14: PROGRESS has round-14 entries, verdict says 13.
    val midProgress = progress13 :+
      """{"ts": 4.0, "round": 14, "turns": 2}"""
    assert(Bench.resolveRound(None, midProgress, verdict13, files)
      == Some(14))
    // Without PROGRESS, verdict+1 gives the same mid-round answer.
    assert(Bench.resolveRound(None, Nil, verdict13, files) == Some(14))
  }

  test("max(BENCH_r*)+1 is the last resort; empty inputs resolve None") {
    assert(Bench.resolveRound(None, Nil, None, files) == Some(14))
    assert(Bench.resolveRound(None, Nil, None, Seq("README.md")) == None)
    assert(Bench.resolveRound(None, Nil, None, Nil) == None)
  }

  test("malformed sources fall through instead of claiming a slot") {
    assert(Bench.resolveRound(Some("next"), Seq("{}"),
      Some("no header here"), files) == Some(14))
  }

  test("an inferred round never overwrites an existing slot; the env " +
      "override always may") {
    // The mirror of the verdict+1 early-claim: a new round's first bench
    // fires before the driver appends that round's first PROGRESS entry,
    // so PROGRESS still names the CLOSED round — writing would clobber
    // the closing round's committed record. Inferred rounds may claim
    // EMPTY slots only.
    assert(!Bench.slotWriteAllowed(envRound = false, slotExists = true))
    assert(Bench.slotWriteAllowed(envRound = false, slotExists = false))
    assert(Bench.slotWriteAllowed(envRound = true, slotExists = true))
    assert(Bench.slotWriteAllowed(envRound = true, slotExists = false))
  }
}
