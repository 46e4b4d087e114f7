package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chains, cliques, and singletons-by-edge resolve to min-id components") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L))
      .toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // default path (driver end-game) and fully distributed path agree
    for (localSolve <- Seq(4L << 20, 0L)) {
      val got = ConnectedComponents(edges, localSolveEdgeLimit = localSolve)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"localSolveEdgeLimit=$localSolve")
    }
  }

  test("self-loop-only nodes appear in the output as singletons") {
    // 5 only ever appears as (5,5); 1-2 is a real component; 2 also
    // carries a self-loop that must not perturb its label
    val edges = Seq((1L, 2L), (5L, 5L), (2L, 2L)).toDF("a", "b")
    for (localSolve <- Seq(4L << 20, 0L)) {
      val got = ConnectedComponents(edges, localSolveEdgeLimit = localSolve)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 5L),
        s"localSolveEdgeLimit=$localSolve")
    }
    // degenerate graph: ONLY self-loops — no contraction round runs,
    // but every id still comes back mapped to itself
    val loops = Seq((7L, 7L), (8L, 8L)).toDF("a", "b")
    val lgot = ConnectedComponents(loops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lgot === Map(7L -> 7L, 8L -> 8L))
  }

  test("a long path converges in a bounded round count; insufficient maxIter fails loudly") {
    // HIGH-DIAMETER adversary: a 200-node chain (diameter 199). The
    // large-star/small-star alternation must collapse it in O(log n)
    // rounds — a per-round-constant-progress scheme would need ~n
    // rounds and trip maxIter. (localSolveEdgeLimit = 0 forces the
    // distributed loop under test.)
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val res = ConnectedComponents.applyWithRounds(path, numPartitions = 4,
      localSolveEdgeLimit = 0)
    val got = res.components.collect()
    assert(got.length === 200 && got.forall(_.getLong(1) === 1L))
    assert(res.rounds <= 2 * 8 + 2, // 2·⌈log2 200⌉ + slack
      s"200-chain took ${res.rounds} rounds — round count not log-bounded")
    // zigzag ids (adjacent pairs swapped along the chain) defeat
    // monotone-id shortcuts; still converges within the log bound but
    // maxIter=1 must fail loudly instead of returning partial clusters
    val zig = (0L until 63L).map { p =>
      def id(pos: Long) = if (pos % 2 == 0) pos + 2 else pos // 2,1,4,3,6,5...
      (id(p), id(p + 1))
    }.toDF("a", "b")
    val zres = ConnectedComponents.applyWithRounds(zig, numPartitions = 4,
      localSolveEdgeLimit = 0)
    val zgot = zres.components.collect()
    assert(zgot.length === 64 && zgot.forall(_.getLong(1) === 1L))
    assert(zres.rounds <= 2 * 6 + 2,
      s"64-zigzag took ${zres.rounds} rounds")
    intercept[IllegalArgumentException] {
      ConnectedComponents(zig, maxIter = 1, numPartitions = 4,
        localSolveEdgeLimit = 0)
    }
  }

  test("round count grows logarithmically with chain length") {
    // doubling the diameter must add ~constant rounds, not double them
    def roundsFor(n: Long): Int = {
      val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
      val res = ConnectedComponents.applyWithRounds(chain, numPartitions = 4,
        localSolveEdgeLimit = 0)
      val out = res.components.collect()
      assert(out.length === n && out.forall(_.getLong(1) === 1L), s"n=$n")
      res.rounds
    }
    val r64 = roundsFor(64)
    val r256 = roundsFor(256)
    assert(r256 <= r64 + 5,
      s"4x the diameter cost ${r256 - r64} extra rounds (64: $r64, 256: $r256)" +
        " — contraction is not halving the chain per round")
  }

  test("distributed rounds + driver end-game compose on a mixed graph") {
    // localSolveEdgeLimit = 30: the 64-node zigzag chain (126 sym
    // edges) contracts distributed for a round or two, then the
    // shrunken remainder finishes in the driver union-find — both code
    // paths in ONE run, result identical to the pure paths
    val zig = (0L until 63L).map { p =>
      def id(pos: Long) = if (pos % 2 == 0) pos + 2 else pos
      (id(p), id(p + 1))
    }.toDF("a", "b")
    val got = ConnectedComponents(zig, numPartitions = 4,
      localSolveEdgeLimit = 30).collect()
    assert(got.length === 64 && got.forall(_.getLong(1) === 1L))
  }
}
