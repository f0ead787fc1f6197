package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Pins the min-label propagation contract: correct components on branchy
  * graphs, and a LOUD failure (never silent partial labels) when a
  * component's min-label path exceeds the round cap.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("labels every vertex with its component minimum") {
    import spark.implicits._
    // components {1,2,3,4} (star + edge) and {10, 11}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = ConnectedComponents.minLabel(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("a chain longer than the round cap fails loudly, not partially") {
    import spark.implicits._
    // path graph 0-1-2-...-39: the min label 0 moves one hop per round
    // (plus the free first round), so 12 rounds cannot finish 40 nodes
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.minLabel(chain, maxIters = 12)
    }
    assert(e.getMessage.contains("did not converge"))
    // the same graph converges with a cap past the path length
    val ok = ConnectedComponents.minLabel(chain, maxIters = 45).collect()
    assert(ok.forall(_.getLong(1) == 0L) && ok.length == 40)
  }
}
