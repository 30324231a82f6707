package graft.datagen

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SuffixOverlap

/** Pure-function properties of the planted corpus generator — the ground
  * truth the recall/precision gates score against, so its layout invariants
  * need their own locks (the pipeline specs only check that the pipeline
  * FINDS what is planted, not that nothing unplanted exists).
  *
  * Layout: GroupSize = 5, gtype = groupId % 10 — group 6/7 near-dups,
  * group 8 exact dups (slots 0-1), group 9 overlap pair (slots 0-1) +
  * hard negatives (slots 2-3), everything else filler.
  */
class PagesGenSpec extends AnyFunSuite {
  private val seed = 42L

  test("gtype-9 overlap pages share a >=256-char run; their hard negatives don't") {
    // group 9 is the first gtype-9 group: ids 45..49
    val a = PagesGen.textOf(seed, 45L)
    val b = PagesGen.textOf(seed, 46L)
    assert(SuffixOverlap.longestCommonSubstring(a, b) >= 256,
      "planted overlap pair lost its shared run")
    val neg = PagesGen.textOf(seed, 47L)
    assert(SuffixOverlap.longestCommonSubstring(a, neg) < 256,
      "hard negative shares a long run with the overlap pair")
  }

  test("RNG streams are keyspace-separated: no unplanted long overlap at colliding ids") {
    // Under the old id-offset scheme, overlap page 46's "own" words drew
    // rng(seed, 46 + 1000000, 2) — the SAME stream as the cluster base of
    // dup group 1000046 (gtype 6), whose slot-0 page is id 1000046*5 =
    // 5000230: word-identical prefixes between unrelated pages that the
    // truth table knows nothing about, scored as spurious false positives
    // at multi-million-row scale. The dedicated b-streams are provably
    // disjoint; this locks the concrete collision pair.
    val overlapPage = PagesGen.textOf(seed, 46L)
    val farClusterBase = PagesGen.textOf(seed, 5000230L)
    assert(SuffixOverlap.longestCommonSubstring(overlapPage, farClusterBase) < 256,
      "unplanted >=256-char overlap between unrelated pages (RNG keyspace collision)")
    // and the former filler collision (id + 3000000 on the same stream):
    // filler id 6 (group 1, gtype 1) drew (3000006, 2) — the base stream of
    // gtype-6 dup group 3000006, whose slot-0 page is id 15000030
    val filler = PagesGen.textOf(seed, 6L)
    assert(SuffixOverlap.longestCommonSubstring(filler, PagesGen.textOf(seed, 15000030L)) < 256)
  }

  test("exact-dup groups plant byte-identical text; near-dup groups plant high-overlap variants") {
    // group 8 (gtype 8, ids 40-44): slots 0-1 byte-identical
    val texts8 = PagesGen.dupSlots(8L).map(s => PagesGen.textOf(seed, 40L + s))
    assert(texts8.size >= 2 && texts8.distinct.size == 1, "gtype-8 dups must be byte-identical")
    // group 6 (gtype 6, ids 30-34): same base, cosmetically mutated — never
    // byte-identical to slot 0 but sharing most normalized tokens
    val texts6 = PagesGen.dupSlots(6L).map(s => PagesGen.textOf(seed, 30L + s))
    assert(texts6.size >= 2 && texts6.distinct.size > 1,
      "gtype-6 variants should differ cosmetically")
    def norm(t: String): Set[String] =
      t.toLowerCase.replaceAll("[\\p{Punct}]", " ").split("\\s+").filter(_.nonEmpty).toSet
    val t0 = norm(texts6.head)
    texts6.tail.foreach { t =>
      val ts = norm(t)
      val j = (t0 & ts).size.toDouble / (t0 | ts).size
      assert(j > 0.4, s"near-dup variant drifted too far (normalized token jaccard $j)")
    }
  }
}
