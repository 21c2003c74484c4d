package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.LruMemo

/** The bounded memo behind `TextDedup.dedupClustersShared`: overflow must
  * evict exactly the least-recently-used entry, never flush everything
  * (a full flush would re-pay every consumer's cluster compute at once).
  */
class LruMemoSpec extends AnyFunSuite {

  test("overflow evicts only the least-recently-used entry") {
    val memo = new LruMemo[String](3)
    Seq("a", "b", "c").foreach(k => memo.putIfAbsent(k, k.toUpperCase))
    assert(memo.size == 3)
    memo.putIfAbsent("d", "D")
    assert(memo.size == 3, "bound must hold after overflow")
    assert(memo.get("a").isEmpty, "oldest entry evicted")
    assert(memo.get("b").contains("B") && memo.get("c").contains("C") &&
      memo.get("d").contains("D"), "all other entries survive — no flush")
  }

  test("get bumps recency, so a recently-read old entry survives overflow") {
    val memo = new LruMemo[String](3)
    Seq("a", "b", "c").foreach(k => memo.putIfAbsent(k, k.toUpperCase))
    assert(memo.get("a").contains("A"))
    memo.putIfAbsent("d", "D")
    assert(memo.get("a").contains("A"), "read entry was most-recent, kept")
    assert(memo.get("b").isEmpty, "unread oldest entry evicted instead")
  }

  test("putIfAbsent keeps the first value and reports it to the loser") {
    val memo = new LruMemo[String](3)
    assert(memo.putIfAbsent("k", "first") == "first")
    assert(memo.putIfAbsent("k", "second") == "first")
    assert(memo.get("k").contains("first"))
    assert(memo.size == 1)
  }

  test("clear empties the memo") {
    val memo = new LruMemo[String](3)
    memo.putIfAbsent("a", "A")
    memo.clear()
    assert(memo.size == 0 && memo.get("a").isEmpty)
  }

  test("sustained churn never exceeds the bound and keeps the hot key") {
    val memo = new LruMemo[String](4)
    memo.putIfAbsent("hot", "H")
    (0 until 50).foreach { i =>
      memo.putIfAbsent(s"k$i", i.toString)
      assert(memo.get("hot").contains("H"), s"hot key evicted at $i")
      assert(memo.size <= 4)
    }
  }
}
