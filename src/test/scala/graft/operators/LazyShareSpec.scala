package graft.operators

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LazyShareSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lazyShare bounds live cache entries and evicts oldest-first") {
    spark.catalog.clearCache()
    val dfs = (0 until 80).map { i =>
      // distinct plans (different literal) so each is its own cache entry
      Dedup.lazyShare(Seq((i.toLong, s"text $i")).toDF("id", "t")
        .filter($"id" >= i - 1000))
    }
    assert(Dedup.lazyShareLive <= 64, "registry must stay bounded")
    // the newest shares are still cached; the oldest were unpersisted
    assert(dfs.takeRight(8).forall(_.storageLevel != StorageLevel.NONE))
    assert(dfs.take(16).forall(_.storageLevel == StorageLevel.NONE),
      "evicted shares must be unpersisted")
    val live = dfs.count(_.storageLevel != StorageLevel.NONE)
    assert(live <= 64, s"at most the cap may stay persisted, got $live")
    // evicted shares still compute correctly from lineage
    assert(dfs.head.count() == 1)
    spark.catalog.clearCache()
  }

  test("re-sharing an equivalent plan touches one entry, not two") {
    spark.catalog.clearCache()
    val mk = () => Seq((1L, "a"), (2L, "b")).toDF("id", "t").filter($"id" > 0)
    val a = Dedup.lazyShare(mk())
    val before = Dedup.lazyShareLive
    val b = Dedup.lazyShare(mk()) // equivalent plan, fresh DataFrame
    assert(Dedup.lazyShareLive == before, "equivalent plan must not add an entry")
    assert(a.storageLevel != StorageLevel.NONE)
    assert(b.storageLevel != StorageLevel.NONE)
    assert(b.count() == 2)
    spark.catalog.clearCache()
  }
}
