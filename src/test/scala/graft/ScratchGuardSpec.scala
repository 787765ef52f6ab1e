package graft

import org.scalatest.funsuite.AnyFunSuite

class ScratchGuardSpec extends AnyFunSuite {
  test("tmpfs scratch requires headroom, writability, and existence") {
    val dir = java.nio.file.Files.createTempDirectory("shm-probe").toFile
    try {
      // a real writable dir on a filesystem with ample free space qualifies
      assume(dir.getUsableSpace >= SparkEntry.TmpfsMinFreeBytes)
      assert(SparkEntry.tmpfsUsable(dir))
      // a missing path never qualifies
      assert(!SparkEntry.tmpfsUsable(new java.io.File(dir, "nope")))
      // a plain file never qualifies
      val f = new java.io.File(dir, "file")
      java.nio.file.Files.writeString(f.toPath, "x")
      assert(!SparkEntry.tmpfsUsable(f))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
