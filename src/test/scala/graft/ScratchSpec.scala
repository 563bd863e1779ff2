package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scratch-dir recursive delete (round-12 advisory, pinned
  * round-13): it must unlink a symlink itself and NEVER recurse through
  * it — `listFiles` on a symlinked directory enumerates the TARGET's
  * children, so an unpinned rm would delete live data a scratch dir
  * merely pointed at.
  */
class ScratchSpec extends AnyFunSuite {
  test("rm unlinks a symlinked directory without touching its target's contents") {
    val target = java.nio.file.Files.createTempDirectory("graft-scratch-target")
    val precious = target.resolve("precious.txt")
    java.nio.file.Files.writeString(precious, "keep me")
    val scratch = java.nio.file.Files.createTempDirectory("graft-scratch-dir")
    java.nio.file.Files.writeString(scratch.resolve("own.txt"), "scratch-owned")
    val link = scratch.resolve("link-to-target")
    java.nio.file.Files.createSymbolicLink(link, target)

    graft.util.Scratch.rm(scratch.toFile)

    assert(!java.nio.file.Files.exists(scratch), "scratch dir must be gone")
    assert(java.nio.file.Files.exists(precious),
      "rm recursed through the symlink and deleted the target's contents")
    // cleanup
    java.nio.file.Files.delete(precious)
    java.nio.file.Files.delete(target)
  }

  test("rm still removes real nested content") {
    val scratch = java.nio.file.Files.createTempDirectory("graft-scratch-nest")
    val sub = java.nio.file.Files.createDirectory(scratch.resolve("sub"))
    java.nio.file.Files.writeString(sub.resolve("f.txt"), "x")
    graft.util.Scratch.rm(scratch.toFile)
    assert(!java.nio.file.Files.exists(scratch))
  }
}
