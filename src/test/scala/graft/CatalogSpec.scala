package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Enforces the "QUERIES.md can't drift" claim: the committed catalog
  * must equal what the generator renders from the live registry.
  */
class CatalogSpec extends AnyFunSuite {
  test("QUERIES.md matches the registry") {
    val committed = Files.readString(Paths.get("QUERIES.md"))
    assert(committed == graft.tools.Catalog.render,
      "QUERIES.md is stale — run: sbt 'runMain graft.tools.Catalog'")
  }
}
