package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  test("siblingSfDir derives the 10×-smaller SF for any numeric suffix") {
    assert(Bench.siblingSfDir("/root/testdata/sf0.1").contains("/root/testdata/sf0.01"))
    assert(Bench.siblingSfDir("/root/testdata/sf0.01").contains("/root/testdata/sf0.001"))
    assert(Bench.siblingSfDir("/root/testdata/sf1").contains("/root/testdata/sf0.1"))
    assert(Bench.siblingSfDir("/root/testdata/sf10/").contains("/root/testdata/sf1"))
    assert(Bench.siblingSfDir("sf0.1").contains("sf0.01"))
    assert(Bench.siblingSfDir("/tmp/nodigits").isEmpty)
    assert(Bench.siblingSfDir("/tmp/sf").isEmpty)
  }
}
