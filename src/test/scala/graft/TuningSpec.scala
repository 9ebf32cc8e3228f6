package graft

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {
  import graft.util.Tuning

  test("bench posture is unchanged at small scale: sf dirs stay at the cores floor") {
    // the derived default must reproduce the historical 32-partition
    // posture at every driver-run scale, or BENCH_r* stops composing
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
      assert(Tuning.shufflePartitions(d, 32) == 32, d)
    // the 4-core default posture holds too: sf0.1's ~7 derived
    // partitions sit inside the two-wave hysteresis, so the historical
    // 4-partition bench numbers stay comparable at ANY core count
    assert(Tuning.shufflePartitions("/root/testdata/sf0.1", 4) == 4)
    // a corpus-less (relational-only) dir degrades to the floor too
    assert(Tuning.corpusBytes("/nonexistent") == 0L)
    assert(Tuning.shufflePartitions("/nonexistent", 32) == 32)
  }

  test("partition count scales linearly with corpus bytes past the floor, in whole waves") {
    val b = Tuning.corpusBytes("/root/testdata/sf0.1")
    assert(b > 0)
    // a synthetic 100x of sf0.1's bytes lands near the measured
    // 512-partition sf10 floor (the r11/r12 q31 experiments): past the
    // two-wave hysteresis the formula is ceil(bytes / 200 KiB) rounded
    // up to a multiple of cores
    val p100 = {
      val byData =
        (b * 100 + Tuning.CorpusBytesPerPartition - 1) / Tuning.CorpusBytesPerPartition
      assert(byData > 64) // the data term engages
      (((byData + 31) / 32) * 32).toInt
    }
    assert(p100 >= 512 && p100 <= 1024, p100.toString)
    assert(p100 % 32 == 0)
  }
}
