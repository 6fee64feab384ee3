package graft.tools

/** Measurement harness for the lossy-codec certificate gates (q120/q126/
  * q146): sweeps the registered tone-parameter grid and prints the SNR
  * distribution, so gate thresholds are chosen from measurement with
  * margin — never invented. No Spark needed: the codecs are plain JVM. */
object CodecTune {
  def main(args: Array[String]): Unit = {
    val rate = 32000
    def snr(out: Array[Int], tone: Array[Int], delay: Int): Double = {
      var sig = 0.0; var err = 0.0
      var i = 0
      while (i < tone.length - 32) {
        val want = tone(i) / 32768.0
        val got = out(delay + i) / 32768.0
        sig += want * want; err += (got - want) * (got - want)
        i += 1
      }
      10.0 * math.log10(sig / math.max(err, 1e-300))
    }
    // q146's exact parameter grid: ns = n_chars % 1500 + 600 (n_chars
    // spans the documents fixture), freq = doc_id % 200 + 200
    val snrs = for (ns <- 600 to 2099 by 107; freq <- 200 to 399 by 23) yield {
      val tone = Array.tabulate(ns)(t =>
        (0.4 * 32768.0 * math.sin(2 * math.Pi * freq * t / rate)).toInt)
      val bytes = graft.multimodal.Mp3L3.encode(rate, Array(tone))
      val dec = graft.multimodal.Mp3L3.decode(bytes)
      require(dec.isDefined, s"ns=$ns freq=$freq failed to decode")
      val nFrames = (ns + 1057 + 1151) / 1152
      require(dec.get.samples(0).length == nFrames * 1152,
        s"ns=$ns freq=$freq wrong length")
      val s = snr(dec.get.samples(0), tone, 1057)
      (ns, freq, s)
    }
    val sorted = snrs.sortBy(_._3)
    println(s"n=${snrs.size} min=${sorted.head} " +
      s"p5=${sorted(snrs.size / 20)._3} median=${sorted(snrs.size / 2)._3} " +
      s"max=${sorted.last._3}")
  }
}
