package graft.battery

import graft.SparkSpec

/** Delimiter-fallback parity with the reference
  * (/root/reference/pipeline.py:19-23): pandas comma-parses first and
  * retries with `;` only when the parse raises, which happens when a row
  * MID-FILE has more comma-fields than the header (a uniformly longer first
  * row just triggers pandas' index-column inference instead). The fixture
  * reproduces that shape — verified against pandas: comma parse raises
  * "Expected 2 fields in line 4, saw 3", semicolon parse yields 2 columns /
  * 4 rows — and the probe must land on `;` exactly like the retry does.
  */
class DelimiterSpec extends SparkSpec {

  private def res(name: String): String = getClass.getResource(s"/$name").getPath

  test("mid-file comma-ragged body falls back to semicolon like pandas retry") {
    assert(Normalize.probeDelimiter(spark, res("mixed_eu_ragged.csv")) == ";")
  }

  test("zero-semicolon header with a ragged comma body also falls back") {
    // pandas: comma parse raises ('Expected 2 fields in line 4, saw 3');
    // the ';' retry SUCCEEDS with each line as a single field — so the
    // probe must flip even though the header contains no semicolons
    assert(Normalize.probeDelimiter(spark, res("comma_ragged.csv")) == ";")
  }

  test("clean comma and semicolon files keep their probed delimiter") {
    assert(Normalize.probeDelimiter(spark, res("arbin_small.csv")) == ",")
    assert(Normalize.probeDelimiter(spark, res("neware_small.csv")) == ";")
    assert(Normalize.probeDelimiter(spark, res("timeonly_small.csv")) == ",")
  }
}
