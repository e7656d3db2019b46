package graft.expressions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL") {
    val r = spark
      .sql("""SELECT
        graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        graft_md5long60('abc') AS h,
        graft_shingle_hashes(array(1L, 2L, 3L, 4L), 3) AS sh""")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    // = parsing the first 15 hex chars of md5('abc')
    assert(r.getLong(1) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getSeq[Long](2).length == 2) // two 3-windows of a 4-array
  }
}
