package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Asserts the multimodal decode pipeline the Multimodal scaladoc
  * describes: the mapPartitions decode-stub stage produces, for this
  * ASCII corpus, exactly the rolling checksum t04 computes declaratively
  * (bytes == codepoints), and the byte metadata is consistent. */
class MultimodalSpec extends AnyFunSuite {
  import SparkSuite._

  test("decodeStub is deterministic and shape-stable") {
    val f = operators.Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f.length == 3)
    assert(f(0) == 11.0) // n_bytes
    assert(f(2) == 'h'.toInt.toDouble) // first byte
    val g = operators.Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f.sameElements(g))
  }

  test("decodeStub handles the empty payload") {
    val f = operators.Multimodal.decodeStub(Array.emptyByteArray)
    assert(f.sameElements(Array(0.0, 0.0, 0.0)))
  }

  test("m02 mapPartitions checksum equals t04 declarative fingerprint") {
    val m02 = operators.Multimodal.mediaFeatures(spark, Sf)
      .select(col("doc_id"), col("byte_checksum"))
    val t04 = operators.TextOps.queries("t04_fingerprint")(spark, Sf)
      .select(col("doc_id"), col("fingerprint"))
    val mismatches = m02.join(t04, Seq("doc_id"))
      .filter(col("byte_checksum") =!= col("fingerprint"))
      .count()
    assert(mismatches == 0L,
      "mapPartitions decode checksum diverged from the expression-pipeline fingerprint")
  }

  test("m02 n_bytes equals m01 binary metadata length") {
    val m02 = operators.Multimodal.mediaFeatures(spark, Sf)
      .select(col("doc_id"), col("n_bytes").as("b2"))
    val m01 = SparkEntry.queries("m01_binary_metadata")(spark, Sf)
      .select(col("doc_id"), col("n_bytes").as("b1"))
    assert(m01.join(m02, Seq("doc_id")).filter(col("b1") =!= col("b2")).count() == 0L)
  }
}
